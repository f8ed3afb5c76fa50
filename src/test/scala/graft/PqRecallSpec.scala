package graft

import org.apache.spark.sql.functions._

/** Pins the PQ/ADC contract: the 16×64 product-quantized index must
  * recover a meaningful fraction of the TRUE (exact quantized-L2)
  * top-3 neighbors on the shared fixed probe set — deterministic on the
  * fixed fixture, so the pin is exact-repeatable. The fixture's uniform
  * random embeddings are the worst case for PQ (no cluster structure
  * for the codebooks to exploit); 0.50 here ≥ the IVF nprobe=2 pin.
  */
class PqRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Exact quantized-L2 top-3 per probe — the ground truth both PQ
    * variants are measured against. */
  private lazy val truth: Set[(Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val qz = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long")).as("qi"))
    val probes = qz.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("qi").as("qq"))
    val d2 = aggregate(zip_with(col("qq"), col("vv"),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("d"), col("vid"))
    broadcast(probes)
      .join(qz.select(col("vec_id").as("vid"), col("qi").as("vv")),
        col("qid") =!= col("vid"))
      .withColumn("d", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def recallOf(query: String): Double = {
    val got = SparkEntry.queries(query)(spark, sf)
      .select(col("qid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (got & truth).size.toDouble / truth.size
  }

  test("PQ/ADC recall vs exact quantized-L2 top-3 >= 0.45") {
    val recall = recallOf("m_ann_pq")
    info(f"PQ/ADC recall vs exact top-3: $recall%.3f")
    // deterministic on the fixed fixture (measured exactly 0.500); the
    // pin leaves a small margin so a benign perturbation (fixture
    // regeneration, engine tie-handling change) doesn't flip the suite
    // while the ADC contract still holds
    assert(recall >= 0.45, s"PQ recall $recall below the 0.45 pin")
  }

  test("IVF+PQ+refine composed recall vs exact top-3 >= 0.4") {
    val recall = recallOf("m_ann_ivfpq")
    info(f"IVF+PQ+refine recall vs exact top-3: $recall%.3f")
    // the UNIFORM random fixture is the worst case for cell pruning —
    // no cluster structure, so a true neighbor survives only when it
    // shares a visited cell. Exact-L2-in-visited-cells is a HARD
    // recall ceiling no ADC can beat: measured 0.383 at nprobe=2 and
    // 0.467 at nprobe=3 (which is why the round-7 raw-coded ADC
    // plateaued at 0.250 and residual coding ALONE could not reach
    // 0.4 at nprobe=2). The landed composition — residual-encoded
    // Lloyd-trained codebooks, nprobe=3, exact refine of the ADC
    // top-16 (FAISS IndexIVFPQR) — measures exactly 0.467, i.e. the
    // nprobe=3 ceiling: the ADC+refine stage loses nothing on top of
    // the pruning. Real clustered embeddings are where the coarse
    // stage earns its ~5× candidate reduction without this penalty.
    assert(recall >= 0.4, s"IVF+PQ+refine recall $recall below 0.4")
  }

  test("PQ + exact re-rank recall vs exact top-3 >= 0.9") {
    val recall = recallOf("m_ann_pq_rerank")
    info(f"PQ re-rank recall vs exact top-3: $recall%.3f")
    // the ADC shortlist (top-32 per probe) + exact re-rank closes the
    // lossy-codebook gap — the production FAISS pattern. A miss here
    // means the true neighbor fell outside the shortlist entirely.
    assert(recall >= 0.9, s"PQ re-rank recall $recall below the 0.9 pin")
  }
}
