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

  test("IVF+PQ composed recall vs exact top-3 (measure + floor)") {
    val recall = recallOf("m_ann_ivfpq")
    info(f"IVF+PQ recall vs exact top-3: $recall%.3f")
    // composition loses on BOTH axes (coarse cells can prune a true
    // neighbor, ADC mis-ranks inside the cell) and the UNIFORM random
    // fixture is the worst case for cell pruning — there is no cluster
    // structure, so nprobe=2 of 16 cells (1/8 of the corpus) keeps a
    // true neighbor only when it happens to share a cell. Measured
    // exactly 0.250 (vs PQ-alone 0.500 scanning everything); the floor
    // guards against a parameter regression, not against the
    // fixture's inherent loss — real clustered embeddings are where
    // the composition earns its 8× candidate reduction.
    assert(recall >= 0.2, s"IVF+PQ recall $recall below the 0.2 pin")
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
