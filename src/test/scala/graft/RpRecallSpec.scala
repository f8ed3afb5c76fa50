package graft

import org.apache.spark.sql.functions._

/** Pins the random-projection ANN contract: the 64→32-dim ±1-projection
  * shortlist (top-64 per probe) + exact cosine re-rank must recover
  * most of the TRUE (exact quantized-cosine) top-3 on the shared fixed
  * probe set. Deterministic on the fixed fixture, so the pin is
  * exact-repeatable. The uniform random embeddings are JL's worst
  * case — every similarity is small and closely spaced, so the
  * distortion bound eats most of the ranking gap; measured 0.85 at
  * sf0.01, pinned with margin at 0.8 (ADVICE r5: never pin a measured
  * value with zero slack).
  */
class RpRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Exact quantized-cosine top-3 per probe — the ground truth the
    * projected shortlist is measured against. Same 3dp quantization and
    * round-6 cosine + vec_id total order as the query itself. */
  private lazy val truth: Set[(Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val qz = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long")).as("qi"))
      .withColumn("n2", aggregate(transform(col("qi"), x => x * x),
        lit(0L), (a, b) => a + b))
    val probes = qz.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("qi").as("qq"),
        col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("cos"), col("vid"))
    broadcast(probes)
      .join(qz.select(col("vec_id").as("vid"), col("qi").as("vv"),
        col("n2").as("vn2")), col("qid") =!= col("vid"))
      .withColumn("cos", round(
        aggregate(zip_with(col("qq"), col("vv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).cast("double") /
        (sqrt(col("qn2").cast("double")) *
          sqrt(col("vn2").cast("double"))), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("RP shortlist + exact re-rank recall vs exact top-3 >= 0.8") {
    val got = SparkEntry.queries("m_ann_rp")(spark, sf)
      .select(col("qid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    info(f"RP re-rank recall vs exact top-3: $recall%.3f")
    assert(recall >= 0.8, s"RP re-rank recall $recall below the 0.8 pin")
  }
}
