package graft

import org.apache.spark.sql.functions._

/** Pins the contract VERDICT r2-r4 asked of the IVF upgrade: visiting
  * nprobe=2 k-means cells can only find neighbors at least as good as
  * the single seed-centroid cell — measured as recall of the brute-force
  * top-3 on the shared fixed probe set (vec_id % 25 == 0).
  */
class IvfRecallSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** (qid, vid) pairs of a top-k result frame. */
  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("qid").cast("long"), col("vid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF nprobe=2 + k-means recall >= nprobe=1 vs brute-force top-3") {
    import org.apache.spark.sql.expressions.Window
    // brute-force top-3 over the same probe set, same tie-break
    val e = Tables.embeddings(spark, sf)
      .withColumn("e", transform(col("embedding"), _.cast("double")))
      .withColumn("nrm",
        sqrt(aggregate(col("e"), lit(0.0), (acc, x) => acc + x * x)))
    val probes = e.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qn"))
    val dot = aggregate(zip_with(col("qe"), col("ee"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), col("vid"))
    val truth = broadcast(probes)
      .join(e.select(col("vec_id").as("vid"), col("e").as("ee"),
        col("nrm").as("vn")), col("qid") =!= col("vid"))
      .withColumn("cos", round(dot / (col("qn") * col("vn")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid").cast("long"), col("vid").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val r1 = pairs("m_ann_ivf")        // seed centroids, nprobe=1
    val r2 = pairs("m_ann_ivf_nprobe") // k-means-refined, nprobe=2

    val recall1 = (r1 & truth).size.toDouble / truth.size
    val recall2 = (r2 & truth).size.toDouble / truth.size
    info(f"recall nprobe=1 seed: $recall1%.3f, nprobe=2 kmeans: $recall2%.3f")
    assert(recall2 >= recall1,
      s"nprobe=2 recall $recall2 fell below nprobe=1 recall $recall1")
    assert(recall2 > 0.0)
  }
}
