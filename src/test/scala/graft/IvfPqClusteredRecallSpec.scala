package graft

import org.apache.spark.sql.functions._

/** ANN recall on the CLUSTERED embedding fixture (GenCluster) — the
  * regime IVF exists for. The uniform driver fixture caps visited-cell
  * recall at 0.467 (nprobe=3, PqRecallSpec) because without cluster
  * structure a true neighbor rarely shares a cell with its probe;
  * production embeddings are clustered, and there the coarse stage
  * must prune hard AND keep recall. This pin runs the same landed
  * IVF+PQ+refine pipeline at nprobe=2 (visiting 2/16 cells — an ~87%
  * corpus prune) and demands recall ≥ 0.8 against the exact
  * quantized-L2 top-3 — deterministic: fixed fixture, fixed probe
  * set, exact-integer distances end to end.
  */
class IvfPqClusteredRecallSpec extends SparkSpec {

  test("IVF+PQ+refine recall >= 0.8 at nprobe=2 on clustered embeddings") {
    val dir = GenCluster.ensure(spark)
    import org.apache.spark.sql.expressions.Window
    val qz = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 1000).cast("long")).as("qi"))
    val probes = qz.filter(col("vec_id") % 25 === 0 && col("vec_id") < 500)
      .select(col("vec_id").as("qid"), col("qi").as("qq"))
    val d2 = aggregate(zip_with(col("qq"), col("vv"),
      (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("qid")).orderBy(col("d"), col("vid"))
    val truth = broadcast(probes)
      .join(qz.select(col("vec_id").as("vid"), col("qi").as("vv")),
        col("qid") =!= col("vid"))
      .withColumn("d", d2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val got = graft.ops.Similarity.ivfpqTopk(spark, dir, nprobe = 2)
      .select(col("qid"), col("vid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (got & truth).size.toDouble / truth.size
    info(f"clustered-fixture IVF+PQ+refine recall at nprobe=2: $recall%.3f")
    assert(recall >= 0.8,
      s"clustered recall $recall below the 0.8 pin — the coarse " +
        "quantizer is not exploiting cluster structure")
  }
}
