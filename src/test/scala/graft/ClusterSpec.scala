package graft

import org.apache.spark.sql.functions._

/** Invariants of the near-dup clustering (`m_dedup_clusters`) that the
  * row-level oracle can't express directly:
  *   - the components PARTITION the pair graph: both endpoints of every
  *     verified MinHash pair land in the same cluster (transitivity of
  *     the closure, the property pairs alone lack);
  *   - the cluster id IS the kept doc: the minimum member;
  *   - every cluster has >= 2 members (singletons never enter the pair
  *     graph).
  */
class ClusterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("dedup clusters close the near-dup pair graph") {
    val clusters = SparkEntry.queries("m_dedup_clusters")(spark, sf)
      .withColumn("m", explode(split(col("members"), ",")))
      .select(col("cluster_id"), col("n_members"),
        col("m").cast("long").as("member"))
      .cache()
    val pairs = SparkEntry.queries("m_minhash_dedup")(spark, sf)
      .select("d1", "d2")

    assert(clusters.count() > 0, "no clusters at sf0.01 — vacuous")

    // both endpoints of every pair share a cluster
    val c1 = clusters.select(col("member").as("d1"),
      col("cluster_id").as("ca"))
    val c2 = clusters.select(col("member").as("d2"),
      col("cluster_id").as("cb"))
    val split0 = pairs.join(c1, Seq("d1")).join(c2, Seq("d2"))
      .filter(col("ca") =!= col("cb")).count()
    assert(split0 == 0, s"$split0 pairs straddle two clusters")

    // cluster id = min member; sizes consistent; no singleton clusters
    val bad = clusters.groupBy("cluster_id", "n_members")
      .agg(min(col("member")).as("mn"), count(lit(1)).as("k"))
      .filter(col("mn") =!= col("cluster_id") ||
        col("k") =!= col("n_members") || col("k") < 2)
      .count()
    assert(bad == 0, "cluster id/size invariant broken")
    clusters.unpersist()
  }
}
