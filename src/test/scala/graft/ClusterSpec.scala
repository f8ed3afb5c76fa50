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

  /** Invariants of the incremental refresh (`m_incr_dedup`) beyond the
    * row-level oracle: the verdict set is consistent with the GLOBAL
    * pair graph restricted to the delta — base precedence, canonical
    * partners on the correct side of the split, and agreement with
    * m_minhash_dedup on which delta docs have a base partner at all.
    */
  test("incremental dedup verdicts agree with the global pair graph") {
    val res = SparkEntry.queries("m_incr_dedup")(spark, sf).cache()
    val n = res.count()
    assert(n > 0, "no delta docs — vacuous")
    val split = res.agg(min(col("doc_id"))).head().getLong(0)

    val byStatus = res.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.getOrElse("near_base", 0L) > 0,
      "no near_base verdicts — fixture split misses all cross pairs")

    // dup_of side matches the verdict; kept rows carry no partner
    assert(res.filter(col("status") === "near_base" &&
      col("dup_of") >= split).count() == 0, "near_base partner in delta")
    assert(res.filter(col("status") === "near_delta" &&
      (col("dup_of") < split || col("dup_of") >= col("doc_id")))
      .count() == 0, "near_delta partner not an earlier delta doc")
    assert(res.filter(col("status") === "kept" &&
      (col("dup_of").isNotNull || col("jac").isNotNull)).count() == 0,
      "kept row carries a partner")
    assert(res.filter(col("status") =!= "kept" && col("jac") < 0.5)
      .count() == 0, "verified partner below the jaccard bar")

    // near_base set == delta docs with ANY base partner in the global
    // pair graph (m_minhash_dedup); base precedence implies equality
    val pairs = SparkEntry.queries("m_minhash_dedup")(spark, sf)
    val expect = pairs.filter(col("d1") < split && col("d2") >= split)
      .select(col("d2").as("doc_id")).distinct()
    val got = res.filter(col("status") === "near_base").select("doc_id")
    assert(expect.exceptAll(got).count() == 0 &&
      got.exceptAll(expect).count() == 0,
      "near_base set disagrees with the global pair graph")
    res.unpersist()
  }
}
