package graft

import org.apache.spark.sql.functions._

/** The co-located-join story for the 100-TB deployment: land both fact
  * tables bucketed on the join key and the join plans with NO Exchange —
  * the shuffle that dominates a large equi-join disappears at write
  * time. This spec proves the engine's tables actually hit that path
  * (bucket pruning is only real if the planner recognizes it), and that
  * the bucketed join returns the same rows as the plain one.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed-by-key tables join with zero Exchange in the plan") {
    val s = spark
    // Force the sort-merge path: the tiny fixture side would otherwise
    // broadcast, which proves nothing about bucketing.
    val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(s, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_bucketed")
      Tables.lineitem(s, sf)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_bucketed")

      val bucketed = s.table("graft_orders_bucketed")
        .join(s.table("graft_lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))

      // groupBy key = bucket key, so even the aggregation reuses the
      // bucketing: the whole query should plan without any Exchange.
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      val plain = Tables.orders(s, sf)
        .join(Tables.lineitem(s, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
      val a = bucketed.orderBy("o_orderkey").collect().toSeq
      val b = plain.orderBy("o_orderkey").collect().toSeq
      assert(a == b, "bucketed join result differs from plain join")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      s.sql("DROP TABLE IF EXISTS graft_orders_bucketed")
      s.sql("DROP TABLE IF EXISTS graft_lineitem_bucketed")
    }
  }
}
