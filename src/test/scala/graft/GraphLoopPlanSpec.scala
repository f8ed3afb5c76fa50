package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Pins the iterative-graph-loop scale lever: the loop-invariant edge
  * table (src-partitioned, persisted — Graph.cachedBySrc) must reach
  * per-round src-keyed consumers WITHOUT being re-shuffled. If a future
  * change re-introduces an Exchange here (e.g. swapping persist for
  * localCheckpoint, whose LogicalRDD forgets partitioning — probed on
  * this Spark build), every round of k3/k5/k7/k8 pays a full-|E|
  * shuffle again; this spec makes that regression a visible assertion.
  */
class GraphLoopPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  test("src-keyed aggregate over the cached edge table plans no exchange") {
    // k7's degree init (and any groupBy("src") over the cache): the
    // persisted hash partitioning must satisfy the aggregate's
    // distribution requirement outright — partial and final aggregate
    // collapse into one exchange-free stage.
    val e = ops.Graph.symEdgesBySrc(spark, sf)
    // materialize the cache first — in the loops, round 2+ plans are
    // built after round 1 executed, so the adaptive cached plan has a
    // FINAL partitioning by the time any round consumes it (an
    // unmaterialized AQE cached plan reports unknown partitioning)
    e.count()
    val plan = physical(e.groupBy("src").agg(count(lit(1)).as("deg")))
    assert(plan.collect { case ex: ShuffleExchangeExec => ex }.isEmpty,
      s"src-keyed aggregate re-shuffled the cached edge table:\n$plan")
    assert(plan.collectFirst { case s: InMemoryTableScanExec => s }.isDefined,
      s"no InMemoryTableScan — edge cache not used:\n$plan")
  }

  test("a round join never re-shuffles the edge side") {
    // One LPA/BFS-shaped round join: labels arrive with unknown
    // partitioning (checkpointed — exactly how the loops carry them);
    // whatever join strategy the planner picks, the EDGE side must ride
    // its persisted partitioning into the join with no Exchange above
    // the cached scan.
    val e = ops.Graph.symEdgesBySrc(spark, sf)
    e.count() // see the materialization note in the previous test
    val lbl = e.select(col("src").as("v")).distinct()
      .withColumn("lbl", col("v"))
      .localCheckpoint() // breaks lineage: label side has no cache scan
    val round = e.join(lbl.select(col("v").as("src"), col("lbl")),
      Seq("src"))
    val plan = physical(round)
    val reshuffled = plan.collect {
      case ex: ShuffleExchangeExec
        if ex.child.collectFirst {
          case s: InMemoryTableScanExec => s }.isDefined => ex
    }
    assert(reshuffled.isEmpty,
      s"edge side re-shuffled entering the round join:\n$plan")
    assert(plan.collectFirst { case s: InMemoryTableScanExec => s }.isDefined,
      s"no InMemoryTableScan — edge cache not used:\n$plan")
  }
}
