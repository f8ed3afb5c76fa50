package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement main for the PERF.md stream-join state-sizing
  * section: drives the three stream-stream joins (and the stateful
  * aggregate for contrast) at the given fixture and prints each run's
  * peak state-operator footprint from the engine's own progress
  * metrics. Run:
  *   SPARK_GRAFT_CPUS=8 sbt "Test/runMain graft.StateSizeAudit /root/testdata/sf0.1"
  */
object StateSizeAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("m_stream_join", "m_stream_left_join",
      "m_stream_full_join", "m_stream_state")
    targets.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val ms = graft.streaming.Streams.lastStateMetrics.get()
      println(f"[state] $name%-22s out_rows=$n%7d wall=$sec%6.1fs")
      ms.foreach { case (op, rows, bytes) =>
        println(f"[state]   $op%-28s state_rows=$rows%9d " +
          f"state_mb=${bytes / 1048576.0}%8.2f")
      }
    }
    spark.stop()
  }
}
