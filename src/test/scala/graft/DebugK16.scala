package graft

import org.apache.spark.sql.SparkSession

object DebugK16 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("k16_modularity")(spark, d)
    println("==== FROZEN LOGICAL (top 40) ====")
    println(df.queryExecution.logical.treeString.split("\n")
      .take(40).mkString("\n"))
    try {
      println("==== RE-OPTIMIZED (top 40) ====")
      println(df.queryExecution.optimizedPlan.treeString.split("\n")
        .take(40).mkString("\n"))
      df.write.format("noop").mode("overwrite").save()
      println("write OK")
    } catch {
      case e: Throwable =>
        println("FAILED: " + e.getMessage.take(500))
    }
    spark.stop()
  }
}
