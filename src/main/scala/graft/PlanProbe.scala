package graft
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields",
        sys.env.getOrElse("SPARK_GRAFT_MAXFIELDS", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      // warm the videos cache separately so per-query time is honest
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = (System.nanoTime() - t2) / 1e9
      println(f"TIMING $name first=$t1%.2f second=$t3%.2f")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
