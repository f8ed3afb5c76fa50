package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Queries are forced through the noop sink — a bare `count()` would let
  * Catalyst collapse pure projections to a row-count scan and measure
  * nothing. Failures are recorded as -1 and excluded from the total
  * instead of silently accumulating their time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the Tables layer (base-table cache + videos synthesis) before
    // timing so one-time materialization isn't attributed to whichever
    // query runs first; reported separately as warmup_sec.
    val w0 = System.nanoTime()
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
        .foreach(t => Tables.table(spark, sfDir, t).count())
      Tables.events(spark, sfDir).count()
      Tables.videos(spark, sfDir).count()
      Tables.videoEdges(spark, sfDir).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val warmup = (System.nanoTime() - w0) / 1e9
    // Median of 3 runs per query: the host VM shows bursty CPU steal with
    // per-query swings up to 18x on identical binaries (VERDICT r3), and a
    // median absorbs a single burst in either direction where min-of-2
    // (r2/r3 scheme) silently kept the noise.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t =
        try {
          val runs = Seq(once(), once(), once()).sorted
          runs(1)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"warmup_sec":$warmup,"runs_per_query":3,"stat":"median","sf":"$sfDir"}"""
    // stdout for the driver's capture AND a file for when the captured
    // tail truncates (VERDICT r3: "parsed": null on a long stdout line)
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/bench_out.json"), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] file write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
