package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Pins the DSv2 fixed-width source ([[graft.sources.FixedWidthSource]]):
  * value round trip, byte-range split ownership (no line lost or
  * duplicated whatever the chunking), and that Catalyst pushes column
  * pruning into the scan itself.
  */
class FixedWidthSourceSpec extends SparkSpec {

  private val fields =
    "id:0:6:long,tag:6:4:string,v:10:8:long"

  private def writeFixture(lines: Seq[String]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-000.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private def read(dir: String, split: Long = 4 << 20) =
    spark.read.format("graft.sources.FixedWidthSource")
      .option("fields", fields)
      .option("maxsplitbytes", split.toString)
      .option("path", dir)
      .load()

  test("round trip: padded longs (incl. negative) and trimmed strings") {
    val dir = writeFixture(Seq(
      f"${1L}%6d${"ab"}%4s${10L}%8d",
      f"${-2L}%6d${"cd"}%4s${-999L}%8d",
      f"${300000L}%6d${""}%4s${12345678L}%8d"))
    val got = read(dir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "ab", 10L),
      (-2L, "cd", -999L),
      (300000L, null, 12345678L))) // all-blank field reads as NULL
  }

  test("byte-range splits read every line exactly once") {
    val lines = (1 to 500).map(i => f"$i%6d tag$i%-6d")
    // line length varies is NOT the case here (fixed 16+newline), but
    // split boundaries land mid-line, at line starts, and at newlines
    // across these sizes — each must agree with the single-split read
    val dir = writeFixture(lines)
    val whole = read(dir).select("id").collect().map(_.getLong(0)).sorted
    for (split <- Seq(7L, 17L, 64L, 1000L)) {
      val chunked = read(dir, split).select("id").collect()
        .map(_.getLong(0)).sorted
      assert(chunked.toSeq == whole.toSeq,
        s"split=$split lost or duplicated lines: " +
          s"${chunked.length} vs ${whole.length}")
    }
    assert(whole.length == 500)
  }

  test("column pruning reaches the scan") {
    val dir = writeFixture(Seq(f"${1L}%6d${"ab"}%4s${10L}%8d"))
    val df = read(dir).select("v")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec in plan")
    assert(scans.head.output.map(_.name) == Seq("v"),
      s"scan not pruned: ${scans.head.output}")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("empty directory yields zero rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_empty").toString
    assert(read(dir).count() == 0L)
  }

  test("DSv2 sink round trip, overwrite replaces, no temp leftovers") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_write").toString
    def write(rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("id", "tag", "v").repartition(3)
        .write.format("graft.sources.FixedWidthSource")
        .option("fields", fields).mode("overwrite").save(dir)

    val first = Seq((1L, "ab", 10L), (-2L, "cd", -999L), (7L, "x", 0L))
    write(first)
    val got1 = read(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(got1.toSeq == first.sorted)

    // overwrite fully replaces and publishes atomically
    val second = Seq((42L, "zz", 5L))
    write(second)
    val got2 = read(dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got2.toSeq == second)
    val leftovers = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("_temp"))
    assert(leftovers.isEmpty, s"temp dir survived commit: ${leftovers.toSeq}")
  }

  test("MicroBatchStream drains file-at-a-time under AvailableNow") {
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_stream").toString
    for (f <- 1 to 3) {
      val lines = (1 to 10).map(i => f"${f * 100L + i}%6d${"t"}%4s${i.toLong}%8d")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"part-$f%03d.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val src = spark.readStream
      .format("graft.sources.FixedWidthSource")
      .option("fields", fields)
      .option("filespertrigger", "1")
      .option("path", dir)
      .load()
    val sink = s"fw_stream_${System.nanoTime()}"
    val q = src.groupBy().sum("v")
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches == 3,
      s"expected 3 one-file micro-batches, saw $batches")
    val got = spark.table(sink).collect().head.getLong(0)
    assert(got == 3 * (1 to 10).sum.toLong)
  }

  test("DSv2 sink rejects values wider than their slot") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_overflow").toString
    val ex = intercept[Exception] {
      Seq((1234567L, "ab", 1L)).toDF("id", "tag", "v") // id needs 7 > 6
        .write.format("graft.sources.FixedWidthSource")
        .option("fields", fields).mode("overwrite").save(dir)
    }
    assert(ex.getMessage != null)
  }
}
