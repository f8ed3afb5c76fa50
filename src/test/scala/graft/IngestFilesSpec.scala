package graft

import graft.ops.Ingest
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Real-file ingest path (A3/A5/F5): recursive scan of a synthesized
  * TSV tree — date-named dirs (one 4-digit MMDD), a `log.txt` to skip,
  * a reject line — then parse, per-file stats, and the partitioned
  * JSON sink read back.
  */
class IngestFilesSpec extends SparkSpec {

  private def write(p: String, content: String): Unit = {
    val path = Paths.get(p)
    Files.createDirectories(path.getParent)
    Files.writeString(path, content)
  }

  private lazy val root: String = {
    val r = Files.createTempDirectory(
      Paths.get("target"), "ingest_tree_").toString
    write(s"$r/0301/crawl1.txt",
      "v1\tu1\t10\tMusic\t300\t1000\t4.5\t7\t3\tv2\n" +
      "v2\tu2\t20\tMusic\t240\t2000\t4.0\t5\t1\n" +
      "bad\tline\n")
    write(s"$r/0301/log.txt", "should be skipped entirely\n")
    write(s"$r/080216/crawl2.txt",
      "v3\tu3\t30\tComedy\t100\t3000\t3.5\t2\t0\tv1\tv2\n")
    r
  }

  test("A3: recursive scan picks up *.txt, skips log*") {
    val lines = Ingest.scanTree(spark, root)
    assert(lines.count() == 4) // 3 + 1, log.txt excluded
    assert(lines.filter(col("line").contains("skipped")).count() == 0)
    val dirs = lines.select("dirname").distinct()
      .collect().map(_.getString(0)).toSet
    assert(dirs == Set("0301", "080216"))
  }

  test("A4 + I9 on files: parse + dirname date rule") {
    val parsed = Ingest.parse(Ingest.scanTree(spark, root))
    assert(parsed.count() == 3) // reject dropped
    val dates = parsed
      .select(col("id"), Ingest.dirDate(col("dirname")).as("d"))
      .collect().map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(dates("v1") == "2007-03-01")
    assert(dates("v3") == "2008-02-16")
    assert(Ingest.rejects(Ingest.scanTree(spark, root)).count() == 1)
  }

  test("F5: per-file stats sidecar (parsed_lines, sum_views)") {
    val stats = Ingest.perFileStats(
        Ingest.parse(Ingest.scanTree(spark, root))
          .withColumn("file", element_at(split(col("file"), "/"), -1)))
      .collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2))).toSet
    assert(stats == Set(("crawl1.txt", 2L, 3000L), ("crawl2.txt", 1L, 3000L)))
  }

  test("A5: partitioned JSON sink round-trips the nested shape") {
    val out = Files.createTempDirectory(
      Paths.get("target"), "json_out_").toString
    val nested = Ingest.toNested(Ingest.parse(Ingest.scanTree(spark, root)))
    Ingest.writeJsonPartitioned(nested, out)
    // partition dirs named by the CANONICAL crawl date: the 4-digit 0301
    // dir becomes YYMMDD 070301 after the year-2007 rule
    val parts = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(parts == Set("date_collected=070301", "date_collected=080216"))
    val back = spark.read.json(out)
    assert(back.count() == 3)
    val v1 = back.filter(col("id") === "v1").collect().head
    assert(v1.getAs[org.apache.spark.sql.Row]("video_engagement")
      .getAs[Long]("views") == 1000L)
  }
}
