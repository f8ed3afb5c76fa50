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

  test("scan reports real size statistics (broadcast-eligible)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_stats").toString
    val rows = (1L to 50L).map(i => (i, s"t$i", i * 2))
    rows.toDF("id", "tag", "v")
      .write.format("graft.sources.FixedWidthSource")
      .option("fields", fields).mode("overwrite").save(dir)
    val df = read(dir)
    val stats = df.queryExecution.optimizedPlan.stats
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).map(_.length).sum
    assert(stats.sizeInBytes.toLong == onDisk,
      s"reported ${stats.sizeInBytes}, files total $onDisk")
    assert(stats.rowCount.exists(_.toLong == 50L),
      s"rowCount ${stats.rowCount}")
    // and the practical consequence: joined against a big side, the
    // tiny fixed-width table is chosen as the broadcast build side
    val big = spark.range(10000).selectExpr("id", "id * 3 AS x")
    val joined = big.join(df, "id")
    val bhj = joined.queryExecution.executedPlan.toString
    assert(bhj.contains("BroadcastHashJoin") ||
      bhj.contains("BroadcastExchange"),
      s"tiny DSv2 table not broadcast:\n$bhj")
  }

  test("reader survives randomized layouts, values, and chunkings") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 12) {
      // random layout of 1-5 long/string fields with random widths
      val nf = 1 + rnd.nextInt(5)
      var off = 0
      val fs = (0 until nf).map { i =>
        val w = 3 + rnd.nextInt(12)
        val t = if (rnd.nextBoolean()) "long" else "string"
        val f = (s"c$i", off, w, t); off += w; f
      }
      val spec = fs.map { case (n, st, w, t) => s"$n:$st:$w:$t" }
        .mkString(",")
      val nRows = 1 + rnd.nextInt(60)
      val rows = (0 until nRows).map { _ =>
        fs.map { case (_, _, w, t) =>
          if (t == "long") {
            val bound = math.pow(10, w - 1).toLong - 1
            (rnd.nextLong() % bound).toString
          } else {
            val len = rnd.nextInt(w)
            (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar)
              .mkString
          }
        }
      }
      val lines = rows.map(vals =>
        vals.zip(fs).map { case (v, (_, _, w, _)) =>
          (" " * (w - v.length)) + v
        }.mkString)
      val dir = java.nio.file.Files
        .createTempDirectory(s"fw_fuzz_$trial").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "part-000.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
      val split = 1L + rnd.nextInt(200)
      val got = spark.read.format("graft.sources.FixedWidthSource")
        .option("fields", spec)
        .option("maxsplitbytes", split.toString)
        .option("path", dir).load()
        .collect().map(r => (0 until nf).map(i =>
          if (r.isNullAt(i)) null else r.get(i).toString).mkString("|"))
        .sorted
      val want = rows.map(_.zip(fs).map { case (v, (_, _, _, t)) =>
        val tv = v.trim
        if (tv.isEmpty) null
        else if (t == "long") tv.toLong.toString else tv
      }.mkString("|")).sorted
      assert(got.toSeq == want.toSeq,
        s"trial $trial (split=$split, spec=$spec) diverged")
    }
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

  test("layout is byte-positional: multi-byte strings round-trip, " +
      "byte overflow rejected") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_utf8").toString
    // "éé" = 2 chars / 4 UTF-8 bytes: fills tag:4 exactly, and the
    // following column must still start at byte 10
    Seq((5L, "éé", 77L)).toDF("id", "tag", "v")
      .write.format("graft.sources.FixedWidthSource")
      .option("fields", fields).mode("overwrite").save(dir)
    val got = read(dir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((5L, "éé", 77L)))
    // "ééa" = 3 chars (would pass a char-counted check) / 5 bytes
    val ex = intercept[Exception] {
      Seq((5L, "ééa", 77L)).toDF("id", "tag", "v")
        .write.format("graft.sources.FixedWidthSource")
        .option("fields", fields).mode("overwrite").save(dir)
    }
    assert(ex.getMessage != null)
  }

  test("sink rejects strings that cannot round-trip blank padding") {
    val s = spark
    import s.implicits._
    // "" reads back as NULL, "  x " reads back as "x" — both must be
    // rejected loudly (same policy as slot overflow), not silently
    // corrupted through the round trip
    for (bad <- Seq("", " x", "x ", "  x ")) {
      val dir = java.nio.file.Files
        .createTempDirectory("fw_spec_badstr").toString
      val ex = intercept[Exception] {
        Seq((1L, bad, 1L)).toDF("id", "tag", "v")
          .write.format("graft.sources.FixedWidthSource")
          .option("fields", fields).mode("overwrite").save(dir)
      }
      assert(ex.getMessage != null, s"bad=$bad")
    }
  }

  test("streaming offsets are name-based: checkpoint restart with a " +
      "newly-landed file reads exactly the new file") {
    val dir = java.nio.file.Files
      .createTempDirectory("fw_spec_restart").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("fw_spec_restart_ckpt").toString
    def land(name: String, base: Long): Unit = {
      val lines = (1 to 10).map(i =>
        f"${base + i}%6d${"t"}%4s${i.toLong}%8d")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val out = java.nio.file.Files
      .createTempDirectory("fw_spec_restart_out").toString
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.sources.FixedWidthSource")
        .option("fields", fields)
        .option("filespertrigger", "1")
        .option("path", dir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land("part-001.txt", 100); land("part-002.txt", 200)
    drain()
    assert(spark.read.parquet(out).count() == 20L)
    // a new file lands AFTER the first drain; the restarted query
    // resumes from the checkpointed high-water NAME — a positional
    // offset over the re-sorted (grown) listing would re-read or skip
    // a file here. 30 rows total = exactly the new file was appended.
    land("part-003.txt", 300)
    drain()
    val got = spark.read.parquet(out).collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq ==
      ((101L to 110L) ++ (201L to 210L) ++ (301L to 310L)).toSeq,
      s"restart re-read or skipped files: ${got.length} rows")
  }

  test("reader fails loudly on a non-digit byte in a long slot") {
    val dir = writeFixture(Seq("    1a  ab      10"))
    val ex = intercept[Exception] { read(dir).collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[NumberFormatException]),
      s"expected NumberFormatException in cause chain, got $ex")
  }

  test("blank lines are separators, not phantom all-NULL records") {
    val lines = Seq(f"${1L}%6d${"ab"}%4s${10L}%8d", "",
      f"${2L}%6d${"cd"}%4s${20L}%8d", "")
    val dir = writeFixture(lines)
    assert(read(dir).count() == 2L)
  }
}
