package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Exactly-once state recovery across a query restart — the property
  * every production streaming deployment actually depends on: kill a
  * stateful query, add more source data, restart from the SAME
  * checkpoint, and the state must continue (batch-1 contributions kept)
  * without re-reading or double-counting the already-committed files.
  *
  * The proof is arithmetic: the restarted run's complete-mode output
  * must equal the batch-mode aggregate over batch1 ∪ batch2 EXACTLY
  * (decimal-scaled sums). If restart re-read batch 1, its rows would
  * count twice; if state were lost, batch-1 rows would be missing —
  * either way the equality fails. A progress check additionally pins
  * that the second run ingested only the batch-2 rows.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("foreachBatch idempotent upsert sink: crash AFTER side effect, " +
    "replay on restart, no duplicate or lost rows") {
    // The delivery-guarantee audit beyond state recovery: foreachBatch
    // is AT-LEAST-ONCE — if the job dies after the sink's side effect
    // but before the checkpoint commit, the restarted query REPLAYS
    // that batch. An idempotent sink (write generation keyed by
    // batchId, overwrite mode — the m_stream_upsert design) absorbs
    // the replay; this test forces exactly that crash window and
    // proves the final table still equals the batch recompute.
    val s = spark
    import s.implicits._
    val src = java.nio.file.Files
      .createTempDirectory("graft_eo_src").toFile
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_eo_ckpt").toFile
    val out = java.nio.file.Files
      .createTempDirectory("graft_eo_out").toFile

    def writeFile(name: String, rows: Seq[(Long, Double)],
                  mtime: Long): Unit = {
      val f = new java.io.File(src, name)
      java.nio.file.Files.write(f.toPath,
        rows.map { case (u, v) => s"""{"user_id": $u, "value": $v}""" }
          .mkString("\n").getBytes("UTF-8"))
      f.setLastModified(mtime)
    }
    val rows1 = (1L to 30L).map(u => (u % 7, u * 1.5))
    val rows2 = (31L to 50L).map(u => (u % 7, u * 0.5))
    writeFile("b1.json", rows1, 1000000L)
    writeFile("b2.json", rows2, 2000000L)

    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val attempts =
      new java.util.concurrent.ConcurrentHashMap[Long, Integer]()

    def start() = {
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one file per micro-batch
        .json(src.getAbsolutePath)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                         batchId: Long) =>
          val partial = batch.groupBy("user_id")
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,4)")).as("sv"))
          // idempotent: the generation dir is keyed by batchId and
          // OVERWRITTEN — a replayed batch re-lands its own output
          partial.write.mode("overwrite")
            .parquet(s"${out.getAbsolutePath}/gen=$batchId")
          val n = attempts.merge(batchId, 1, (a, b) =>
            Integer.valueOf(a + b))
          // crash window: die on batch 1's FIRST delivery only,
          // AFTER the sink side effect, BEFORE the checkpoint commit
          if (batchId == 1L && n == 1)
            throw new RuntimeException("simulated crash after sink write")
          ()
        }
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
    }

    try {
      // run 1: batch 0 commits; batch 1 lands its output then dies
      val q1 = start()
      val died = try { q1.awaitTermination(); false }
        catch { case _: Throwable => true }
      assert(died, "the simulated crash did not surface")
      // run 2: same checkpoint — batch 1 must be REPLAYED (the sink
      // side effect ran, but the commit didn't)
      val q2 = start()
      q2.awaitTermination()
      assert(attempts.get(1L) == 2,
        s"batch 1 was not replayed (attempts=${attempts.get(1L)}) — " +
          "the crash window closed too early to test anything")
      // no lost and no duplicated rows: union of landed generations
      // equals the batch recompute exactly
      val gens = Option(out.listFiles).get
        .filter(_.getName.startsWith("gen=")).map(_.getName).sorted
      assert(gens.length == 2, s"expected 2 generations, got ${gens.toSeq}")
      val got = s.read.parquet(s"${out.getAbsolutePath}/gen=*")
        .groupBy("user_id")
        .agg(sum("n").as("n"),
          sum("sv").cast("double").as("sum_value"))
        .orderBy("user_id")
        .as[(Long, Long, Double)].collect().toSeq
      val want = (rows1 ++ rows2).toDF("user_id", "value")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
        .orderBy("user_id")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == want,
        s"sink diverges from batch recompute after crash+replay:\n" +
          s"  got  $got\n  want $want")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(src); rm(ckpt); rm(out)
    }
  }

  test("stateful agg restarts from checkpoint: keeps old state, " +
    "reads only new files") {
    val s = spark
    import s.implicits._
    val src = java.nio.file.Files
      .createTempDirectory("graft_ckpt_src").toFile
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_ckpt_loc").toFile

    def writeBatch(name: String, rows: Seq[(Long, Double)],
                   mtime: Long): Unit = {
      val f = new java.io.File(src, name)
      val lines = rows.map { case (u, v) =>
        s"""{"user_id": $u, "value": $v}"""
      }
      java.nio.file.Files.write(f.toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      f.setLastModified(mtime)
    }
    val batch1 = (1L to 40L).map(u => (u % 5, u * 1.25))
    val batch2 = (41L to 60L).map(u => (u % 5, u * 0.75))
    writeBatch("b1.json", batch1, 1000000L)

    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("value", DoubleType)))

    def agg = s.readStream.schema(schema).json(src.getAbsolutePath)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))

    def run(sink: String): Long = {
      val q = agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }

    try {
      val in1 = run("ckpt_run1")
      assert(in1 == batch1.size,
        s"first run should ingest all ${batch1.size} batch-1 rows, got $in1")

      writeBatch("b2.json", batch2, 2000000L)
      val in2 = run("ckpt_run2")
      assert(in2 == batch2.size,
        s"restart must read ONLY the ${batch2.size} new rows " +
          s"(committed batch-1 files skipped via checkpoint), got $in2")

      val got = s.table("ckpt_run2")
        .orderBy("user_id")
        .as[(Long, Long, Double)].collect().toSeq
      val want = (batch1 ++ batch2).toDF("user_id", "value")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
        .orderBy("user_id")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got == want,
        s"restarted state diverges from batch recompute:\n" +
          s"  got  $got\n  want $want")
    } finally {
      Seq("ckpt_run1", "ckpt_run2")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(src); rm(ckpt)
    }
  }
}
