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
