package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** True streaming semantics that the batch-twin oracles cannot show:
  * across micro-batches, an event older than the watermark is DROPPED
  * from an append-mode windowed aggregation.
  *
  * Uses MemoryStream with explicit per-batch `processAllAvailable` —
  * under `Trigger.AvailableNow` (MultiBatchExecutor) Spark 4.1 plans
  * all batches up front and does NOT apply the inter-batch watermark to
  * late-row filtering, so a file-source version of this test would
  * (surprisingly) keep the late row — that quirk is regression-pinned
  * in [[WatermarkQuirkSpec]].
  */
class StreamsSpec extends SparkSpec {

  test("watermark drops late data across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ts(h: Int, m: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode("append") // emits only CLOSED windows
      .start()
    try {
      // batch 1: on-time events; watermark advances to 12:00 - 10min
      mem.addData((1L, ts(10, 30)), (2L, ts(12, 0)))
      q.processAllAvailable()
      // batch 2: 11:57 is within watermark; 09:00 is LATE (its window
      // closed below the 11:50 watermark) and must be dropped
      mem.addData((3L, ts(11, 57)), (4L, ts(9, 0)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = s.table("wm_sink")
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exactly the closed 10:00 window; no 09:00 (late, dropped) and no
    // 11:00/12:00 (still open at watermark 11:50)
    assert(rows == Map("10:00" -> 1L))
  }

  test("bucketed pre-aggregated attribution equals the pair join exactly") {
    // the decomposed rollup (view-side bucket aggregates + exact
    // boundary resolution) must be row-for-row identical to the pair
    // join it replaces — including n_pairs and the integer-space 4dp
    // average. This is the linear-output twin that survives hot keys
    // (8.6 s on scaledata/sf1skew where the pair join times out >590 s).
    val dir = "/root/testdata/sf0.001"
    val pair = graft.streaming.Streams.streamJoinCounts(spark, dir)
      .collect().map(_.toSeq).toSeq
    val bucketed = graft.streaming.Streams
      .streamJoinBucketedCounts(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(pair.nonEmpty)
    assert(bucketed == pair)
  }

  test("bucketed left/full twins equal their pair joins exactly") {
    val dir = "/root/testdata/sf0.001"
    val left = graft.streaming.Streams.streamLeftJoinCounts(spark, dir)
      .collect().map(_.toSeq).toSeq
    val leftB = graft.streaming.Streams
      .streamLeftJoinBucketedCounts(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(left.nonEmpty && leftB == left)
    val full = graft.streaming.Streams.streamFullJoinCounts(spark, dir)
      .collect().map(_.toSeq).toSeq
    val fullB = graft.streaming.Streams
      .streamFullJoinBucketedCounts(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(full.nonEmpty && fullB == full)
  }
}
