package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Multi-batch semantics of the foreachBatch upsert sink
  * (`m_stream_upsert`) that the single-batch AvailableNow run and its
  * batch oracle cannot show:
  *
  *   1. batch-split invariance — folding the merge over ANY partition
  *      of the input into batches yields the same final state as one
  *      batch (the merge is associative/commutative);
  *   2. a live MemoryStream run across explicit micro-batches lands on
  *      the batch aggregate;
  *   3. generation-keyed overwrite is what makes a replayed batch
  *      idempotent — re-applying a batch through the combine would
  *      double-count, so the sink must overwrite gen b, not re-merge.
  */
class UpsertSinkSpec extends SparkSpec {

  private def ts(day: Int, h: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  // (user_id, ts, event_id, event_type, value)
  private type Ev = (Long, java.sql.Timestamp, Long, String, Double)
  private val events: Seq[Ev] = Seq(
    (1L, ts(1, 10), 101L, "view", 10.5),
    (1L, ts(1, 12), 102L, "click", 20.25),
    (2L, ts(2, 9), 103L, "view", 5.0),
    (1L, ts(3, 8), 104L, "purchase", 99.99),
    (2L, ts(3, 11), 105L, "click", 7.75),
    (3L, ts(4, 16), 106L, "signup", 1.0))

  private def df(rows: Seq[Ev]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts", "event_id", "event_type", "value")
  }

  private def collectState(d: org.apache.spark.sql.DataFrame) =
    d.select(col("user_id"), col("n"), col("sv").cast("string"),
        col("last.us"), col("last.event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSet

  test("merge state is invariant under batch splits") {
    val whole = collectState(Streams.upsertPartial(df(events)))
    // two different splits, including an empty-ish middle batch
    val splitA = Seq(events.take(2), events.slice(2, 3), events.drop(3))
    val splitB = Seq(events.take(4), events.drop(4))
    for (split <- Seq(splitA, splitB)) {
      val folded = split.map(b => Streams.upsertPartial(df(b)))
        .reduce(Streams.upsertCombine)
      assert(collectState(folded) == whole)
    }
  }

  test("MemoryStream foreachBatch run lands on the batch aggregate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_upsert_spec_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val mem = MemoryStream[Ev]
    @volatile var cur: Option[String] = None
    val q = mem.toDF()
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val part = Streams.upsertPartial(batch)
        val merged = cur match {
          case None => part
          case Some(p) =>
            Streams.upsertCombine(batch.sparkSession.read.parquet(p), part)
        }
        val gen = s"$base/g$batchId"
        merged.write.mode("overwrite").parquet(gen)
        cur = Some(gen)
      }
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      mem.addData(events.take(3): _*); q.processAllAvailable()
      mem.addData(events.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    assert(cur.isDefined)
    val got = collectState(s.read.parquet(cur.get))
    assert(got == collectState(Streams.upsertPartial(df(events))))
    // user 1's merged row shows genuinely cross-batch state: events in
    // both batches, last event from batch 2
    val u1 = got.find(_._1 == 1L).get
    assert(u1._2 == 3L && u1._5 == "purchase")
  }

  test("re-merging a batch double-counts; overwriting its generation does not") {
    val b1 = Streams.upsertPartial(df(events.take(3)))
    val b2 = Streams.upsertPartial(df(events.drop(3)))
    val once = Streams.upsertCombine(b1, b2)
    val replayedThroughCombine = Streams.upsertCombine(once, b2)
    val nOnce = once.agg(sum("n")).head.getLong(0)
    val nReplay = replayedThroughCombine.agg(sum("n")).head.getLong(0)
    assert(nReplay == nOnce + events.drop(3).size,
      "combine is not idempotent — which is exactly why the sink keys " +
        "its output directory by batchId and overwrites on replay")
    // the generation-overwrite path: writing b2's merge result twice to
    // the same gen dir leaves the once-applied state
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_upsert_rp_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    once.write.mode("overwrite").parquet(s"$base/g1")
    Streams.upsertCombine(b1, b2).write.mode("overwrite").parquet(s"$base/g1")
    assert(collectState(spark.read.parquet(s"$base/g1")) ==
      collectState(once))
  }
}
