package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Multi-batch semantics of the transformWithState query
  * (`m_stream_tws`) that the single-batch AvailableNow run and its
  * batch oracle cannot show: the MapState/ValueState accumulation plus
  * the max-(n,sum) read-back must land on the same final table no
  * matter how the input is split into micro-batches — including a
  * user whose rows span batches (state carried across batches) and a
  * batch that re-emits a user's stale types (update semantics append
  * one row per key per updating batch; the read-back collapses them).
  */
class TwsSpec extends SparkSpec {

  // (user_id, event_type, 4dp-scaled value)
  private type In = (Long, String, Long)
  private val rows: Seq[In] = Seq(
    (1L, "view", 105000L),
    (1L, "click", 202500L),
    (2L, "view", 50000L),
    (1L, "view", 999900L),
    (2L, "click", 77500L),
    (3L, "signup", 10000L),
    (1L, "click", 12500L))

  private def runSplit(split: Seq[Seq[In]])
      : Set[(Long, String, Long, Double, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[In]
      val sink = "tws_spec_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val q = Streams.twsTransform(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update())
        .start()
      // one explicit micro-batch per split element: each addData +
      // processAllAvailable drains exactly that slice as its own batch
      split.foreach { batch =>
        mem.addData(batch: _*)
        q.processAllAvailable()
      }
      q.stop()
      Streams.twsReadBack(s.table(sink)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3), r.getLong(4))).toSet
    } finally prev match {
      case Some(p) => s.conf.set(provKey, p)
      case None    => s.conf.unset(provKey)
    }
  }

  test("read-back is invariant under micro-batch splits") {
    val expected = Set(
      (1L, "view", 2L, 110.49, 4L),
      (1L, "click", 2L, 21.5, 4L),
      (2L, "view", 1L, 5.0, 2L),
      (2L, "click", 1L, 7.75, 2L),
      (3L, "signup", 1L, 1.0, 1L))
    val whole = runSplit(Seq(rows))
    assert(whole == expected, s"single-batch result wrong: $whole")
    // user 1 spans all three batches; batch 2 re-touches user 1's
    // "view" after "click" already exists (stale-type re-emission)
    val splitA = Seq(rows.take(3), rows.slice(3, 5), rows.drop(5))
    val splitB = Seq(rows.take(1), rows.slice(1, 6), rows.drop(6))
    assert(runSplit(splitA) == expected)
    assert(runSplit(splitB) == expected)
  }

  test("event-time timers fire on watermark advance and clear state") {
    // The other half of the transformWithState API: a session tracker
    // that emits ONLY from handleExpiredTimer — rows buffer into state
    // and register an event-time timer at last-seen + 1h; the session
    // row appears when (and only when) the watermark crosses it.
    import org.apache.spark.sql.streaming.{
      OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
      ExpiredTimerInfo, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    class SessionTimer
        extends StatefulProcessor[Long, (Long, java.sql.Timestamp), (Long, Long)] {
      @transient private var st: ValueState[(Long, Long)] = _ // (n, lastMs)
      override def init(o: OutputMode, t: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Long)](
          "sess", E.tuple(E.scalaLong, E.scalaLong), TTLConfig.NONE)
      override def handleInputRows(
          user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
          tv: TimerValues): Iterator[(Long, Long)] = {
        var (n, last) = if (st.exists()) st.get() else (0L, 0L)
        rows.foreach { case (_, ts) =>
          n += 1; last = math.max(last, ts.getTime) }
        st.update((n, last))
        getHandle.registerTimer(last + 3600 * 1000L)
        Iterator.empty
      }
      override def handleExpiredTimer(
          user: Long, tv: TimerValues,
          info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
        val out = if (st.exists()) Iterator((user, st.get()._1))
          else Iterator.empty
        st.clear()
        out
      }
    }
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(provKey)
    s.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val sink = "tws_timer_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val q = mem.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, java.sql.Timestamp)]
        .groupByKey(_._1)
        .transformWithState(new SessionTimer, TimeMode.EventTime(),
          OutputMode.Append())
        .toDF("user_id", "n")
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .start()
      // base offset keeps every row strictly ABOVE the initial
      // watermark (0): the late filter drops ts <= watermark, so a row
      // at epoch 0 would silently vanish from batch 1
      def ts(ms: Long) = new java.sql.Timestamp(10000 + ms)
      // batch 1: user 7's session (3 rows inside a minute); watermark
      // after the batch = ~70s — the 1h timer is NOT yet due
      mem.addData((7L, ts(0)), (7L, ts(30000)), (7L, ts(60000)))
      q.processAllAvailable()
      assert(s.table(sink).count() == 0,
        "session emitted before its gap timer expired")
      // batch 2: a different user 3h later pushes the watermark past
      // user 7's timer — the session row must appear, exactly once
      mem.addData((9L, ts(3 * 3600 * 1000L)))
      q.processAllAvailable()
      // one more empty-ish advance so user 9's own timer stays pending
      val rows = s.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      q.stop()
      assert(rows == Set((7L, 3L)),
        s"expected user 7's 3-row session only, got $rows")
    } finally prev match {
      case Some(p) => s.conf.set(provKey, p)
      case None    => s.conf.unset(provKey)
    }
  }

  test("m_stream_tws runs a transformWithState operator") {
    val df = SparkEntry.queries("m_stream_tws")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
    // the state-sizing hook records the operator the run actually used
    val ops = Streams.lastStateMetrics.get().map(_._1)
    assert(ops.exists(_.toLowerCase.contains("transformwithstate")),
      s"expected a transformWithState state operator, got: $ops")
  }
}
