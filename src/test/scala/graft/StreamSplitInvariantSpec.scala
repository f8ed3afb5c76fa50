package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams

import scala.util.Random

/** Micro-batch boundary invariance for the stateful streaming
  * operators (`m_stream_tumbling` / `m_stream_sliding` /
  * `m_stream_dedup`): for IN-ORDER input, the final result must not
  * depend on how the stream is chopped into micro-batches — the
  * property that makes backfill (one giant batch) and live tailing
  * (many small ones) interchangeable at 100 TB. The spec drives the
  * PRODUCTION transformations (Streams.tumblingAgg / slidingAgg /
  * dedupAgg — not copies) through MemoryStream with seed-random split
  * points and compares every run bit-exactly against the
  * single-batch run and (for the window aggregations) the same
  * transformation executed as a plain batch query.
  *
  * In-order matters: for LATE data the result legitimately depends on
  * batch boundaries (the watermark only advances between batches), so
  * late-row semantics are pinned separately in StreamsSpec /
  * WatermarkQuirkSpec, not here. The fixture includes exact-duplicate
  * event_ids ≤ 1 h after their originals: with non-decreasing
  * timestamps the dedup state is provably still live whenever the
  * duplicate arrives (watermark ≤ dup ts − 1 h < original ts + 1 h),
  * so drops are split-invariant by construction.
  */
class StreamSplitInvariantSpec extends SparkSpec {

  private def ts(day: Int, h: Int, m: Int = 0): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-$day%02d $h%02d:$m%02d:00")

  // (ts, event_id, event_type, value) — non-decreasing ts; ids 103 and
  // 107 are exact duplicates of earlier rows (30 min later)
  private type Ev = (java.sql.Timestamp, Long, String, Double)
  // the as-of source additionally needs user_id
  private type AEv = (java.sql.Timestamp, Long, String, Double, Long)
  private val events: Seq[Ev] = Seq(
    (ts(1, 8), 101L, "view", 10.50),
    (ts(1, 9), 102L, "click", 3.25),
    (ts(1, 9, 30), 103L, "view", 7.00),
    (ts(1, 10), 103L, "view", 7.00), // duplicate of 103
    (ts(1, 18), 104L, "purchase", 99.99),
    (ts(2, 7), 105L, "view", 1.75),
    (ts(2, 12), 106L, "click", 8.00),
    (ts(2, 12, 15), 107L, "view", 2.50),
    (ts(2, 12, 45), 107L, "view", 2.50), // duplicate of 107
    (ts(2, 23), 108L, "purchase", 42.00),
    (ts(3, 0, 30), 109L, "view", 5.25),
    (ts(3, 11), 110L, "click", 6.50),
    (ts(4, 9), 111L, "view", 12.00),
    (ts(4, 21), 112L, "signup", 1.00),
    (ts(5, 6), 113L, "view", 4.75))

  private def srcDF(mem: MemoryStream[Ev]): DataFrame =
    mem.toDF().toDF("ts", "event_id", "event_type", "value")

  /** Run the streaming query built by `mk` over the rows fed as the
    * given consecutive batches; return the canonical sorted rows of
    * the final sink table. */
  private def runStream[T: org.apache.spark.sql.Encoder](
      batches: Seq[Seq[T]], mk: MemoryStream[T] => DataFrame,
      mode: String): Seq[String] = {
    val s = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[T]
    val sink = "split_inv_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = mk(mem).writeStream
      .outputMode(mode).format("memory").queryName(sink).start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val out = s.table(sink).collect().map(_.toString).sorted.toSeq
    s.catalog.dropTempView(sink)
    out
  }

  private def run(batches: Seq[Seq[Ev]],
                  agg: DataFrame => DataFrame): Seq[String] = {
    val s = spark
    import s.implicits._
    runStream[Ev](batches, m => agg(srcDF(m)), "complete")
  }

  /** Random consecutive split of `rows` into ≥ 2 batches (one cut is
    * always interior, so a vacuous whole-vs-whole comparison cannot
    * be drawn). */
  private def split[T](rnd: Random, rows: Seq[T]): Seq[Seq[T]] = {
    val interior = 1 + rnd.nextInt(rows.size - 1)
    val extra = Seq.fill(rnd.nextInt(3))(rnd.nextInt(rows.size + 1))
    val pts = (extra :+ interior :+ 0 :+ rows.size).distinct.sorted
    pts.zip(pts.tail).map { case (a, b) => rows.slice(a, b) }
  }

  private val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
    "tumbling" -> (Streams.tumblingAgg(_)),
    "sliding" -> (Streams.slidingAgg(_)),
    "dedup" -> (Streams.dedupAgg(_)))

  test("tumbling/sliding/dedup results are invariant under random " +
    "micro-batch splits of in-order input") {
    val rnd = new Random(7) // seed-pinned repro
    for ((name, agg) <- shapes) {
      val whole = run(Seq(events), agg)
      assert(whole.nonEmpty, s"$name produced no rows")
      for (i <- 1 to 4) {
        val batches = split(rnd, events)
        val got = run(batches, agg)
        assert(got == whole,
          s"$name diverged on split ${batches.map(_.size)} (run $i):\n" +
            s"  whole: $whole\n  split: $got")
      }
    }
  }

  test("the as-of join is invariant under random micro-batch splits " +
    "and its single-max state composes across batches") {
    val s = spark
    import s.implicits._
    // views and purchases interleave per user, with a same-instant
    // view+purchase pair (user 2, day 2 12:00) pinning the
    // views-first tie-break. NOTE: the invariance property requires
    // same-instant peers to be fed view-first (as here) — a purchase
    // physically BEFORE its same-instant view with a boundary between
    // them legitimately diverges, because append-mode output cannot
    // be retracted (documented on asofPairs; a watermark-driven
    // source never splits peers)
    val evs: Seq[AEv] = Seq(
      (ts(1, 8), 201L, "view", 1.0, 1L),
      (ts(1, 9), 202L, "purchase", 5.0, 1L),
      (ts(1, 10), 203L, "view", 1.0, 2L),
      (ts(2, 12), 204L, "view", 1.0, 2L),
      (ts(2, 12), 205L, "purchase", 9.0, 2L),
      (ts(3, 14), 206L, "purchase", 7.0, 2L), // > 1 day after last view
      (ts(4, 9), 207L, "view", 1.0, 1L),
      (ts(4, 10), 208L, "purchase", 3.0, 1L),
      (ts(5, 6), 209L, "purchase", 2.0, 3L)) // user 3: no view ever
    def runAsof(batches: Seq[Seq[AEv]]): Seq[String] =
      runStream[AEv](batches,
        m => Streams.asofPairs(s, m.toDF()
          .toDF("ts", "event_id", "event_type", "value", "user_id")),
        "append")
    val whole = runAsof(Seq(evs))
    // one row per purchase; same-instant view matched; >1d view not;
    // user 3 unmatched
    assert(whole.size == 5)
    val rnd = new Random(11)
    for (i <- 1 to 4) {
      val batches = split(rnd, evs)
      assert(runAsof(batches) == whole,
        s"asof diverged on split ${batches.map(_.size)} (run $i)")
    }
  }

  test("the streaming window aggregations land on the plain batch " +
    "computation of the same transformation") {
    val s = spark
    import s.implicits._
    val batchDF = events.toDF("ts", "event_id", "event_type", "value")
    for ((name, agg) <- Seq(
      "tumbling" -> ((d: DataFrame) => Streams.tumblingAgg(d)),
      "sliding" -> ((d: DataFrame) => Streams.slidingAgg(d)))) {
      // withWatermark is a no-op on a batch Dataset, so the identical
      // transformation runs in both modes
      val batch = agg(batchDF).collect().map(_.toString).sorted.toSeq
      val streamed = run(Seq(events), agg)
      assert(streamed == batch, s"$name: streamed != batch")
    }
  }
}
