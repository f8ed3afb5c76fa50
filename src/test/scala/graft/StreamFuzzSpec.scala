package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

import scala.util.Random

/** Property fuzz for the STATEFUL STREAMING surface — the streaming
  * counterpart of the 3-backend relational fuzzer (round-8 VERDICT
  * item 7). The relational fuzzer can't reach watermark eviction,
  * orphan emission, or state composition across micro-batches; this
  * one generates, per seed,
  *   - a random in-order event stream (random users, types, gaps,
  *     same-instant pairs, and duplicate event_ids within half the
  *     watermark lag — the regime where dedup state is PROVABLY live
  *     at the duplicate, so results are split-independent),
  *   - a random watermark lag, and
  *   - a random chop into 2–6 consecutive micro-batches
  *     (MemoryStream + processAllAvailable, the only Spark 4.1 path
  *     where the inter-batch watermark really advances — see
  *     WatermarkQuirkSpec),
  * then drives the PRODUCTION transformations (Streams.tumblingAgg /
  * slidingAgg / dedupAgg / asofPairs — not copies) and demands
  * bit-equality with a split-independent oracle: the identical
  * transformation as a plain batch query (window aggs), a batch
  * dedup-then-count (dedup), or an exact in-order scan (as-of join).
  * Oracle-equality under a random split implies batch-split
  * invariance, since the oracle never sees the split.
  *
  * 100 seeds per CI pass (GRAFT_STREAM_FUZZ_CASES overrides for
  * soaks); a failure prints the seed, shape, lag and batch sizes for
  * pinned repro.
  */
class StreamFuzzSpec extends SparkSpec {

  private type Ev = (java.sql.Timestamp, Long, String, Double, Long)

  private val baseMs = java.sql.Timestamp
    .valueOf("2024-06-01 00:00:00").getTime

  /** Random in-order event stream. Returns rows sorted by
    * (ts, views-first, event_id) — the arrival order a
    * watermark-driven source would deliver (asofPairs documents the
    * views-first-at-same-instant requirement). */
  private def genEvents(rnd: Random, lagSec: Long): Seq[Ev] = {
    val n = 10 + rnd.nextInt(41)
    var tMs = baseMs
    val types = Seq("view", "view", "click", "purchase")
    val base = (0 until n).map { i =>
      // gaps 0..6h; 0 creates same-instant pairs
      tMs += (if (rnd.nextInt(5) == 0) 0L
              else (rnd.nextInt(21600) + 1) * 1000L)
      (new java.sql.Timestamp(tMs), 1000L + i,
        types(rnd.nextInt(types.size)),
        (rnd.nextInt(10000) + 1) / 100.0,
        1L + rnd.nextInt(4))
    }
    // duplicate ~20% of rows with the SAME event_id within lag/2 of
    // the original — guaranteed droppable under any micro-batch split
    val dups = base.filter(_ => rnd.nextInt(5) == 0).map {
      case (t, id, ty, v, u) =>
        val dt = (rnd.nextInt(math.max(1, (lagSec / 2).toInt)) + 1) * 1000L
        (new java.sql.Timestamp(t.getTime + dt), id, ty, v, u)
    }
    (base ++ dups).sortBy { case (t, id, ty, _, _) =>
      (t.getTime, if (ty == "view") 0 else 1, id)
    }
  }

  /** Random consecutive split into ≥ 2 micro-batches. */
  private def split(rnd: Random, rows: Seq[Ev]): Seq[Seq[Ev]] = {
    val cuts = (Seq(1 + rnd.nextInt(rows.size - 1)) ++
      Seq.fill(rnd.nextInt(4))(rnd.nextInt(rows.size + 1)))
      .:+(0).:+(rows.size).distinct.sorted
    cuts.zip(cuts.tail).map { case (a, b) => rows.slice(a, b) }
  }

  private def runStream(batches: Seq[Seq[Ev]],
                        mk: DataFrame => DataFrame,
                        mode: String): Seq[String] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Ev]
    val sink = "sfz_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val src = mem.toDF()
      .toDF("ts", "event_id", "event_type", "value", "user_id")
    val q = mk(src).writeStream
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

  /** Exact in-order as-of oracle: per purchase, the most recent view
    * at or before it (≤ 1 day back) of the same user. */
  private def asofOracle(rows: Seq[Ev]): Seq[String] = {
    val lastView = collection.mutable.Map.empty[Long, Long]
    val out = collection.mutable.ArrayBuffer.empty[String]
    rows.foreach { case (t, _, ty, _, u) =>
      val us = t.getTime * 1000L
      if (ty == "view") lastView(u) =
        math.max(lastView.getOrElse(u, Long.MinValue), us)
      else if (ty == "purchase") {
        val v = lastView.get(u)
          .filter(vu => vu <= us && us - vu <= 86400000000L)
        // Row-style rendering to match the collected sink rows
        out += s"[$u,$us,${v.map(_.toString).getOrElse("null")}]"
      }
    }
    out.sorted.toSeq
  }

  test("stateful streaming shapes match split-independent oracles " +
    "over random streams, lags and micro-batch splits") {
    val s = spark
    import s.implicits._
    val cases = sys.env.getOrElse("GRAFT_STREAM_FUZZ_CASES", "100").toInt
    val lags = Seq(1800L -> "30 minutes", 3600L -> "1 hour",
      7200L -> "2 hours")
    for (seed <- 1 to cases) {
      val rnd = new Random(seed)
      val (lagSec, lag) = lags(rnd.nextInt(lags.size))
      val rows = genEvents(rnd, lagSec)
      val batches = split(rnd, rows)
      val batchDF = rows
        .toDF("ts", "event_id", "event_type", "value", "user_id")
      val shape = seed % 4
      val (name, got, want) = shape match {
        case 0 =>
          ("tumbling",
            runStream(batches, Streams.tumblingAgg(_, lag), "complete"),
            Streams.tumblingAgg(batchDF, lag)
              .collect().map(_.toString).sorted.toSeq)
        case 1 =>
          ("sliding",
            runStream(batches, Streams.slidingAgg(_, lag), "complete"),
            Streams.slidingAgg(batchDF, lag)
              .collect().map(_.toString).sorted.toSeq)
        case 2 =>
          ("dedup",
            runStream(batches, Streams.dedupAgg(_, lag), "complete"),
            batchDF.dropDuplicates("event_id")
              .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
              .collect().map(_.toString).sorted.toSeq)
        case _ =>
          ("asof",
            runStream(batches, Streams.asofPairs(s, _), "append"),
            asofOracle(rows))
      }
      assert(got == want,
        s"seed=$seed shape=$name lag=$lag " +
          s"batches=${batches.map(_.size).mkString("/")}\n" +
          s"  got:  $got\n  want: $want")
    }
  }
}
