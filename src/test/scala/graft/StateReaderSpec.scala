package graft

import graft.streaming.Streams

/** The state store reader round trip (m_stream_state_reader): beyond
  * the DuckDB differential, pin the ops-facing properties — the
  * state-metadata source describes the checkpoint's operators, and the
  * reader's per-partition rows reassemble the full key space.
  */
class StateReaderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("state-metadata describes the aggregation operator") {
    // the per-invocation API returns the checkpoint keyed to THIS
    // run (the global lastStateCheckpoint is a convenience slot that
    // races under interleaved runs — r11 ADVICE)
    val (df, ckpt) = Streams.stateReaderCountsWithCkpt(spark, sf)
    assert(df.count() > 0)
    assert(ckpt != null, "stateReaderCounts did not record its checkpoint")
    assert(Streams.lastStateCheckpoint == ckpt,
      "last-invocation slot should mirror the per-invocation path here")
    val meta = spark.read.format("state-metadata")
      .load(ckpt)
    val ops = meta.select("operatorName").collect().map(_.getString(0))
    assert(ops.contains("stateStoreSave"),
      s"expected the aggregation state operator, got: ${ops.toSeq}")
    val parts = meta.select("numPartitions").collect().map(_.getInt(0))
    assert(parts.forall(_ == sys.env.getOrElse(
      "SPARK_GRAFT_STREAM_SHUFFLE", "8").toInt),
      s"state partition count drifted from the pinned stream width: ${parts.toSeq}")
  }

  test("reader rows cover every user exactly once") {
    val rows = Streams.stateReaderCounts(spark, sf).collect()
    val users = rows.map(_.getLong(0))
    assert(users.distinct.length == users.length, "duplicate state keys")
    val expect = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(users.length == expect,
      s"state covers ${users.length} users, events has $expect")
  }
}
