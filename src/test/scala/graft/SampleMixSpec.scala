package graft

import org.apache.spark.sql.functions._

/** Pins the two properties that make `m_sample_mix` a training-data
  * mixing operator rather than a `df.sample()` call: the draw is a pure
  * function of doc_id (two invocations yield the SAME rows — sample()
  * re-draws per execution), and each source tier's kept fraction tracks
  * its quota.
  */
class SampleMixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("m_sample_mix is deterministic and tracks tier quotas") {
    def kept(): Set[Long] =
      SparkEntry.queries("m_sample_mix")(spark, sf)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val a = kept()
    val b = kept()
    assert(a == b, "two executions drew different samples")
    assert(a.nonEmpty)

    val byTier = SparkEntry.queries("m_sample_mix")(spark, sf)
      .groupBy("pct").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sf).count()
    // 20 uniform sources: tiers 100/50/20 cover 5/5/10 sources each
    val expected = Map(100 -> total * 5 / 20, 50 -> total * 5 / 20,
      20 -> total * 10 / 20)
    for ((pct, n) <- byTier) {
      val frac = n.toDouble / expected(pct)
      assert(math.abs(frac - pct / 100.0) < 0.15,
        s"tier $pct%% kept ${frac * 100}%% of its stratum")
    }
  }
}
