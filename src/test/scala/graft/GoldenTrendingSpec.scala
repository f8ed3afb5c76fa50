package graft

import graft.ops.Stats
import org.apache.spark.sql.functions._

/** Golden pin of the trending-score formula against the reference's own
  * committed output (`/root/reference/text_outputs/trend_output.txt:13-90`,
  * a 650-record run). The four top records' raw stats are fed through
  * [[Stats.trendingFeatures]] and the FINAL scores must reproduce to
  * ~1e-3 (the file prints 3 decimals).
  *
  * This pins the reference quirks that a "fixed" implementation would
  * break: recency grows WITH age, the "new video" bonus goes to videos
  * OLDER than 710 days, and the bonus MULTIPLIES the base instead of
  * being a weighted term.
  */
class GoldenTrendingSpec extends SparkSpec {

  // (id, age_days, views, rating, num_ratings, num_comments, length)
  // length chosen to hit the length_score class the file reports
  // (0.7 = "else" arm; 1.0 = between 120 and 900).
  private val golden = Seq(
    ("tScm-eZInBE", 720L, 2675254L, 4.65, 9105L, 5974L, 1000L, 826.760),
    ("6gmP4nk0EOE", 715L, 1353059L, 4.76, 10757L, 3640L, 300L, 817.487),
    ("C0f2dHJ6A18", 721L, 1510728L, 4.40, 7565L, 3502L, 300L, 799.006),
    ("zRVts7TFw-Y", 716L, 607456L, 4.79, 5711L, 3866L, 300L, 785.639))

  test("trending score reproduces trend_output.txt top-4 finals") {
    val s = spark
    import s.implicits._
    val df = golden
      .map { case (id, age, v, r, nr, nc, len, _) => (id, age, v, r, nr, nc, len) }
      .toDF("id", "age_days", "views", "rating", "num_ratings",
        "num_comments", "length")
      .withColumn("category", lit("g"))
    val out = Stats.trendingFeatures(df)
      .select("id", "trending_score", "engagement_bonus")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getAs[Number](2).doubleValue)).toMap
    golden.foreach { case (id, _, _, _, _, _, _, expected) =>
      val (score, bonus) = out(id)
      assert(math.abs(score - expected) < 2e-3,
        s"$id: got $score, expected $expected")
      assert(bonus == 2.0, s"$id: bonus should be APPLIED (2.0)")
    }
  }

  test("feature components match the file's printed values (record #1)") {
    val s = spark
    import s.implicits._
    val df = Seq(("v1", 720L, 2675254L, 4.65, 9105L, 5974L, 1000L))
      .toDF("id", "age_days", "views", "rating", "num_ratings",
        "num_comments", "length")
      .withColumn("category", lit("g"))
    val r = Stats.trendingFeatures(df).collect().head
    def f(c: String): Double = r.getAs[Number](r.fieldIndex(c)).doubleValue
    assert(math.abs(f("recency_boost") - 7.2) < 1e-9)
    assert(math.abs(f("views_velocity") - 10.656) < 1e-3)
    assert(math.abs(f("engagement_density") - 0.954394) < 1e-5)
    assert(math.abs(f("rating_quality") - 4.239) < 1e-3)
    assert(f("length_score") == 0.7)
  }
}
