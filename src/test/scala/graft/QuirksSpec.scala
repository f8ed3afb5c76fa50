package graft

import graft.ops.{Ingest, Stats}
import org.apache.spark.sql.functions._

/** Reference quirks that ARE the spec (SURVEY §7.4 item 5) — each would
  * silently change results if "fixed" or reordered.
  */
class QuirksSpec extends SparkSpec {

  private def featRow(age: Long, views: Long, rating: Double, nr: Long,
                      nc: Long, len: Long) = {
    val s = spark
    import s.implicits._
    val df = Seq(("x", age, views, rating, nr, nc, len))
      .toDF("id", "age_days", "views", "rating", "num_ratings",
        "num_comments", "length")
      .withColumn("category", lit("g"))
    Stats.trendingFeatures(df).collect().head
  }

  test("when-chain arm ORDER matters: length 25 hits <30 only because " +
    "the between-arm runs first (trending_predictor.py:108-114)") {
    val r = featRow(100, 1000, 4.0, 10, 10, 25)
    assert(r.getAs[Double]("length_score") == 0.3)
    // 4000 is neither between(120,900) nor <30 nor >3600 => else arm
    assert(featRow(100, 1000, 4.0, 10, 10, 3000)
      .getAs[Double]("length_score") == 0.7)
    assert(featRow(100, 1000, 4.0, 10, 10, 4000)
      .getAs[Double]("length_score") == 0.4)
  }

  test("'new video' bonus goes to OLD videos (age>710) and MULTIPLIES " +
    "the base (not a weighted term) — trending_predictor.py:97-104,160") {
    val young = featRow(100, 2675254, 4.65, 9105, 5974, 300)
    val old = featRow(711, 2675254, 4.65, 9105, 5974, 300)
    assert(young.getAs[Number]("engagement_bonus").doubleValue == 1.0)
    assert(old.getAs[Number]("engagement_bonus").doubleValue == 2.0)
    // base parts identical except recency; verify multiply-not-add:
    // score(old) == 2 * (base terms at age 711)
    val base = 711.0 / 100 * 20 +
      math.log1p(2675254) * 711 / 1000 * 15 +
      ((9105.0 + 5974) / (math.log1p(2675254) + 1)) / 1000 * 3 +
      4.65 * (math.log1p(9105) / 10) * 25 + 1.0 * 1
    assert(math.abs(old.getAs[Double]("trending_score") - 2 * base) < 1e-9)
  }

  test("dirname date rule: MMDD => 2007, YYMMDD => 2000+YY (NOT the " +
    "POSIX 69/99 pivot); impossible dates => null (mongo_loader.py:73-94)") {
    val s = spark
    import s.implicits._
    val df = Seq("0301", "080216", "971231", "0229")
      .toDF("dirname")
      .select(col("dirname"), Ingest.dirDate(col("dirname")).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getDate(1))).toMap
    assert(df("0301").get.toString == "2007-03-01")
    assert(df("080216").get.toString == "2008-02-16")
    assert(df("971231").get.toString == "2097-12-31") // 2097, not 1997
    assert(df("0229").isEmpty) // 2007-02-29 does not exist
  }

  test("variadic TSV tail: fields 10+ become related_ids; <9 fields " +
    "are rejects (data_types.py:26-42, load.py:22-26)") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      ("d1", "v1\tu1\t10\tCat\t300\t500\t4.5\t7\t3"),            // exactly 9
      ("d1", "v2\tu2\t10\tCat\t300\t500\t4.5\t7\t3\tr1\tr2"),    // tail of 2
      ("d1", "v3\tu3\tbroken"),                                  // reject
      ("d2", "v4\tu4\t10\tCat\t300\t500\t4.5\t7\t3\tr9"))        // tail of 1
      .toDF("dirname", "line")
    val parsed = Ingest.parse(lines).orderBy("id").collect()
    assert(parsed.map(_.getAs[String]("id")).toSeq == Seq("v1", "v2", "v4"))
    val tails = parsed
      .map(r => r.getSeq[String](r.fieldIndex("related_ids")).toList).toSeq
    assert(tails == Seq(Nil, List("r1", "r2"), List("r9")))
    assert(parsed.head.getAs[Long]("views") == 500L)
    assert(parsed.head.getAs[Double]("rating") == 4.5)
    val rej = Ingest.rejects(lines).collect()
    assert(rej.length == 1 && rej.head.getAs[String]("line").startsWith("v3"))
  }

  test("first-wins dedup keeps exactly one row per key, the smallest by " +
    "the tie-break order (mongo_loader.py:57-61,175-226)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, 1, "a"), (1L, 1, "b"), (1L, 2, "c"), (2L, 5, "d"))
      .toDF("k", "seq", "payload")
    val w = Window.partitionBy(col("k")).orderBy(col("seq"), col("payload"))
    val out = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(out == Seq((1L, "a"), (2L, "d")))
  }

  test("Spark rollup/cube over EMPTY input emits ZERO rows — the SQL " +
    "standard (and DuckDB) emits the empty grouping set's grand-total " +
    "row; Fuzz normalizes with HAVING count(*) > 0 on the SQL side") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    // keyless aggregate over empty input DOES emit its one row …
    assert(empty.groupBy().agg(count(lit(1))).count() == 1L)
    // … but the rollup/cube grand-total set does not (quirk pin: an
    // engine upgrade that goes standard-compliant flips these and the
    // Fuzz HAVING normalization must then be dropped)
    assert(empty.rollup(col("k")).agg(count(lit(1))).count() == 0L)
    assert(empty.cube(col("k")).agg(count(lit(1))).count() == 0L)
  }

  test("Spark 4.1 optimizer BUG (found by the fuzzer, seed 219): a " +
    "CASE predicate referencing a grouping KEY under rollup/cube " +
    "over a UNION trips RemoveRedundantAliases into an invalid plan") {
    val s = spark
    // the parquet-scan child matters: an in-memory LocalRelation does
    // not reproduce it, the self-aliased cached scan does
    val base = graft.Tables.part(s, "/root/testdata/sf0.001")
      .select(col("p_partkey").cast("long").as("p_partkey"),
        col("p_brand").as("p_brand"), col("p_type").as("p_type"),
        col("p_size").cast("long").as("p_size"))
      .filter(col("p_partkey") <= 300L)
    val un = base.unionByName(base.filter(col("p_size") =!= 33L))
    def q(pred: org.apache.spark.sql.Column) =
      un.cube(col("p_size"), col("p_brand"))
        .agg(sum(when(pred, abs(col("p_partkey")) % lit(603))
          .otherwise(lit(0L))).as("b"))
    // non-key predicate: fine
    assert(q(col("p_type") >= "M").collect().nonEmpty)
    // grouping-key predicate: PLAN_VALIDATION_FAILED_RULE_IN_BATCH.
    // Quirk pin — an engine upgrade that fixes this flips the
    // intercept, and the Fuzz generator's non-key-predicate
    // restriction for grouping-set conditional aggs can be dropped.
    val e = intercept[Exception] {
      q(col("p_brand") >= "Brand#22").collect()
    }
    // pin the SPECIFIC failure — any other error class here would be
    // a different (new) problem, not this quirk
    assert(e.getMessage.contains("PLAN_VALIDATION_FAILED_RULE_IN_BATCH"),
      s"expected the RemoveRedundantAliases plan-validation failure, " +
        s"got: ${e.getMessage.take(200)}")
  }
}
