package graft.ops

import graft.{Oracles, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named query with its DuckDB oracle (None ⇒ driver does rows-only check). */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

/** SURVEY §2 categories B (projection), C (filters), D (explode), E (joins),
  * F (aggregations), H (sorts/limits), I (scalar functions), L (dedup).
  *
  * Determinism contract (SURVEY §5): every query ends in a total ORDER BY
  * with a unique tie-break; `collect_*` outputs are `array_sort`ed; float
  * aggregates are rounded to 4 decimals on both engines; money sums go
  * through decimal(18,2) then back to double so the result is independent
  * of summation order.
  */
object Relational {

  /** Exact money sum: order-independent across engines. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val all: Seq[Q] = Seq(

    // ----- B1: nested-field projection + alias (trending_predictor.py:49-60)
    Q("b1_nested_projection",
      (s, d) => Tables.videosNested(s, d).select(
          col("id"),
          col("video_desc.uploader").as("uploader"),
          col("video_desc.age_days").as("age_days"),
          col("video_desc.category").as("category"),
          col("video_attri.length").as("length"),
          col("video_attri.rating").as("rating"),
          col("video_engagement.views").as("views"),
          col("video_engagement.num_ratings").as("num_ratings"),
          col("video_engagement.num_comments").as("num_comments"))
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id, uploader, age_days, category, length, rating, views,
          |       num_ratings, num_comments
          |FROM videos ORDER BY id""".stripMargin))),

    // ----- B3 + I1/I6: derived-column arithmetic (trending features)
    Q("b3_arithmetic",
      (s, d) => Tables.videos(s, d).select(
          col("id"),
          round(col("age_days") / 100, 4).as("recency_boost"),
          round(log1p(col("views")) * col("age_days") / 1000, 4)
            .as("views_velocity"),
          round(((col("num_ratings") + col("num_comments")) /
            (log1p(col("views")) + 1)) / 1000, 4).as("engagement_density"),
          round(log1p(col("num_ratings")) / 10, 4).as("rating_confidence"))
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id,
          |  round(age_days / 100, 4) AS recency_boost,
          |  round(ln(1 + views) * age_days / 1000, 4) AS views_velocity,
          |  round(((num_ratings + num_comments) / (ln(1 + views) + 1)) / 1000, 4)
          |    AS engagement_density,
          |  round(ln(1 + num_ratings) / 10, 4) AS rating_confidence
          |FROM videos ORDER BY id""".stripMargin))),

    // ----- B5 + I5: casts to double + date-part extraction
    // (correlation_analysis.py:86-98)
    Q("b5_cast_dateparts",
      (s, d) => Tables.videos(s, d).select(
          col("id"),
          col("views").cast("double").as("views_d"),
          col("rating").cast("double").as("rating_d"),
          dayofmonth(col("upload_date")).as("up_day"),
          month(col("upload_date")).as("up_month"),
          year(col("upload_date")).as("up_year"))
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id, CAST(views AS DOUBLE) AS views_d,
          |       CAST(rating AS DOUBLE) AS rating_d,
          |       CAST(dayofmonth(upload_date) AS INT) AS up_day,
          |       CAST(month(upload_date) AS INT) AS up_month,
          |       CAST(year(upload_date) AS INT) AS up_year
          |FROM videos ORDER BY id""".stripMargin))),

    // ----- C1: conjunctive cleaning filter, verbatim shape
    // (trending_predictor.py:63-70)
    Q("c1_clean_filter",
      (s, d) => Tables.videos(s, d)
        .filter(col("id").isNotNull && col("age_days") >= 0 &&
          col("views") >= 0 && col("rating").between(0, 5) &&
          col("num_ratings") >= 0 && col("num_comments") >= 0)
        .select("id", "age_days", "views", "rating", "num_ratings",
          "num_comments")
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id, age_days, views, rating, num_ratings, num_comments
          |FROM videos
          |WHERE id IS NOT NULL AND age_days >= 0 AND views >= 0
          |  AND rating BETWEEN 0 AND 5 AND num_ratings >= 0
          |  AND num_comments >= 0
          |ORDER BY id""".stripMargin))),

    // ----- C1b: selective variant (ensures the predicate actually prunes)
    Q("c1b_selective_filter",
      (s, d) => Tables.videos(s, d)
        .filter(col("rating") > 4.0 && col("views") >= 200000 &&
          col("category") =!= "5-LOW")
        .select("id", "category", "rating", "views")
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id, category, rating, views FROM videos
          |WHERE rating > 4.0 AND views >= 200000 AND category <> '5-LOW'
          |ORDER BY id""".stripMargin))),

    // ----- C2: drop-null rows (correlation_analysis.py:99); fixture columns
    // are non-null, so nulls are manufactured first (nullif), then na.drop.
    Q("c2_dropna",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") > 45, lit(null)).otherwise(col("l_quantity"))
            .as("qty"),
          nullif(col("l_returnflag"), lit("A")).as("rf"))
        .na.drop()
        .orderBy("l_orderkey", "l_linenumber"),
      Some(
        """SELECT l_orderkey, l_linenumber,
          |       CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END AS qty,
          |       nullif(l_returnflag, 'A') AS rf
          |FROM lineitem
          |WHERE NOT (l_quantity > 45) AND l_returnflag <> 'A'
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ----- D1/D2: explode array → rows (analyze_links.py:120-123,
    // graph_filter.py:120-123). Empty arrays drop the row (inner explode).
    Q("d1_explode_links",
      (s, d) => Tables.videos(s, d)
        .select(col("id"), explode(col("related_ids")).as("related_id"))
        .orderBy("id", "related_id"),
      Some(Oracles.withVideos(
        """SELECT id, unnest(related_ids) AS related_id FROM videos
          |ORDER BY id, related_id""".stripMargin))),

    // ----- D3 [EXT]: posexplode (position-aware generator)
    Q("d3_posexplode",
      (s, d) => Tables.videos(s, d)
        .select(col("id"), posexplode(col("related_ids")).as(Seq("pos", "rid")))
        .orderBy("id", "pos"),
      Some(Oracles.withVideos(
        """SELECT id, CAST(generate_subscripts(related_ids, 1) - 1 AS INT) AS pos,
          |       unnest(related_ids) AS rid
          |FROM videos ORDER BY id, pos""".stripMargin))),

    // ----- E1 + F1 + B2 + H1: the analyze_links pipeline — explode related
    // ids, count in-links per target, inner-join engagement, sort.
    // (analyze_links.py:120-145). Inner join drops never-linked videos.
    Q("e1_links_join",
      (s, d) => {
        val v = Tables.videos(s, d)
        val linkCounts = v
          .select(explode(col("related_ids")).as("id"))
          .withColumn("link_count", lit(1))          // B2: lit column
          .groupBy("id")
          .agg(sum("link_count").as("sum_link_count"))
        val engagement = v.select("id", "views", "num_ratings",
          "num_comments", "age_days")
        linkCounts.join(engagement, Seq("id"), "inner")
          .orderBy(desc("sum_link_count"), col("id"))
      },
      Some(Oracles.withVideos(
        """, links AS (
          |  SELECT unnest(related_ids) AS id, 1 AS link_count FROM videos
          |), link_counts AS (
          |  SELECT id, CAST(sum(link_count) AS BIGINT) AS sum_link_count
          |  FROM links GROUP BY id
          |)
          |SELECT l.id, l.sum_link_count, v.views, v.num_ratings,
          |       v.num_comments, v.age_days
          |FROM link_counts l JOIN videos v USING (id)
          |ORDER BY sum_link_count DESC, id""".stripMargin))),

    // ----- E2 [EXT]: left outer join with genuine misses
    Q("e2_left_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d).filter(col("c_custkey") % 3 === 0)
          .select("c_custkey", "c_name", "c_mktsegment")
        o.join(c, o("o_custkey") === c("c_custkey"), "left")
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
            col("c_mktsegment"))
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_custkey, c_name, c_mktsegment
          |FROM orders LEFT JOIN
          |  (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
          |  ON o_custkey = c_custkey
          |ORDER BY o_orderkey""".stripMargin)),

    // ----- E3 [EXT]: left-semi join (EXISTS)
    Q("e3_semi_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
          .select(col("l_orderkey"))
        o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
          |ORDER BY o_orderkey""".stripMargin)),

    // ----- E4 [EXT]: left-anti join (NOT EXISTS)
    Q("e4_anti_join",
      (s, d) => {
        val o = Tables.orders(s, d)
        val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
          .select(col("l_orderkey"))
        o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti")
          .select("o_orderkey", "o_orderstatus")
          .orderBy("o_orderkey")
      },
      Some(
        """SELECT o_orderkey, o_orderstatus FROM orders
          |WHERE NOT EXISTS (SELECT 1 FROM lineitem
          |                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
          |ORDER BY o_orderkey""".stripMargin)),

    // ----- F1: group-by + sum, hash agg (analyze_links.py:126-131) in its
    // TPC-H-Q1 shape: partial + final HashAggregate, no extra exchange.
    Q("f1_groupby_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_price"),
          // avg as exact-decimal sum / count: a double avg's partial-
          // aggregation order differs per engine and partitioning
          round(sum(col("l_discount").cast("decimal(18,4)"))
            .cast("double") / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS sum_price,
          |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
          |    / count(*), 4) AS avg_disc,
          |  count(*) AS n
          |FROM lineitem GROUP BY l_returnflag, l_linestatus
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ----- F2 + F3 + C4: multi-agg with collection aggregates per group
    // (graph_filter.py:143-155). collect_* sorted for determinism; size()
    // post-aggs; filter on collection size. The collected lists are emitted
    // as ','-joined STRINGS: the driver's pandas comparator cannot hash
    // array-typed cells (VERDICT r2/r3), and a sorted join is
    // information-equivalent for the check.
    Q("f2_collect_agg",
      (s, d) => Tables.videos(s, d)
        .filter(col("age_days") < 50)
        .groupBy("category")
        .agg(
          array_sort(collect_list(col("id"))).as("ids_arr"),
          array_sort(collect_set(col("uploader"))).as("upl_arr"),
          round(avg("views"), 4).as("avg_views"))
        .filter(size(col("ids_arr")) > 1)
        .select(col("category"),
          array_join(col("ids_arr"), ",").as("ids"),
          array_join(col("upl_arr"), ",").as("uploaders"),
          col("avg_views"),
          size(col("ids_arr")).as("n_ids"),
          size(col("upl_arr")).as("n_uploaders"))
        .orderBy("category"),
      Some(Oracles.withVideos(
        """SELECT category,
          |  array_to_string(list_sort(list(id)), ',') AS ids,
          |  array_to_string(list_sort(list(DISTINCT uploader)), ',')
          |    AS uploaders,
          |  round(avg(views), 4) AS avg_views,
          |  CAST(len(list(id)) AS INT) AS n_ids,
          |  CAST(len(list(DISTINCT uploader)) AS INT) AS n_uploaders
          |FROM videos WHERE age_days < 50
          |GROUP BY category HAVING len(list(id)) > 1
          |ORDER BY category""".stripMargin))),

    // ----- F3: distinct counts (size(collect_set) ≡ count distinct)
    Q("f3_distinct_counts",
      (s, d) => Tables.videos(s, d)
        .groupBy("category")
        .agg(countDistinct(col("uploader")).as("n_uploaders"),
          count(lit(1)).as("n_videos"))
        .orderBy("category"),
      Some(Oracles.withVideos(
        """SELECT category, count(DISTINCT uploader) AS n_uploaders,
          |       count(*) AS n_videos
          |FROM videos GROUP BY category ORDER BY category""".stripMargin))),

    // ----- F6 + L4: duplicate-group detection (validate_data.py:74-83)
    Q("f6_dup_groups",
      (s, d) => Tables.videos(s, d)
        .groupBy("uploader")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy("uploader"),
      Some(Oracles.withVideos(
        """SELECT uploader, count(*) AS cnt FROM videos
          |GROUP BY uploader HAVING count(*) > 1
          |ORDER BY uploader""".stripMargin))),

    // ----- H1/H2: global sort desc by aggregate-derived expression
    Q("h1_sort_desc",
      (s, d) => Tables.videos(s, d)
        .select("id", "views", "num_ratings")
        .orderBy(desc("views"), col("id")),
      Some(Oracles.withVideos(
        """SELECT id, views, num_ratings FROM videos
          |ORDER BY views DESC, id""".stripMargin))),

    // ----- H2: sort by collection-size expression (graph_filter.py:156
    // orders cluster aggregates by size(collect_list(id)) desc). As in f2,
    // the member list ships as a ','-joined string for the driver compare.
    Q("h2_sort_by_size",
      (s, d) => Tables.videos(s, d)
        .groupBy("uploader")
        .agg(array_sort(collect_list(col("id"))).as("ids_arr"),
          round(avg("views"), 4).as("avg_views"))
        .select(col("uploader"),
          array_join(col("ids_arr"), ",").as("ids"),
          col("avg_views"),
          size(col("ids_arr")).as("n_ids"))
        .orderBy(desc("n_ids"), col("uploader")),
      Some(Oracles.withVideos(
        """SELECT uploader,
          |       array_to_string(list_sort(list(id)), ',') AS ids,
          |       round(avg(views), 4) AS avg_views,
          |       CAST(len(list(id)) AS INT) AS n_ids
          |FROM videos GROUP BY uploader
          |ORDER BY n_ids DESC, uploader""".stripMargin))),

    // ----- B4: withColumns(Map) — several derived columns in one call
    // (graph_filter.py:149-155 adds 3 size columns at once)
    Q("b4_withcolumns",
      (s, d) => Tables.videos(s, d)
        .select("id", "views", "rating", "age_days")
        .withColumns(Map(
          "views_k" -> round(col("views") / 1000.0, 4),
          "rating_pct" -> round(col("rating") * 20, 4),
          "age_years" -> round(col("age_days") / 365.25, 4)))
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id, views, rating, age_days,
          |  round(views / 1000.0, 4) AS views_k,
          |  round(rating * 20, 4) AS rating_pct,
          |  round(age_days / 365.25, 4) AS age_years
          |FROM videos ORDER BY id""".stripMargin))),

    // ----- B6: Spark DEFAULT aggregate column name kept in the output
    // schema — `sum(link_count)` — exactly as analyze_links.py:129
    // publishes it (the plot reads x="sum(link_count)", :47-69)
    Q("b6_default_agg_names",
      (s, d) => Tables.videos(s, d)
        .select(explode(col("related_ids")).as("id"))
        .withColumn("link_count", lit(1))
        .groupBy("id")
        .sum("link_count")
        .orderBy(desc("sum(link_count)"), col("id")),
      Some(Oracles.withVideos(
        """SELECT id,
          |  CAST(sum(link_count) AS BIGINT) AS "sum(link_count)"
          |FROM (SELECT unnest(related_ids) AS id, 1 AS link_count
          |      FROM videos) t
          |GROUP BY id ORDER BY "sum(link_count)" DESC, id""".stripMargin))),

    // ----- H3: top-N = orderBy.limit → TakeOrderedAndProject
    // (trending_predictor.py:200,300-314)
    Q("h3_topn",
      (s, d) => Tables.orders(s, d)
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin)),

    // ----- I2/I3/I4: when/otherwise chains, arm order matters
    // (trending_predictor.py:97-114): 4-arm length score + 2-arm bonus.
    Q("i3_when_chain",
      (s, d) => Tables.videos(s, d)
        .select(col("id"),
          when(col("length").between(120, 900), 1.0)
            .when(col("length") < 30, 0.3)
            .when(col("length") > 3600, 0.4)
            .otherwise(0.7).as("length_score"),
          when(col("age_days") > 710 &&
            ((col("num_ratings") + col("num_comments")) /
              (log1p(col("views")) + 1)) / 1000 > 0.01, 2)
            .otherwise(1.0).as("engagement_bonus"))
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id,
          |  CASE WHEN length BETWEEN 120 AND 900 THEN 1.0
          |       WHEN length < 30 THEN 0.3
          |       WHEN length > 3600 THEN 0.4
          |       ELSE 0.7 END AS length_score,
          |  CASE WHEN age_days > 710 AND
          |            ((num_ratings + num_comments) / (ln(1 + views) + 1))
          |              / 1000 > 0.01
          |       THEN 2 ELSE 1.0 END AS engagement_bonus
          |FROM videos ORDER BY id""".stripMargin))),

    // ----- I9: directory-name → date rule (mongo_loader.py:73-94):
    // 4-digit MMDD ⇒ year 2007; 6-digit YYMMDD ⇒ 2000+YY. Round-trips
    // dirnames synthesized from o_orderdate.
    Q("i9_date_parse",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 2 === 0,
            date_format(col("o_orderdate"), "MMdd"))
            .otherwise(date_format(col("o_orderdate"), "yyMMdd"))
            .as("dirname"))
        .withColumn("parsed_date",
          // string output: engine-neutral (DATE vs TIMESTAMP repr differs).
          // try_to_date: a 4-digit MMDD of 0229 maps to 2007-02-29, which
          // does not exist (2007 isn't a leap year) → NULL, not a crash.
          date_format(
            when(length(col("dirname")) === 4,
              try_to_date(concat(lit("07"), col("dirname")), "yyMMdd"))
              .otherwise(try_to_date(col("dirname"), "yyMMdd")),
            "yyyy-MM-dd"))
        .orderBy("o_orderkey"),
      Some(
        """WITH t AS (
          |  SELECT o_orderkey,
          |    CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%m%d')
          |         ELSE strftime(o_orderdate, '%y%m%d') END AS dirname
          |  FROM orders)
          |SELECT o_orderkey, dirname,
          |  -- year rule is 2000+YY (mongo_loader.py:85-90), NOT POSIX %y
          |  -- (which maps 69-99 to 19xx); 4-digit MMDD ⇒ year 2007
          |  strftime(CASE WHEN length(dirname) = 4
          |       THEN try_strptime('2007' || dirname, '%Y%m%d')
          |       ELSE try_strptime('20' || dirname, '%Y%m%d') END, '%Y-%m-%d')
          |    AS parsed_date
          |FROM t ORDER BY o_orderkey""".stripMargin)),

    // ----- I10: nested-JSON serialization (data_types.py:44-65 shape)
    Q("i10_to_json",
      (s, d) => Tables.videos(s, d)
        .select(col("id"),
          to_json(struct(col("id"), col("views"), col("rating")))
            .as("doc"))
        .orderBy("id"),
      Some(Oracles.withVideos(
        """SELECT id,
          |  '{"id":"' || id || '","views":' || views ||
          |  ',"rating":' || CAST(rating AS VARCHAR) || '}' AS doc
          |FROM videos ORDER BY id""".stripMargin))),

    // ----- I12 [EXT]: XML scalar functions (to_xml / from_xml, core in
    // Spark 4) — the nested-export/parse round trip i10 does for JSON.
    // The oracle checks the PARSED fields, not the XML text (element
    // order/whitespace are format details; losslessness is the
    // contract): every (views, rating) pair must survive serialize →
    // parse bit-for-bit, and the post-parse filter proves the parsed
    // values feed the plan, not the originals.
    Q("i12_xml_functions",
      (s, d) => {
        val parsed = Tables.videos(s, d)
          .select(col("id"),
            to_xml(struct(col("views"), col("rating"))).as("x"))
          .select(col("id"), from_xml(col("x"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "views BIGINT, rating DOUBLE")).as("p"))
        parsed
          .select(col("id"), col("p.views").as("views"),
            col("p.rating").as("rating"))
          .filter(col("views") % 3 === 0)
          .orderBy("id")
      },
      Some(Oracles.withVideos(
        """SELECT id, views, rating FROM videos
          |WHERE views % 3 = 0 ORDER BY id""".stripMargin))),

    // ----- L1: composite-key first-wins dedup (mongo_loader.py:57-61,
    // 175-226) — deterministic winner via row_number over the key.
    Q("l1_dedup_firstwins",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // full tie-break: the fixture has duplicate (orderkey, linenumber)
        // pairs at sf>=0.01, so "first" must be totally ordered
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"))
        Tables.lineitem(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
          .orderBy("l_orderkey")
      },
      Some(
        """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
          |FROM (SELECT *, row_number() OVER (
          |        PARTITION BY l_orderkey
          |        ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
          |      FROM lineitem)
          |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin)),

    // ----- L5 [EXT]: declarative constraint-validation report (the
    // deequ/great-expectations primitive a pipeline gates loads on):
    // referential integrity both ways (anti-joins), composite-key
    // uniqueness (the fixture REALLY violates it — duplicate
    // (orderkey, linenumber) pairs exist at sf >= 0.01, which is why l1
    // needs its full tie-break), and range checks. Each check is one
    // keyed anti-join or filter + count — map-side cheap, and the whole
    // report is a union of 1-row aggregates, so it costs one pass per
    // check at any scale.
    Q("l5_constraints",
      (s, d) => {
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        val c = Tables.customer(s, d)
        val row = (name: String, df: org.apache.spark.sql.DataFrame) =>
          df.agg(count(lit(1)).as("n_violations"))
            .select(lit(name).as("check_name"), col("n_violations"))
        row("1_lineitem_orphans",
            l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti"))
          .unionByName(row("2_order_cust_orphans",
            o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")))
          .unionByName(row("3_dup_line_keys",
            l.groupBy("l_orderkey", "l_linenumber")
              .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)))
          .unionByName(row("4_nonpositive_price",
            o.filter(col("o_totalprice") <= 0)))
          .unionByName(row("5_discount_range",
            l.filter(!col("l_discount").between(0, 1))))
          .orderBy("check_name")
      },
      Some(
        """SELECT '1_lineitem_orphans' AS check_name, count(*) AS n_violations
          |FROM lineitem l WHERE NOT EXISTS (
          |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
          |UNION ALL
          |SELECT '2_order_cust_orphans', count(*)
          |FROM orders o WHERE NOT EXISTS (
          |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
          |UNION ALL
          |SELECT '3_dup_line_keys', count(*) FROM (
          |  SELECT l_orderkey, l_linenumber FROM lineitem
          |  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
          |UNION ALL
          |SELECT '4_nonpositive_price', count(*)
          |FROM orders WHERE o_totalprice <= 0
          |UNION ALL
          |SELECT '5_discount_range', count(*)
          |FROM lineitem WHERE l_discount NOT BETWEEN 0 AND 1
          |ORDER BY check_name""".stripMargin)),
  )
}
