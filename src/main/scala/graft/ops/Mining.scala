package graft.ops

import graft.Tables
import graft.Ckpt.StageOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset monitoring & pattern mining — the feedback half of a
  * training-data pipeline. Producing a corpus (dedup / filter / mix,
  * SURVEY §2 [EXT]) is half the job; the other half is detecting when
  * the incoming distribution MOVES — a crawler source shifts domains, a
  * scraper starts returning errors, a feature's range drifts — and
  * mining the co-occurrence structure that drives sampling decisions.
  * Reference behavior spec: the `analyze_links.py`-era profile reports
  * (aggregate + rank surfaces); the statistics are the published forms
  * (PSI: Siddiqi 2006 credit-scorecard monitoring; two-sample
  * Kolmogorov–Smirnov; association rules: Agrawal et al., VLDB 1994).
  *
  * Cross-engine discipline (SURVEY §5): every decision boolean is
  * computed either in pure integers or from IEEE doubles produced by
  * the IDENTICAL expression tree on both engines (deterministic
  * left-associated multiplications of exact integers — no
  * engine-ordered float aggregation feeds a comparison). Transcendental
  * terms (`ln`) only ever feed `round(·, 4)` REPORT columns, the
  * m_entropy convention.
  */
object Mining {

  /** 2024-01-16 00:00:00 UTC in epoch micros — the fixture month's
    * midpoint, splitting `events` into a reference fortnight and a
    * current fortnight. Comparing `unix_micros(ts)` against an integer
    * literal sidesteps timestamp-literal timezone semantics entirely
    * (both engines see the same integral micros). */
  private val SplitUs = 1705363200000000L

  val all: Seq[Q] = Seq(

    // ----- Population Stability Index per event_type: the standard
    // production drift monitor. `value` is histogrammed into 10 fixed
    // 50-unit bins (floor-based — engine-exact), each (type, bin) cell
    // counted once per fortnight in ONE conditional-sum pass, and the
    // densified grid (type × bin, a broadcast-tiny cross join — bins
    // missing from BOTH periods still contribute under smoothing)
    // left-joins the cells. Laplace-smoothed shares p=(c+1)/(n+10)
    // keep PSI defined for empty cells with zero branching. Scale
    // shape: one shuffle on (type, bin, period) cells — cardinality
    // |types|×10×2 regardless of row count — then a |types|-row
    // rollup; the 100-TB cost is exactly one map-side-combined pass
    // over the fact table. `psi` is a round(·,4) report column
    // (m_entropy convention); `drifted` compares the rounded value to
    // 0.25 (exactly representable, industry "significant shift" bar).
    Q("m_psi_drift",
      (s, d) => {
        val e = Tables.events(s, d).select(
          col("event_type"),
          (unix_micros(col("ts")) >= lit(SplitUs)).as("cur"),
          least(floor(col("value") / 50.0), lit(9.0)).cast("int").as("bin"))
        val cells = e.groupBy("event_type", "bin")
          .agg(sum(when(!col("cur"), 1L).otherwise(0L)).as("c_ref"),
            sum(when(col("cur"), 1L).otherwise(0L)).as("c_cur"))
        val grid = e.select("event_type").distinct()
          .crossJoin(s.range(10).select(col("id").cast("int").as("bin")))
        // broadcast the RIGHT side: Spark cannot build the left side of
        // a left outer join (a broadcast(grid) hint here is silently
        // ignored and the join falls back to a shuffle). `cells` is the
        // naturally bounded side anyway — ≤ |types|×10×2 counters at
        // any data scale.
        val dens = grid.join(broadcast(cells), Seq("event_type", "bin"), "left")
          .na.fill(0L, Seq("c_ref", "c_cur"))
        val tot = dens.groupBy("event_type")
          .agg(sum("c_ref").as("n_ref"), sum("c_cur").as("n_cur"))
        dens.join(broadcast(tot), Seq("event_type"))
          .withColumn("p", (col("c_ref") + 1.0) / (col("n_ref") + 10.0))
          .withColumn("q", (col("c_cur") + 1.0) / (col("n_cur") + 10.0))
          .groupBy("event_type", "n_ref", "n_cur")
          .agg(round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 4)
            .as("psi"))
          .withColumn("drifted", col("psi") > 0.25)
          .select("event_type", "n_ref", "n_cur", "psi", "drifted")
          .orderBy("event_type")
      },
      Some(
        """WITH e AS (
          |  SELECT event_type,
          |    epoch_us(ts) >= 1705363200000000 AS cur,
          |    CAST(least(floor("value" / 50.0), 9.0) AS INT) AS bin
          |  FROM events
          |), cells AS (
          |  SELECT event_type, bin,
          |    CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT)
          |      AS c_ref,
          |    CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT)
          |      AS c_cur
          |  FROM e GROUP BY event_type, bin
          |), grid AS (
          |  SELECT t.event_type, b.bin
          |  FROM (SELECT DISTINCT event_type FROM e) t
          |  CROSS JOIN (SELECT CAST(range AS INT) AS bin
          |              FROM range(10)) b
          |), dens AS (
          |  SELECT g.event_type, g.bin,
          |    coalesce(c.c_ref, 0) AS c_ref,
          |    coalesce(c.c_cur, 0) AS c_cur
          |  FROM grid g LEFT JOIN cells c
          |    ON g.event_type = c.event_type AND g.bin = c.bin
          |), tot AS (
          |  SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
          |    CAST(sum(c_cur) AS BIGINT) AS n_cur
          |  FROM dens GROUP BY event_type
          |), terms AS (
          |  SELECT d.event_type, t.n_ref, t.n_cur,
          |    (d.c_ref + 1.0) / (t.n_ref + 10.0) AS p,
          |    (d.c_cur + 1.0) / (t.n_cur + 10.0) AS q
          |  FROM dens d JOIN tot t USING (event_type)
          |)
          |SELECT event_type, n_ref, n_cur,
          |  round(sum((p - q) * ln(p / q)), 4) AS psi,
          |  round(sum((p - q) * ln(p / q)), 4) > 0.25 AS drifted
          |FROM terms GROUP BY event_type, n_ref, n_cur
          |ORDER BY event_type""".stripMargin)),

    // ----- Chi-square homogeneity test of the event-type MIX across
    // the two fortnights — the categorical companion to m_psi_drift
    // (which bins a numeric column per type) and m_ks_drift (which
    // tests a continuous distribution): did the composition of traffic
    // itself shift? Expected cell counts e = row·col/n are exact
    // integer products divided once per cell (identical IEEE inputs on
    // both engines); only the χ² sum is float-order-sensitive and it
    // feeds round(·,4) report columns (the m_entropy convention), as
    // does Cramér's V = sqrt(χ²/n·min(r−1,c−1)) — IEEE sqrt is
    // correctly rounded, so it adds no engine variance. Scale shape:
    // ONE map-side-combined pass to |types|×2 cells; everything after
    // is arithmetic on a broadcast-sized table. Output is per-cell
    // (observed, expected-e4, contribution) plus the test capsule.
    Q("m_chi2_drift",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type"),
            when(unix_micros(col("ts")) >= lit(SplitUs), "cur")
              .otherwise("ref").as("period"))
          .groupBy("event_type", "period")
          .agg(count(lit(1)).as("o"))
        val rowT = cells.groupBy("event_type").agg(sum("o").as("r"))
        val colT = cells.groupBy("period").agg(sum("o").as("c"))
        val n1 = cells.agg(sum("o").as("n"))
        val e = cells.join(broadcast(rowT), Seq("event_type"))
          .join(broadcast(colT), Seq("period"))
          .crossJoin(broadcast(n1))
          .withColumn("exp", col("r") * col("c") / col("n"))
          .withColumn("contrib",
            (col("o") - col("exp")) * (col("o") - col("exp")) / col("exp"))
        val nTypes = cells.select("event_type").distinct()
          .agg(count(lit(1)).as("k"))
        val capsule = e.agg(sum(col("contrib")).as("chi2raw"),
            first(col("n")).as("nn"))
          .crossJoin(broadcast(nTypes))
          .select(round(col("chi2raw"), 4).as("chi2"),
            round(sqrt(col("chi2raw") / (col("nn") * (lit(1)))), 4)
              .as("cramers_v"))
        e.crossJoin(broadcast(capsule))
          .select(col("event_type"), col("period"), col("o"),
            floor(col("exp") * 10000.0).cast("long").as("exp_e4"),
            round(col("contrib"), 4).as("contrib"),
            col("chi2"), col("cramers_v"))
          .orderBy("event_type", "period")
      },
      Some(
        """WITH cells AS (
          |  SELECT event_type,
          |    CASE WHEN epoch_us(ts) >= 1705363200000000
          |         THEN 'cur' ELSE 'ref' END AS period,
          |    CAST(count(*) AS BIGINT) AS o
          |  FROM events GROUP BY 1, 2
          |), rt AS (
          |  SELECT event_type, CAST(sum(o) AS BIGINT) AS r
          |  FROM cells GROUP BY event_type
          |), ct AS (
          |  SELECT period, CAST(sum(o) AS BIGINT) AS c
          |  FROM cells GROUP BY period
          |), nt AS (
          |  SELECT CAST(sum(o) AS BIGINT) AS n FROM cells
          |), e AS (
          |  SELECT cells.event_type, cells.period, cells.o,
          |    rt.r * ct.c / nt.n AS exp,
          |    (cells.o - rt.r * ct.c / nt.n) *
          |      (cells.o - rt.r * ct.c / nt.n) /
          |      (rt.r * ct.c / nt.n) AS contrib,
          |    nt.n AS n
          |  FROM cells
          |  JOIN rt USING (event_type)
          |  JOIN ct USING (period)
          |  CROSS JOIN nt
          |), capsule AS (
          |  SELECT round(sum(contrib), 4) AS chi2,
          |    round(sqrt(sum(contrib) / (any_value(n) * 1)), 4)
          |      AS cramers_v
          |  FROM e
          |)
          |SELECT e.event_type, e.period, e.o,
          |  CAST(floor(e.exp * 10000.0) AS BIGINT) AS exp_e4,
          |  round(e.contrib, 4) AS contrib,
          |  c.chi2, c.cramers_v
          |FROM e CROSS JOIN capsule c
          |ORDER BY e.event_type, e.period""".stripMargin)),

    // ----- Two-sample Kolmogorov–Smirnov drift test per event_type,
    // computed EXACTLY in integers: with per-distinct-value counts
    // (c_a, c_b) and running totals (cum_a, cum_b), the KS statistic is
    // D = max|cum_a·n_b − cum_b·n_a| / (n_a·n_b) — the numerator is the
    // integer max this query takes, so D carries no float error at all.
    // The α=0.05 rejection c(α)=1.358 is squared into the exact decimal
    // 1.844164, and D² > c²(n_a+n_b)/(n_a·n_b) rearranges to
    // 1000000·d_num² > 1844164·(n_a+n_b)·n_a·n_b — evaluated in doubles
    // from exact integers via the identical left-associated expression
    // on both engines (products reach ~1e20, past BIGINT but
    // deterministic in IEEE doubles; no aggregation-order term exists).
    // Scale shape: the sort is PARTITIONED by event_type (the g2
    // single-partition-window trap does not apply); pre-grouping by
    // (type, value) bounds each window's row count by the number of
    // DISTINCT values, and everything after is a per-type rollup.
    Q("m_ks_drift",
      (s, d) => {
        val g = Tables.events(s, d).select(
            col("event_type"), col("value"),
            (unix_micros(col("ts")) >= lit(SplitUs)).as("cur"))
          .groupBy("event_type", "value")
          .agg(sum(when(!col("cur"), 1L).otherwise(0L)).as("c_a"),
            sum(when(col("cur"), 1L).otherwise(0L)).as("c_b"))
        val w = Window.partitionBy("event_type").orderBy("value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = g
          .withColumn("cum_a", sum("c_a").over(w))
          .withColumn("cum_b", sum("c_b").over(w))
        val tot = g.groupBy("event_type")
          .agg(sum("c_a").as("n_a"), sum("c_b").as("n_b"))
        cum.join(broadcast(tot), Seq("event_type"))
          .groupBy("event_type", "n_a", "n_b")
          .agg(max(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
            .as("d_num"))
          .select(col("event_type"), col("n_a"), col("n_b"), col("d_num"),
            floor(col("d_num") * 10000.0 / (col("n_a") * col("n_b")))
              .cast("long").as("ks_e4"),
            (lit(1000000.0) * col("d_num") * col("d_num") >
              lit(1844164.0) * (col("n_a") + col("n_b")) *
                col("n_a") * col("n_b")).as("rejected"))
          .orderBy("event_type")
      },
      Some(
        """WITH g AS (
          |  SELECT event_type, "value",
          |    CAST(sum(CASE WHEN epoch_us(ts) < 1705363200000000
          |         THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
          |    CAST(sum(CASE WHEN epoch_us(ts) >= 1705363200000000
          |         THEN 1 ELSE 0 END) AS BIGINT) AS c_b
          |  FROM events GROUP BY event_type, "value"
          |), cum AS (
          |  SELECT event_type, c_a, c_b,
          |    CAST(sum(c_a) OVER w AS BIGINT) AS cum_a,
          |    CAST(sum(c_b) OVER w AS BIGINT) AS cum_b
          |  FROM g
          |  WINDOW w AS (PARTITION BY event_type ORDER BY "value"
          |               ROWS BETWEEN UNBOUNDED PRECEDING
          |               AND CURRENT ROW)
          |), tot AS (
          |  SELECT event_type, CAST(sum(c_a) AS BIGINT) AS n_a,
          |    CAST(sum(c_b) AS BIGINT) AS n_b
          |  FROM g GROUP BY event_type
          |), dd AS (
          |  SELECT c.event_type, t.n_a, t.n_b,
          |    CAST(max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a))
          |      AS BIGINT) AS d_num
          |  FROM cum c JOIN tot t USING (event_type)
          |  GROUP BY c.event_type, t.n_a, t.n_b
          |)
          |SELECT event_type, n_a, n_b, d_num,
          |  CAST(floor(d_num * 10000.0 / (n_a * n_b)) AS BIGINT)
          |    AS ks_e4,
          |  1000000.0 * d_num * d_num >
          |    1844164.0 * (n_a + n_b) * n_a * n_b AS rejected
          |FROM dd ORDER BY event_type""".stripMargin)),

    // ----- Mann–Kendall trend test per event_type over the daily count
    // series — the nonparametric "is this metric trending?" monitor
    // (Mann 1945 / Kendall 1975; the standard alongside CUSUM's
    // change-POINT detection, w_cusum). Everything is EXACT integers:
    // S = Σ sign(c_j − c_i) over day pairs i<j; Var(S) with the tie
    // correction is V/18 where V = n(n−1)(2n+5) − Σ t(t−1)(2t+5); and
    // the 5%-level decision z² > 1.96² clears its denominators into
    // 180000·S² > 38416·V (1.96² = 38416/10⁴, the m_ab_test
    // discipline) — no sqrt, no float, no tie to flip. Scale shape:
    // the day series per key is BOUNDED by the monitoring window (30
    // points here), so the in-key pair self-join is O(W²) per key with
    // W fixed — co-partitioned on event_type, linear in keys; the only
    // full-data pass is the daily rollup, map-side combined. Day =
    // integral epoch-day (unix_micros div 10⁶ div 86400 — the
    // m_resample_daily engine-exact idiom).
    Q("m_trend_mk",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("(unix_micros(ts) div 1000000) div 86400").as("day"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("c"))
        val sTab = daily.select(col("event_type"), col("day"), col("c"))
          .join(daily.select(col("event_type"), col("day").as("day2"),
            col("c").as("c2")), Seq("event_type"))
          .filter(col("day") < col("day2"))
          .groupBy("event_type")
          .agg(sum(when(col("c2") > col("c"), 1L)
            .when(col("c2") < col("c"), -1L).otherwise(0L)).as("s"))
        val nTab = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"))
        val tieTab = daily.groupBy("event_type", "c")
          .agg(count(lit(1)).as("t"))
          .groupBy("event_type")
          .agg(sum(col("t") * (col("t") - 1L) * (col("t") * 2L + 5L))
            .as("tie18"))
        sTab.join(nTab, Seq("event_type"))
          .join(tieTab, Seq("event_type"))
          .withColumn("v18",
            col("n_days") * (col("n_days") - 1L) *
              (col("n_days") * 2L + 5L) - col("tie18"))
          .select(col("event_type"), col("n_days"), col("s"), col("v18"),
            when(lit(180000L) * col("s") * col("s") <=
                lit(38416L) * col("v18"), "none")
              .when(col("s") > 0L, "up").otherwise("down").as("trend"))
          .orderBy("event_type")
      },
      Some(
        """WITH daily AS (
          |  SELECT event_type,
          |    (epoch_us(ts) // 1000000) // 86400 AS day,
          |    CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, day
          |), st AS (
          |  SELECT a.event_type,
          |    CAST(sum(CASE WHEN b.c > a.c THEN 1
          |             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
          |      AS s
          |  FROM daily a JOIN daily b
          |    ON a.event_type = b.event_type AND a.day < b.day
          |  GROUP BY a.event_type
          |), nt AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
          |  FROM daily GROUP BY event_type
          |), ties AS (
          |  SELECT event_type,
          |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
          |  FROM (SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
          |        FROM daily GROUP BY event_type, c)
          |  GROUP BY event_type
          |), w AS (
          |  SELECT st.event_type, nt.n_days, st.s,
          |    nt.n_days * (nt.n_days - 1) * (2 * nt.n_days + 5)
          |      - ties.tie18 AS v18
          |  FROM st JOIN nt USING (event_type)
          |  JOIN ties USING (event_type)
          |)
          |SELECT event_type, n_days, s, v18,
          |  CASE WHEN 180000 * s * s <= 38416 * v18 THEN 'none'
          |       WHEN s > 0 THEN 'up' ELSE 'down' END AS trend
          |FROM w ORDER BY event_type""".stripMargin)),

    // ----- Source-pair vocabulary overlap — "which crawl sources are
    // near-copies of each other?" at the SOURCE level (document-level
    // near-dup is the m_minhash_dedup family; this is the roll-up a
    // curation team reads first, because dropping one redundant SOURCE
    // is cheaper than deduping its documents one by one). Exact
    // Jaccard over per-source BIGRAM-shingle vocabularies via an
    // inverted-index self-join ON SHINGLE (the t_containment postings
    // pattern): the pair expansion per shingle is bounded by
    // |sources| — the shingle vocab, not documents, is what joins,
    // and |sources|² output pairs are a capsule at any corpus size.
    // Bigrams, not unigrams, on purpose: the fixture's sources share
    // ONE unigram vocabulary (every pair Jaccard 1.0 — vacuous, the
    // m_funnel unbounded-window lesson), while word-order shingles
    // spread pairs across 0.61–0.68. Distinct (source, shingle) is
    // the only full-data pass, map-side combined. Floor-scaled
    // Jaccard from exact integer intersection/union counts.
    Q("t_source_overlap",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(col("source"), split(col("text"), " ").as("toks"))
          .select(col("source"),
            explode(transform(sequence(lit(1), size(col("toks")) - 1),
              i => concat_ws(" ",
                element_at(col("toks"), i),
                element_at(col("toks"), i + 1)))).as("tok"))
          .distinct()
        val sizes = vocab.groupBy("source").agg(count(lit(1)).as("sz"))
        val inter = vocab
          .join(vocab.select(col("source").as("source_b"),
            col("tok")), Seq("tok"))
          .filter(col("source") < col("source_b"))
          .groupBy(col("source").as("src_a"), col("source_b").as("src_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(broadcast(sizes.select(col("source").as("src_a"),
            col("sz").as("sz_a"))), Seq("src_a"))
          .join(broadcast(sizes.select(col("source").as("src_b"),
            col("sz").as("sz_b"))), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("inter"),
            col("sz_a"), col("sz_b"),
            floor(col("inter") * 10000.0 /
              (col("sz_a") + col("sz_b") - col("inter"))).cast("long")
              .as("jaccard_e4"))
          .orderBy("src_a", "src_b")
      },
      Some(
        """WITH toks AS (
          |  SELECT source, string_split(text, ' ') AS ts FROM documents
          |), pos AS (
          |  SELECT source, ts, unnest(range(1, len(ts))) AS i FROM toks
          |), vocab AS (
          |  SELECT DISTINCT source, ts[i] || ' ' || ts[i+1] AS tok
          |  FROM pos
          |), sizes AS (
          |  SELECT source, CAST(count(*) AS BIGINT) AS sz
          |  FROM vocab GROUP BY source
          |), inter AS (
          |  SELECT a.source AS src_a, b.source AS src_b,
          |    CAST(count(*) AS BIGINT) AS inter
          |  FROM vocab a JOIN vocab b ON a.tok = b.tok
          |  WHERE a.source < b.source
          |  GROUP BY a.source, b.source
          |)
          |SELECT i.src_a, i.src_b, i.inter, sa.sz AS sz_a,
          |  sb.sz AS sz_b,
          |  CAST(floor(i.inter * 10000.0 /
          |       (sa.sz + sb.sz - i.inter)) AS BIGINT) AS jaccard_e4
          |FROM inter i
          |JOIN sizes sa ON i.src_a = sa.source
          |JOIN sizes sb ON i.src_b = sb.source
          |ORDER BY i.src_a, i.src_b""".stripMargin)),

    // ----- k-anonymity / l-diversity release gate (Sweeney 2002;
    // Machanavajjhala 2007) — the privacy audit a dataset passes
    // BEFORE being published or joined into training data: group rows
    // into equivalence classes by their quasi-identifiers (nation ×
    // 1000-unit balance band — floor-based, engine-exact), and a class
    // re-identifies people if it is small (< k) or its sensitive
    // attribute barely varies (< l distinct market segments). One
    // map-side-combined pass to classes; the distinct-sensitive count
    // rides the same shuffle key (groupBy QI carries the segment for
    // countDistinct — exactly how it must partition at scale; class
    // cardinality is |QI-space|, a capsule). All-integer outputs and
    // flags — nothing can tie-flip. The violating classes are the
    // actionable rows; full per-class output keeps the oracle total.
    Q("m_kanon",
      (s, d) => {
        Tables.customer(s, d)
          .select(col("c_nationkey"),
            floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"),
            col("c_mktsegment"))
          .groupBy("c_nationkey", "bal_band")
          .agg(count(lit(1)).as("class_size"),
            countDistinct(col("c_mktsegment")).as("n_sensitive"))
          .select(col("c_nationkey"), col("bal_band"), col("class_size"),
            col("n_sensitive"),
            (col("class_size") < 10L).as("violates_k10"),
            (col("n_sensitive") < 3L).as("violates_l3"))
          .orderBy("c_nationkey", "bal_band")
      },
      Some(
        """SELECT c_nationkey,
          |  CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          |  CAST(count(*) AS BIGINT) AS class_size,
          |  CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
          |  count(*) < 10 AS violates_k10,
          |  count(DISTINCT c_mktsegment) < 3 AS violates_l3
          |FROM customer
          |GROUP BY c_nationkey, bal_band
          |ORDER BY c_nationkey, bal_band""".stripMargin)),

    // ----- Differentially-private released counts (Dwork 2006 Laplace
    // mechanism) — the third privacy surface next to m_kanon's class
    // audit and m_redact's suppression: per-type event counts released
    // with Laplace(1/ε) noise at ε=1, sensitivity 1 (one event moves
    // one count by one). The inverse-CDF draw u→−sign(u−½)·b·ln(1−2|u−½|)
    // is seeded from a HASH of the group key instead of a CSPRNG —
    // deterministic on purpose so the release is oracle-checkable and
    // reproducible in tests; a production release swaps exactly that
    // one `u` expression for a secure draw, keeping the sensitivity
    // accounting, the mechanism, and the post-processing floor (floor
    // is DP-safe: post-processing) untouched. Scale shape: one
    // map-side-combined count; the noise is a per-group scalar
    // expression — zero extra passes, zero state.
    Q("m_dp_counts",
      (s, d) => {
        val b = 1.0 // Laplace scale = sensitivity / epsilon = 1 / 1
        val g = Tables.events(s, d)
          .groupBy("event_type").agg(count(lit(1)).as("n_true"))
        val u = (conv(substring(md5(concat(lit("dp1_"),
          col("event_type"))), 1, 6), 16, 10).cast("long") + 0.5) /
          16777216.0
        val x = u - 0.5
        val lap = -signum(x) * log(lit(1.0) - abs(x) * 2.0) * b
        g.select(col("event_type"), col("n_true"),
            floor((col("n_true") + lap) * 10000.0).cast("long")
              .as("released_e4"),
            lit(1.0).as("epsilon"), lit(1L).as("sensitivity"))
          .orderBy("event_type")
      },
      Some(
        """WITH g AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
          |  FROM events GROUP BY event_type
          |), noise AS (
          |  SELECT event_type, n_true,
          |    (CAST(('0x' || substr(md5('dp1_' || event_type), 1, 6))
          |        AS BIGINT) + 0.5) / 16777216.0 - 0.5 AS x
          |  FROM g
          |)
          |SELECT event_type, n_true,
          |  CAST(floor((n_true +
          |    -sign(x) * ln(1.0 - abs(x) * 2.0) * 1.0) * 10000.0)
          |    AS BIGINT) AS released_e4,
          |  CAST(1.0 AS DOUBLE) AS epsilon,
          |  CAST(1 AS BIGINT) AS sensitivity
          |FROM noise ORDER BY event_type""".stripMargin)),

    // ----- First-order Markov transition matrix over per-user event
    // streams — the behavioral sequence model under m_event_paths'
    // trigram mining: P(next | current) with exact counts and
    // floor-scaled basis-point probabilities (integer inputs, one
    // identical IEEE division, floor — the m_ab_test diff_bp
    // discipline). The lag pairing is a lead() window PARTITIONED by
    // user (per-key state, never a global sort — each user's stream
    // sorts independently at any scale, the same shape Structured
    // Streaming's sessionizer keys by), ordered by (ts, event_id) so
    // same-micro ties can't flip pairs between engines. The matrix
    // itself is |types|² rows — a broadcast-sized artifact distilled
    // from the full pass, like every other capsule in this module.
    Q("m_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            col("event_type").as("s1"), unix_micros(col("ts")).as("us"))
          .withColumn("s2", lead(col("s1"), 1).over(w))
          .filter(col("s2").isNotNull)
          .groupBy("s1", "s2")
          .agg(count(lit(1)).as("n"))
        val rowT = pairs.groupBy("s1").agg(sum("n").as("row_total"))
        pairs.join(broadcast(rowT), Seq("s1"))
          .select(col("s1"), col("s2"), col("n"), col("row_total"),
            floor(col("n") * 10000.0 / col("row_total")).cast("long")
              .as("p_bp"))
          .orderBy("s1", "s2")
      },
      Some(
        """WITH o AS (
          |  SELECT user_id, event_type AS s1,
          |    lead(event_type, 1) OVER (PARTITION BY user_id
          |      ORDER BY epoch_us(ts), event_id) AS s2
          |  FROM events
          |), pairs AS (
          |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS n
          |  FROM o WHERE s2 IS NOT NULL GROUP BY s1, s2
          |), rt AS (
          |  SELECT s1, CAST(sum(n) AS BIGINT) AS row_total
          |  FROM pairs GROUP BY s1
          |)
          |SELECT p.s1, p.s2, p.n, rt.row_total,
          |  CAST(floor(p.n * 10000.0 / rt.row_total) AS BIGINT) AS p_bp
          |FROM pairs p JOIN rt USING (s1)
          |ORDER BY p.s1, p.s2""".stripMargin)),

    // ----- Benford first-digit profile of order totals — the
    // fabricated-data / broken-upstream detector (Benford 1938;
    // Nigrini's forensic-accounting standard): organically generated
    // magnitudes follow P(d) = log10(1+1/d), and a synthetic uniform
    // generator (this fixture) visibly does NOT — the profile is the
    // point, flagging which digits deviate. Determinism: the leading
    // digit comes from floor → BIGINT → string → substr (log10-free —
    // a float log10 near a power of 10 could flip the digit; string
    // truncation cannot); the Benford probabilities are 17-digit
    // decimal LITERALS parsed to identical doubles by both engines;
    // expected counts are floor-scaled per-row products (no float
    // aggregation feeds them); only the χ² report column sums doubles,
    // under round(·,4) (the m_entropy convention). Scale shape: one
    // map-side-combined digit count (9 groups), a broadcast 9-row
    // probability table, a 1-row total capsule — the full pass over
    // the fact table is the only data-sized cost.
    Q("m_benford",
      (s, d) => {
        import s.implicits._
        val probs = Seq(
          (1, 0.30102999566398120), (2, 0.17609125905568124),
          (3, 0.12493873660829993), (4, 0.09691001300805642),
          (5, 0.07918124604762482), (6, 0.06694678963061322),
          (7, 0.05799194697768673), (8, 0.05115252244738129),
          (9, 0.04575749056067514)).toDF("digit", "p")
        val obs = Tables.orders(s, d)
          .filter(col("o_totalprice") >= 1.0)
          .select(substring(floor(col("o_totalprice")).cast("long")
            .cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("obs"))
        val dens = probs.join(obs, Seq("digit"), "left")
          .na.fill(0L, Seq("obs"))
        val tot = dens.agg(sum(col("obs")).as("n"))
        val scored = dens.crossJoin(broadcast(tot))
          .withColumn("exp_n", col("n") * col("p"))
        val chi2 = scored
          .agg(round(sum((col("obs") - col("exp_n")) *
            (col("obs") - col("exp_n")) / col("exp_n")), 4).as("chi2"))
        scored.crossJoin(broadcast(chi2))
          .select(col("digit"), col("obs"), col("n"),
            floor(col("exp_n") * 10000.0).cast("long").as("exp_e4"),
            col("chi2"))
          .orderBy("digit")
      },
      Some(
        """WITH probs AS (
          |  -- e-notation parses as DOUBLE on both engines; a plain
          |  -- decimal literal would be DECIMAL(18,17) in DuckDB and
          |  -- its conversion could differ in the last ulp
          |  SELECT * FROM (VALUES
          |    (1, 3.0102999566398120e-1), (2, 1.7609125905568124e-1),
          |    (3, 1.2493873660829993e-1), (4, 9.691001300805642e-2),
          |    (5, 7.918124604762482e-2), (6, 6.694678963061322e-2),
          |    (7, 5.799194697768673e-2), (8, 5.115252244738129e-2),
          |    (9, 4.575749056067514e-2)) AS t(digit, p)
          |), obs AS (
          |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
          |           AS VARCHAR), 1, 1) AS INT) AS digit,
          |    CAST(count(*) AS BIGINT) AS obs
          |  FROM orders WHERE o_totalprice >= 1.0
          |  GROUP BY 1
          |), dens AS (
          |  SELECT p.digit, CAST(p.p AS DOUBLE) AS p,
          |    coalesce(o.obs, 0) AS obs
          |  FROM probs p LEFT JOIN obs o ON p.digit = o.digit
          |), tot AS (
          |  SELECT CAST(sum(obs) AS BIGINT) AS n FROM dens
          |), scored AS (
          |  SELECT d.digit, d.obs, t.n, d.p, t.n * d.p AS exp_n
          |  FROM dens d CROSS JOIN tot t
          |), c2 AS (
          |  SELECT round(sum((obs - exp_n) * (obs - exp_n) / exp_n), 4)
          |    AS chi2
          |  FROM scored
          |)
          |SELECT s.digit, s.obs, s.n,
          |  CAST(floor(s.exp_n * 10000.0) AS BIGINT) AS exp_e4,
          |  c2.chi2
          |FROM scored s CROSS JOIN c2
          |ORDER BY s.digit""".stripMargin)),

    // ----- Winsorized robust mean via SCALABLE exact quantiles — the
    // third quantile strategy in the engine, and the one that survives
    // 100 TB: `m_percentiles` buffers every group value (exact, OOM at
    // scale), `m_percentiles_approx` keeps a sketch (bounded,
    // approximate); this computes EXACT nearest-rank P5/P95 from the
    // value-frequency table + running counts (the m_gini/m_ks_drift
    // compression trick) — state bounded by DISTINCT values per group,
    // one keyed shuffle, no per-group buffering, no sketch error. Rank
    // cutoffs are pure integers (ceil(n/20) = (n+19) div 20 — never
    // 0.05·n in floats, whose representation error can cross an
    // integer), the threshold is the least value whose cumulative
    // count reaches the rank (engine-independent — no interpolation),
    // and the clipped mean sums in DECIMAL cents with one identical
    // floor-scaled division at the end. Winsorization itself is the
    // robust-statistics standard for taming heavy-tailed metrics
    // before averaging (Tukey; the outlier-resistant twin of
    // w_anomaly's detection).
    Q("m_winsorize",
      (s, d) => {
        // staged: li feeds both the frequency table and the final
        // clipped-mean pass; freq feeds the cum window and the
        // per-flag totals — each duplicate subtree re-ran its full
        // shuffle before the cut (the m_copurchase plan audit)
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_extendedprice").as("v"))
          .stageCkpt()
        val freq = li.groupBy("l_returnflag", "v")
          .agg(count(lit(1)).as("t"))
          .stageCkpt()
        val w = Window.partitionBy("l_returnflag").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = freq.withColumn("cum", sum("t").over(w))
        val nTab = freq.groupBy("l_returnflag").agg(sum("t").as("n"))
        // both rank cutoffs in ONE aggregation over the windowed
        // frequency table (min over a conditional = filter+min, and
        // nulls are skipped), so the freq→cum subtree is evaluated
        // once and the thresholds travel as a single broadcast table
        // instead of two lo/hi tables joined twice each
        val thr = cum.join(broadcast(nTab), Seq("l_returnflag"))
          .groupBy("l_returnflag")
          .agg(min(when(col("cum") >= expr("(n + 19) div 20"),
                 col("v"))).as("lo"),
               min(when(col("cum") >= expr("(n * 19 + 19) div 20"),
                 col("v"))).as("hi"))
        li.join(broadcast(thr), Seq("l_returnflag"))
          .select(col("l_returnflag"),
            least(greatest(col("v"), col("lo")), col("hi"))
              .cast("decimal(18,2)").as("clipped"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(col("clipped")).cast("double").as("wsum"))
          .join(broadcast(thr), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n"), col("lo"), col("hi"),
            col("wsum"),
            floor(col("wsum") * 10000.0 / col("n")).cast("long")
              .as("wmean_e4"))
          .orderBy("l_returnflag")
      },
      Some(
        """WITH li AS (
          |  SELECT l_returnflag, l_extendedprice AS v FROM lineitem
          |), freq AS (
          |  SELECT l_returnflag, v, CAST(count(*) AS BIGINT) AS t
          |  FROM li GROUP BY l_returnflag, v
          |), cum AS (
          |  SELECT l_returnflag, v, t,
          |    CAST(sum(t) OVER (PARTITION BY l_returnflag ORDER BY v
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum
          |  FROM freq
          |), nt AS (
          |  SELECT l_returnflag, CAST(sum(t) AS BIGINT) AS n
          |  FROM freq GROUP BY l_returnflag
          |), lo AS (
          |  SELECT c.l_returnflag, min(c.v) AS lo
          |  FROM cum c JOIN nt USING (l_returnflag)
          |  WHERE c.cum >= (nt.n + 19) // 20
          |  GROUP BY c.l_returnflag
          |), hi AS (
          |  SELECT c.l_returnflag, min(c.v) AS hi
          |  FROM cum c JOIN nt USING (l_returnflag)
          |  WHERE c.cum >= (nt.n * 19 + 19) // 20
          |  GROUP BY c.l_returnflag
          |), clipped AS (
          |  SELECT li.l_returnflag,
          |    CAST(least(greatest(li.v, lo.lo), hi.hi)
          |      AS DECIMAL(18,2)) AS cv
          |  FROM li JOIN lo USING (l_returnflag)
          |  JOIN hi USING (l_returnflag)
          |), agg AS (
          |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(cv) AS DOUBLE) AS wsum
          |  FROM clipped GROUP BY l_returnflag
          |)
          |SELECT a.l_returnflag, a.n, lo.lo, hi.hi, a.wsum,
          |  CAST(floor(a.wsum * 10000.0 / a.n) AS BIGINT) AS wmean_e4
          |FROM agg a JOIN lo USING (l_returnflag)
          |JOIN hi USING (l_returnflag)
          |ORDER BY a.l_returnflag""".stripMargin)),

    // ----- Gini concentration of per-key activity — the corpus-
    // curation "is one source dominating?" metric (a mix dominated by
    // a few users/domains is exactly what m_sample_temperature exists
    // to flatten; this query MEASURES the skew those rebalancers act
    // on). Exact-integer trick: Gini needs rank-weighted sums over the
    // SORTED per-user counts, but ranking users is the g2 single-
    // partition-window trap at scale — so the sort runs over the
    // COMPRESSED frequency table instead: group users by their count c
    // (t users share it), and a run of t equal values starting after
    // cum−t predecessors contributes c·t·(2·cum − t + 1) to twice the
    // rank-weighted sum (equal values make rank order within the run
    // irrelevant — the sum is tie-invariant, hence deterministic). The
    // window's row count is the number of DISTINCT activity levels
    // (dozens), not users (millions). G = (2Σi·x − (n+1)Σx)/(n·Σx)
    // floor-scaled to e4 from exact integers.
    Q("m_gini",
      (s, d) => {
        val ua = Tables.events(s, d)
          .groupBy("event_type", "user_id")
          .agg(count(lit(1)).as("c"))
        val freq = ua.groupBy("event_type", "c")
          .agg(count(lit(1)).as("t"))
        val w = Window.partitionBy("event_type").orderBy("c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val runs = freq.withColumn("cum", sum("t").over(w))
        runs.groupBy("event_type")
          .agg(sum(col("t")).as("n_users"),
            sum(col("c") * col("t")).as("total"),
            sum(col("c") * col("t") *
              (col("cum") * 2L - col("t") + 1L)).as("two_sw"))
          .select(col("event_type"), col("n_users"), col("total"),
            floor((col("two_sw") - (col("n_users") + 1L) * col("total")) *
              10000.0 / (col("n_users") * col("total"))).cast("long")
              .as("gini_e4"))
          .orderBy("event_type")
      },
      Some(
        """WITH ua AS (
          |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
          |  FROM events GROUP BY event_type, user_id
          |), freq AS (
          |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS t
          |  FROM ua GROUP BY event_type, c
          |), runs AS (
          |  SELECT event_type, c, t,
          |    CAST(sum(t) OVER (PARTITION BY event_type ORDER BY c
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum
          |  FROM freq
          |), agg AS (
          |  SELECT event_type,
          |    CAST(sum(t) AS BIGINT) AS n_users,
          |    CAST(sum(c * t) AS BIGINT) AS total,
          |    CAST(sum(c * t * (cum * 2 - t + 1)) AS BIGINT) AS two_sw
          |  FROM runs GROUP BY event_type
          |)
          |SELECT event_type, n_users, total,
          |  CAST(floor((two_sw - (n_users + 1) * total) * 10000.0 /
          |       (n_users * total)) AS BIGINT) AS gini_e4
          |FROM agg ORDER BY event_type""".stripMargin)),

    // ----- Association rules over user behavior baskets (Agrawal's
    // market-basket shape on the events fixture): an "item" is an
    // event_type a user has triggered with value > 200 (the m_ab_test
    // conversion bar — 14–25% base rates keep supports discriminative;
    // raw has-any-type saturates at 100% and every rule degenerates).
    // Plan: distinct (user, item) → self-join ON user_id (both frames
    // hash-partition on the SAME key, so the pair expansion is
    // co-partitioned and map-local) → pair-count shuffle whose key
    // cardinality is |vocab|², independent of user count → two
    // broadcast joins against the |vocab|-row support table and the
    // 1-row user-count capsule. Per-user expansion is bounded by
    // |vocab|² — at 100 TB the only growing cost is the distinct, a
    // map-side-combinable aggregation. Confidence and lift are
    // floor-scaled integers from exact integer inputs (identical IEEE
    // division both engines — the m_ab_test diff_bp discipline);
    // support floor 5 keeps the rule set stable under fixture noise.
    Q("m_assoc_rules",
      (s, d) => {
        val e = Tables.events(s, d)
        val items = e.filter(col("value") > 200.0)
          .select(col("user_id"), col("event_type").as("item")).distinct()
        val nUsers = e.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"))
        val supp = items.groupBy("item").agg(count(lit(1)).as("s"))
        val pairs = items.as("a")
          .join(items.withColumnRenamed("item", "cons").as("b"), Seq("user_id"))
          .filter(col("item") =!= col("cons"))
          .groupBy(col("item").as("ante"), col("cons"))
          .agg(count(lit(1)).as("supp_xy"))
        pairs.filter(col("supp_xy") >= 5L)
          .join(broadcast(supp.withColumnRenamed("item", "ante")
            .withColumnRenamed("s", "supp_x")), Seq("ante"))
          .join(broadcast(supp.withColumnRenamed("item", "cons")
            .withColumnRenamed("s", "supp_y")), Seq("cons"))
          .crossJoin(broadcast(nUsers))
          .select(col("ante"), col("cons"), col("supp_xy"),
            col("supp_x"), col("supp_y"), col("n_users"),
            floor(col("supp_xy") * 10000.0 / col("supp_x")).cast("long")
              .as("conf_bp"),
            floor(col("supp_xy") * col("n_users") * 10000.0 /
              (col("supp_x") * col("supp_y"))).cast("long").as("lift_e4"))
          .orderBy("ante", "cons")
      },
      Some(
        """WITH items AS (
          |  SELECT DISTINCT user_id, event_type AS item
          |  FROM events WHERE "value" > 200.0
          |), nu AS (
          |  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          |  FROM events
          |), supp AS (
          |  SELECT item, CAST(count(*) AS BIGINT) AS s
          |  FROM items GROUP BY item
          |), pairs AS (
          |  SELECT a.item AS ante, b.item AS cons,
          |    CAST(count(*) AS BIGINT) AS supp_xy
          |  FROM items a JOIN items b ON a.user_id = b.user_id
          |  WHERE a.item <> b.item
          |  GROUP BY a.item, b.item
          |)
          |SELECT p.ante, p.cons, p.supp_xy,
          |  sx.s AS supp_x, sy.s AS supp_y, nu.n_users,
          |  CAST(floor(p.supp_xy * 10000.0 / sx.s) AS BIGINT)
          |    AS conf_bp,
          |  CAST(floor(p.supp_xy * nu.n_users * 10000.0 /
          |       (sx.s * sy.s)) AS BIGINT) AS lift_e4
          |FROM pairs p
          |JOIN supp sx ON p.ante = sx.item
          |JOIN supp sy ON p.cons = sy.item
          |CROSS JOIN nu
          |WHERE p.supp_xy >= 5
          |ORDER BY p.ante, p.cons""".stripMargin)),

    // ----- Theil–Sen robust trend slope (Theil 1950 / Sen 1968) — the
    // estimator production monitoring uses when m_trend_mk says "a
    // trend exists" and you need its MAGNITUDE without outlier days
    // dragging a least-squares fit (one scraper-outage day ruins OLS;
    // the median of pairwise slopes shrugs it off). Per event type:
    // collapse events to a DAILY series first (day index = integer
    // datediff from the fixture epoch; daily revenue = sum of
    // floor-cents — integers, so the aggregation order is irrelevant),
    // THEN expand day pairs and take the lower-median slope by
    // nearest-rank selection over the slope-frequency table (the
    // m_winsorize machinery — no interpolation, the median IS one of
    // the computed slopes). Scale shape: the quadratic pair expansion
    // is over DISTINCT DAYS, not events — bounded by the calendar
    // (30 days → 435 pairs per type at every SF; a year → 66k), while
    // the daily rollup stays one map-side-combinable keyed shuffle
    // over the raw events. Slopes are single IEEE divisions of exact
    // integers — bit-identical cross-engine; no float sums anywhere.
    Q("m_theil_sen",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
            floor(col("value") * 100.0).cast("long").as("cents"))
          .groupBy("event_type", "day")
          .agg(sum("cents").as("r"))
          // staged: three consumers (both slope-pair sides + the
          // per-type day count) re-ran the event scan+agg each
          .stageCkpt()
        val slopes = daily.as("a")
          .join(daily.select(col("event_type"),
            col("day").as("day2"), col("r").as("r2")).as("b"),
            Seq("event_type"))
          .filter(col("day") < col("day2"))
          .select(col("event_type"),
            ((col("r2") - col("r")).cast("double") /
              (col("day2") - col("day"))).as("slope"))
        val freq = slopes.groupBy("event_type", "slope")
          .agg(count(lit(1)).as("t"))
          // staged: the cum window and the pair totals each re-ran
          // the quadratic slope-pair expansion before the cut
          .stageCkpt()
        val w = Window.partitionBy("event_type").orderBy("slope")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = freq.withColumn("cum", sum("t").over(w))
        val nTab = freq.groupBy("event_type")
          .agg(sum("t").as("n_pairs"))
        val nDays = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"))
        cum.join(broadcast(nTab), Seq("event_type"))
          .filter(col("cum") >= expr("(n_pairs + 1) div 2"))
          .groupBy("event_type")
          .agg(min("slope").as("slope_med"))
          .join(broadcast(nTab), Seq("event_type"))
          .join(broadcast(nDays), Seq("event_type"))
          .select(col("event_type"), col("n_days"), col("n_pairs"),
            col("slope_med"))
          .orderBy("event_type")
      },
      Some(
        """WITH daily AS (
          |  SELECT event_type,
          |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
          |      AS day,
          |    CAST(sum(CAST(floor("value" * 100.0) AS BIGINT))
          |      AS BIGINT) AS r
          |  FROM events GROUP BY 1, 2
          |), slopes AS (
          |  SELECT a.event_type,
          |    CAST(b.r - a.r AS DOUBLE) / (b.day - a.day) AS slope
          |  FROM daily a
          |  JOIN daily b ON a.event_type = b.event_type
          |    AND a.day < b.day
          |), freq AS (
          |  SELECT event_type, slope, CAST(count(*) AS BIGINT) AS t
          |  FROM slopes GROUP BY 1, 2
          |), cum AS (
          |  SELECT event_type, slope, t,
          |    CAST(sum(t) OVER (PARTITION BY event_type ORDER BY slope
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum
          |  FROM freq
          |), nt AS (
          |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n_pairs
          |  FROM freq GROUP BY 1
          |), nd AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
          |  FROM daily GROUP BY 1
          |), med AS (
          |  SELECT c.event_type, min(c.slope) AS slope_med
          |  FROM cum c JOIN nt USING (event_type)
          |  WHERE c.cum >= (nt.n_pairs + 1) // 2
          |  GROUP BY c.event_type
          |)
          |SELECT m.event_type, nd.n_days, nt.n_pairs, m.slope_med
          |FROM med m JOIN nt USING (event_type)
          |JOIN nd USING (event_type)
          |ORDER BY m.event_type""".stripMargin)),

    // ----- Tukey-fence outlier profile (Tukey 1977's box-plot rule) —
    // the per-metric data-quality gate a pipeline runs BEFORE m_dp_counts
    // or m_ab_test consume a column: how heavy are the tails, per
    // event type? Exact nearest-rank Q1/Q3 come from the value-
    // frequency table + running counts (the m_winsorize strategy —
    // state bounded by DISTINCT cent values, never a per-group buffer),
    // and the 1.5·IQR fences are kept in DOUBLED integer cents
    // (lo2 = 5·q1 − 3·q3, hi2 = 5·q3 − 3·q1, compare against 2·v) so
    // the halves in q ± 1.5·(q3−q1) never materialize as floats — the
    // classification is pure BIGINT arithmetic, bit-exact on both
    // engines. One keyed shuffle for the frequency table, broadcast
    // fence tables back onto it (counting tail mass from freq — t rows
    // per distinct value — not from raw events: the second pass over
    // the fact table is free at fixture scale and stays a COMPRESSED
    // scan at 100 TB). Rate is floor-scaled e4 from exact integers.
    Q("m_iqr_outliers",
      (s, d) => {
        val v = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 100.0).cast("long").as("cents"))
        // staged: four consumers (cum window, per-type totals, and the
        // final tail-mass count — with the cum subtree feeding both
        // quartile selections) re-ran the event scan+agg per consumer
        val freq = v.groupBy("event_type", "cents")
          .agg(count(lit(1)).as("t"))
          .stageCkpt()
        val w = Window.partitionBy("event_type").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = freq.withColumn("cum", sum("t").over(w))
        val nTab = freq.groupBy("event_type").agg(sum("t").as("n"))
        val ranked = cum.join(broadcast(nTab), Seq("event_type"))
        val q1 = ranked.filter(col("cum") >= expr("(n + 3) div 4"))
          .groupBy("event_type").agg(min("cents").as("q1"))
        val q3 = ranked.filter(col("cum") >= expr("(3 * n + 3) div 4"))
          .groupBy("event_type").agg(min("cents").as("q3"))
        val fences = q1.join(q3, Seq("event_type"))
          .select(col("event_type"), col("q1"), col("q3"),
            (lit(5L) * col("q1") - lit(3L) * col("q3")).as("lo2"),
            (lit(5L) * col("q3") - lit(3L) * col("q1")).as("hi2"))
        freq.join(broadcast(fences), Seq("event_type"))
          .groupBy("event_type")
          .agg(sum("t").as("n"), first("q1").as("q1"),
            first("q3").as("q3"),
            sum(when(lit(2L) * col("cents") < col("lo2"), col("t"))
              .otherwise(lit(0L))).as("n_low"),
            sum(when(lit(2L) * col("cents") > col("hi2"), col("t"))
              .otherwise(lit(0L))).as("n_high"))
          .select(col("event_type"), col("n"), col("q1"), col("q3"),
            col("n_low"), col("n_high"),
            floor((col("n_low") + col("n_high")) * 10000.0 / col("n"))
              .cast("long").as("outlier_rate_e4"))
          .orderBy("event_type")
      },
      Some(
        """WITH v AS (
          |  SELECT event_type,
          |    CAST(floor("value" * 100.0) AS BIGINT) AS cents
          |  FROM events
          |), freq AS (
          |  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS t
          |  FROM v GROUP BY 1, 2
          |), cum AS (
          |  SELECT event_type, cents, t,
          |    CAST(sum(t) OVER (PARTITION BY event_type ORDER BY cents
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum
          |  FROM freq
          |), nt AS (
          |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n
          |  FROM freq GROUP BY 1
          |), q1 AS (
          |  SELECT c.event_type, min(c.cents) AS q1
          |  FROM cum c JOIN nt USING (event_type)
          |  WHERE c.cum >= (nt.n + 3) // 4
          |  GROUP BY c.event_type
          |), q3 AS (
          |  SELECT c.event_type, min(c.cents) AS q3
          |  FROM cum c JOIN nt USING (event_type)
          |  WHERE c.cum >= (3 * nt.n + 3) // 4
          |  GROUP BY c.event_type
          |), fences AS (
          |  SELECT event_type, q1.q1, q3.q3,
          |    5 * q1.q1 - 3 * q3.q3 AS lo2,
          |    5 * q3.q3 - 3 * q1.q1 AS hi2
          |  FROM q1 JOIN q3 USING (event_type)
          |)
          |SELECT f.event_type, CAST(sum(f.t) AS BIGINT) AS n,
          |  fe.q1, fe.q3,
          |  CAST(sum(CASE WHEN 2 * f.cents < fe.lo2 THEN f.t
          |           ELSE 0 END) AS BIGINT) AS n_low,
          |  CAST(sum(CASE WHEN 2 * f.cents > fe.hi2 THEN f.t
          |           ELSE 0 END) AS BIGINT) AS n_high,
          |  CAST(floor((sum(CASE WHEN 2 * f.cents < fe.lo2 THEN f.t
          |                   ELSE 0 END) +
          |              sum(CASE WHEN 2 * f.cents > fe.hi2 THEN f.t
          |                   ELSE 0 END)) * 10000.0 / sum(f.t))
          |    AS BIGINT) AS outlier_rate_e4
          |FROM freq f JOIN fences fe USING (event_type)
          |GROUP BY f.event_type, fe.q1, fe.q3
          |ORDER BY f.event_type""".stripMargin)),

    // ----- Co-purchase projection ("customers who bought X also
    // bought Y"): project the order→part bipartite graph onto parts by
    // counting orders containing both — the item-item co-occurrence
    // matrix behind every neighborhood recommender, and m_assoc_rules'
    // graph-shaped sibling (baskets = orders instead of users, output
    // = top weighted pairs instead of rules). Scale shape: the pair
    // expansion self-joins the distinct (order, part) table ON THE
    // ORDER KEY — co-partitioned, map-local, and fan-out bounded by
    // the square of the ORDER SIZE (≤ 7 lineitems per order in this
    // schema, a data invariant independent of corpus scale), so there
    // is no hub problem by construction — the contrast to k15, where
    // wedge centers needed an explicit cap. Pair counts shuffle on the
    // (p1, p2) key with map-side combine; lift comes from the
    // broadcast per-part support table + 1-row order-count capsule,
    // floor-scaled e4 from exact integers (the m_assoc_rules
    // discipline). Top-50 by count is a TakeOrdered — no global sort.
    Q("m_copurchase",
      (s, d) => {
        // staged: the distinct (o,p) table has FIVE consumers (both
        // self-join sides, per-part support, the order count) — each
        // re-ran the full lineitem distinct shuffle before the cut
        // (plan showed 5 identical Exchange+HashAggregate subtrees)
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct().stageCkpt()
        val nOrders = li.select("o").distinct()
          .agg(count(lit(1)).as("n_orders"))
        val supp = li.groupBy("p").agg(count(lit(1)).as("s"))
        // NO broadcast hint on the self-join: the distinct (o,p) table
        // grows with the corpus (6M rows at sf10 — a broadcast there
        // would be hundreds of MB against the 8 GB relation cap), and
        // the two sides are the same staged frame, so the sort-merge
        // path shuffles each side once on the co-partitioned order key
        val li2 = li.select(col("o"), col("p").as("p2"))
        li.as("a")
          .join(li2.as("b"), Seq("o"))
          .filter(col("p") < col("p2"))
          .groupBy(col("p").as("p1"), col("p2"))
          .agg(count(lit(1)).as("n_both"))
          .filter(col("n_both") >= 2)
          .join(broadcast(supp.select(col("p").as("p1"),
            col("s").as("s1"))), Seq("p1"))
          .join(broadcast(supp.select(col("p").as("p2"),
            col("s").as("s2"))), Seq("p2"))
          .crossJoin(broadcast(nOrders))
          .select(col("p1"), col("p2"), col("n_both"), col("s1"),
            col("s2"),
            floor(col("n_both") * col("n_orders") * 10000.0 /
              (col("s1") * col("s2"))).cast("long").as("lift_e4"))
          .orderBy(desc("n_both"), col("p1"), col("p2"))
          .limit(50)
      },
      Some(
        """WITH li AS (
          |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          |  FROM lineitem
          |), no AS (
          |  SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li
          |), supp AS (
          |  SELECT p, CAST(count(*) AS BIGINT) AS s FROM li GROUP BY p
          |), pairs AS (
          |  SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT)
          |    AS n_both
          |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
          |  GROUP BY a.p, b.p
          |)
          |SELECT pr.p1, pr.p2, pr.n_both, s1.s AS s1, s2.s AS s2,
          |  CAST(floor(pr.n_both * no.n_orders * 10000.0 /
          |       (s1.s * s2.s)) AS BIGINT) AS lift_e4
          |FROM pairs pr
          |JOIN supp s1 ON pr.p1 = s1.p
          |JOIN supp s2 ON pr.p2 = s2.p
          |CROSS JOIN no
          |WHERE pr.n_both >= 2
          |ORDER BY pr.n_both DESC, pr.p1, pr.p2 LIMIT 50""".stripMargin)),

    // ----- Inter-arrival profile + burstiness (Goh & Barabási 2008):
    // per event type, the distribution of per-user gaps between
    // consecutive events — the signal that separates organic activity
    // (heavy-tailed, bursty, B > 0) from bot/scheduler traffic
    // (metronomic, B < 0). Plan: one lag window PARTITIONED BY
    // (user, type) — keyed, thousands of small partitions, never the
    // g2 single-partition trap — then integer-second gaps pool into a
    // per-type frequency table for exact nearest-rank median/P90 (the
    // m_winsorize strategy). Burstiness B = (σ−μ)/(σ+μ) comes from
    // the three exact integer sums (n, Σg, Σg²): each is cast to
    // DOUBLE once and pushed through the IDENTICAL expression tree on
    // both engines — deterministic even where Σg² exceeds 2^53,
    // because both engines round the same integer the same way. The
    // n·Σg² integer form would overflow BIGINT at scale, so the
    // variance stays in doubles BY the same fixed tree.
    Q("m_interarrival",
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        val gaps = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"),
            col("event_id"))
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .filter(col("prev").isNotNull)
          // integer micros diff floor-divided to whole seconds —
          // epoch()/unix_timestamp() fractional-vs-floored semantics
          // differ across engines, micro integers do not
          .select(col("event_type"),
            expr("(unix_micros(ts) - unix_micros(prev)) div 1000000")
              .as("gap"))
          // staged: the per-user lag window over the full event table
          // has two consumers (the gap frequency table + the moment
          // sums) and re-ran once per consumer before the cut
          .stageCkpt()
        val freq = gaps.groupBy("event_type", "gap")
          .agg(count(lit(1)).as("t"))
          // staged: three consumers (cum window, per-type totals —
          // and the cum subtree itself feeds both the median and the
          // P90 rank selections)
          .stageCkpt()
        val cw = Window.partitionBy("event_type").orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = freq.withColumn("cum", sum("t").over(cw))
        val nTab = freq.groupBy("event_type").agg(sum("t").as("n"))
        val ranked = cum.join(broadcast(nTab), Seq("event_type"))
        val med = ranked.filter(col("cum") >= expr("(n + 1) div 2"))
          .groupBy("event_type").agg(min("gap").as("gap_med"))
        val p90 = ranked.filter(col("cum") >= expr("(9 * n + 9) div 10"))
          .groupBy("event_type").agg(min("gap").as("gap_p90"))
        val moments = gaps.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("gap").as("sg"),
            sum(col("gap") * col("gap")).as("sg2"))
        moments
          .join(broadcast(med), Seq("event_type"))
          .join(broadcast(p90), Seq("event_type"))
          .select(col("event_type"), col("n"), col("gap_med"),
            col("gap_p90"),
            (col("sg").cast("double") / col("n")).as("mean_s"),
            ((sqrt(col("sg2").cast("double") / col("n") -
              (col("sg").cast("double") / col("n")) *
                (col("sg").cast("double") / col("n"))) -
              col("sg").cast("double") / col("n")) /
              (sqrt(col("sg2").cast("double") / col("n") -
                (col("sg").cast("double") / col("n")) *
                  (col("sg").cast("double") / col("n"))) +
                col("sg").cast("double") / col("n")))
              .as("burstiness"))
          .orderBy("event_type")
      },
      Some(
        """WITH gaps AS (
          |  SELECT event_type,
          |    CAST((epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
          |      PARTITION BY user_id, event_type
          |      ORDER BY ts, event_id))) // 1000000 AS BIGINT) AS gap
          |  FROM events
          |  QUALIFY lag(ts, 1) OVER (
          |    PARTITION BY user_id, event_type
          |    ORDER BY ts, event_id) IS NOT NULL
          |), freq AS (
          |  SELECT event_type, gap, CAST(count(*) AS BIGINT) AS t
          |  FROM gaps GROUP BY 1, 2
          |), cum AS (
          |  SELECT event_type, gap, t,
          |    CAST(sum(t) OVER (PARTITION BY event_type ORDER BY gap
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cum
          |  FROM freq
          |), nt AS (
          |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n
          |  FROM freq GROUP BY 1
          |), med AS (
          |  SELECT c.event_type, min(c.gap) AS gap_med
          |  FROM cum c JOIN nt USING (event_type)
          |  WHERE c.cum >= (nt.n + 1) // 2 GROUP BY c.event_type
          |), p90 AS (
          |  SELECT c.event_type, min(c.gap) AS gap_p90
          |  FROM cum c JOIN nt USING (event_type)
          |  WHERE c.cum >= (9 * nt.n + 9) // 10 GROUP BY c.event_type
          |), mo AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(gap) AS BIGINT) AS sg,
          |    CAST(sum(gap * gap) AS BIGINT) AS sg2
          |  FROM gaps GROUP BY 1
          |)
          |SELECT mo.event_type, mo.n, med.gap_med, p90.gap_p90,
          |  CAST(sg AS DOUBLE) / mo.n AS mean_s,
          |  (sqrt(CAST(sg2 AS DOUBLE) / mo.n -
          |        (CAST(sg AS DOUBLE) / mo.n) *
          |          (CAST(sg AS DOUBLE) / mo.n)) -
          |   CAST(sg AS DOUBLE) / mo.n) /
          |  (sqrt(CAST(sg2 AS DOUBLE) / mo.n -
          |        (CAST(sg AS DOUBLE) / mo.n) *
          |          (CAST(sg AS DOUBLE) / mo.n)) +
          |   CAST(sg AS DOUBLE) / mo.n) AS burstiness
          |FROM mo JOIN med USING (event_type)
          |JOIN p90 USING (event_type)
          |ORDER BY mo.event_type""".stripMargin)),

    // ----- Higher-moment profile: skewness + excess kurtosis per
    // metric — the tail-shape numbers a pipeline reads BEFORE choosing
    // between mean (γ₁ ≈ 0), winsorized mean (m_winsorize, moderate
    // skew), or median (m_iqr_outliers territory). The whole query is
    // ONE map-side-combinable pass accumulating (n, Σx, Σx², Σx³, Σx⁴)
    // — the textbook distributed-moments shape. Exactness under
    // overflow: x is integer cents (≤ ~5e4), so x⁴ ≤ ~6e18 — the
    // 3rd/4th-power SUMS overflow BIGINT at scale, so they accumulate
    // in 38-digit fixed-point (Spark DECIMAL(38,0) / DuckDB HUGEINT:
    // different names, both exact 128-bit integer arithmetic — good to
    // 1e38, i.e. exabytes of rows). Every sum is exact; each is cast
    // to DOUBLE exactly once (correctly rounded on both engines) and
    // pushed through the IDENTICAL standardized-moment expression
    // tree, so the reported floats are bit-equal cross-engine.
    Q("m_moments",
      (s, d) => {
        val x = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 100.0).cast("long").as("c"))
          .withColumn("c2", col("c") * col("c"))
        val sums = x.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("c").as("s1"),
          sum("c2").as("s2"),
          sum(col("c2").cast("decimal(25,0)") * col("c")).as("s3"),
          sum(col("c2").cast("decimal(20,0)") * col("c2")).as("s4"))
        sums.select(col("event_type"), col("n"),
            (col("s1").cast("double") / col("n")).as("mu"),
            col("s2").cast("double").as("d2"),
            col("s3").cast("double").as("d3"),
            col("s4").cast("double").as("d4"))
          .select(col("event_type"), col("n"), col("mu"),
            (col("d2") / col("n") - col("mu") * col("mu")).as("m2"),
            (col("d3") / col("n") - lit(3.0) * col("mu") *
              (col("d2") / col("n")) +
              lit(2.0) * col("mu") * col("mu") * col("mu")).as("m3"),
            (col("d4") / col("n") - lit(4.0) * col("mu") *
              (col("d3") / col("n")) +
              lit(6.0) * col("mu") * col("mu") *
                (col("d2") / col("n")) -
              lit(3.0) * col("mu") * col("mu") * col("mu") *
                col("mu")).as("m4"))
          .select(col("event_type"), col("n"),
            col("mu").as("mean_cents"),
            col("m2").as("variance"),
            (col("m3") / (col("m2") * sqrt(col("m2"))))
              .as("skewness"),
            (col("m4") / (col("m2") * col("m2")) - lit(3.0))
              .as("kurtosis_excess"))
          .orderBy("event_type")
      },
      Some(
        """WITH xx AS (
          |  SELECT event_type,
          |    CAST(floor("value" * 100.0) AS BIGINT) AS c,
          |    CAST(floor("value" * 100.0) AS BIGINT) *
          |      CAST(floor("value" * 100.0) AS BIGINT) AS c2
          |  FROM events
          |), sums AS (
          |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          |    CAST(sum(c) AS BIGINT) AS s1,
          |    CAST(sum(c2) AS BIGINT) AS s2,
          |    sum(CAST(c2 AS HUGEINT) * c) AS s3,
          |    sum(CAST(c2 AS HUGEINT) * c2) AS s4
          |  FROM xx GROUP BY event_type
          |), d AS (
          |  SELECT event_type, n,
          |    CAST(s1 AS DOUBLE) / n AS mu,
          |    CAST(s2 AS DOUBLE) AS d2,
          |    CAST(s3 AS DOUBLE) AS d3,
          |    CAST(s4 AS DOUBLE) AS d4
          |  FROM sums
          |), m AS (
          |  SELECT event_type, n, mu,
          |    d2 / n - mu * mu AS m2,
          |    d3 / n - 3.0 * mu * (d2 / n) +
          |      2.0 * mu * mu * mu AS m3,
          |    d4 / n - 4.0 * mu * (d3 / n) +
          |      6.0 * mu * mu * (d2 / n) -
          |      3.0 * mu * mu * mu * mu AS m4
          |  FROM d
          |)
          |SELECT event_type, n, mu AS mean_cents, m2 AS variance,
          |  m3 / (m2 * sqrt(m2)) AS skewness,
          |  m4 / (m2 * m2) - 3.0 AS kurtosis_excess
          |FROM m ORDER BY event_type""".stripMargin)),

    // ----- ROC-AUC by pair counting — the classifier-evaluation
    // metric a labeling pipeline needs at corpus scale, computed
    // WITHOUT the textbook global rank (the g2 single-partition-window
    // trap): AUC = P(score_pos > score_neg) + ½·P(tie), counted from
    // the score-FREQUENCY table — group scores, carry positive/
    // negative counts per distinct score, and a running-total window
    // over DISTINCT scores gives, for each score s, how many negatives
    // lie strictly below: Σ np(s)·negs_below(s) counts the correctly-
    // ordered pairs and Σ np(s)·nn(s) the ties. Window rows = distinct
    // quantized scores (bounded by the e6 quantization grid, NOT the
    // corpus — the m_gini compression argument). Evaluated here:
    // embedding dim 0 as a detector for label ≥ 5 (an honest ≈0.5 on
    // this fixture — dim 0 carries no class signal; the MACHINERY is
    // what's under test). Doubled numerator keeps the ½ exact:
    // auc = (2·Σ np·below + Σ np·nn) / (2·P·N), all BIGINTs until one
    // final division.
    Q("m_auc",
      (s, d) => {
        val scored = Tables.embeddings(s, d)
          .select(
            floor(element_at(col("embedding"), 1).cast("double")
              * 1000000.0 + 0.5).cast("long").as("sc"),
            when(col("label") >= 5, 1L).otherwise(0L).as("pos"))
        val freq = scored.groupBy("sc")
          .agg(sum("pos").as("np"),
            (count(lit(1)) - sum("pos")).as("nn"))
        val w = Window.orderBy("sc")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val below = freq
          .withColumn("cumn", sum("nn").over(w) - col("nn"))
        below.agg(
          sum("np").as("n_pos"), sum("nn").as("n_neg"),
          sum(col("np") * col("cumn")).as("gt_pairs"),
          sum(col("np") * col("nn")).as("tie_pairs"))
          .select(col("n_pos"), col("n_neg"), col("gt_pairs"),
            col("tie_pairs"),
            ((lit(2L) * col("gt_pairs") + col("tie_pairs"))
              .cast("double") /
              (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
              .as("auc"))
      },
      Some(
        """WITH scored AS (
          |  SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0
          |           + 0.5) AS BIGINT) AS sc,
          |    CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
          |  FROM embeddings
          |), freq AS (
          |  SELECT sc, CAST(sum(pos) AS BIGINT) AS np,
          |    CAST(count(*) - sum(pos) AS BIGINT) AS nn
          |  FROM scored GROUP BY sc
          |), below AS (
          |  SELECT sc, np, nn,
          |    CAST(sum(nn) OVER (ORDER BY sc
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      - nn AS BIGINT) AS cumn
          |  FROM freq
          |), agg AS (
          |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
          |    CAST(sum(nn) AS BIGINT) AS n_neg,
          |    CAST(sum(np * cumn) AS BIGINT) AS gt_pairs,
          |    CAST(sum(np * nn) AS BIGINT) AS tie_pairs
          |  FROM below
          |)
          |SELECT n_pos, n_neg, gt_pairs, tie_pairs,
          |  CAST(2 * gt_pairs + tie_pairs AS DOUBLE) /
          |    CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
          |FROM agg""".stripMargin)),

    // ----- Day-of-week seasonality χ² — "does traffic have a weekly
    // pulse, or is the dashboard's weekend dip just noise?" —
    // complementing m_chi2_drift (two periods' type mixes; this is one
    // period against its own calendar null). The null is CALENDAR-
    // WEIGHTED, not naive-uniform: a 30-day window holds two weekdays
    // 5× and five 4×, so perfectly day-uniform traffic is already
    // non-uniform over dow cells — expected counts are n·days_c/D
    // (days_c = how often weekday c occurs in the window). Exact
    // clearing: χ²·(20·D·n) = Σ (20/days_c)·(D·obs_c − n·days_c)² is
    // pure BIGINT because any one-month window has days_c ∈ {4, 5},
    // both dividing 20 (the lcm trick; a window breaking that
    // assumption would change both engines identically — the
    // n_cells/n outputs surface fixture drift). The α=0.05/df=6
    // decision clears to 1000·NUM > 251840·D·n (12.592·20·1000) — no
    // float feeds the boolean (the m_ab_test discipline). One
    // map-side-combinable (type, dow) count + a 7-row broadcast
    // calendar table; the report χ² is the single final division.
    Q("m_dow_uniformity",
      (s, d) => {
        val base = Tables.events(s, d)
          .select(col("event_type"),
            dayofweek(col("ts")).cast("long").as("dw"),
            to_date(col("ts")).as("day"))
        val cal = base.select("dw", "day").distinct()
          .groupBy("dw").agg(count(lit(1)).as("days"))
        val dTot = cal.agg(sum("days").as("bigd"))
        val obs = base.groupBy("event_type", "dw")
          .agg(count(lit(1)).as("obs"))
        val nTab = obs.groupBy("event_type").agg(sum("obs").as("n"),
          count(lit(1)).as("n_cells"))
        obs.join(broadcast(cal), Seq("dw"))
          .join(broadcast(nTab), Seq("event_type"))
          .crossJoin(broadcast(dTot))
          .select(col("event_type"), col("n"), col("n_cells"),
            col("bigd"),
            (expr("20 div days") *
              (col("bigd") * col("obs") - col("n") * col("days")) *
              (col("bigd") * col("obs") - col("n") * col("days")))
              .as("sq"))
          .groupBy("event_type", "n", "n_cells", "bigd")
          .agg(sum("sq").as("num"))
          .select(col("event_type"), col("n"),
            col("n_cells").cast("int").as("n_cells"),
            (col("num").cast("double") /
              (lit(20.0) * col("bigd") * col("n"))).as("chi2"),
            (lit(1000L) * col("num") >
              lit(251840L) * col("bigd") * col("n"))
              .as("weekly_pulse"))
          .orderBy("event_type")
      },
      Some(
        """WITH base AS (
          |  SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dw,
          |    CAST(ts AS DATE) AS day
          |  FROM events
          |), cal AS (
          |  SELECT dw, CAST(count(*) AS BIGINT) AS days
          |  FROM (SELECT DISTINCT dw, day FROM base) GROUP BY dw
          |), dt AS (
          |  SELECT CAST(sum(days) AS BIGINT) AS bigd FROM cal
          |), obs AS (
          |  SELECT event_type, dw, CAST(count(*) AS BIGINT) AS obs
          |  FROM base GROUP BY 1, 2
          |), nt AS (
          |  SELECT event_type, CAST(sum(obs) AS BIGINT) AS n,
          |    CAST(count(*) AS INT) AS n_cells
          |  FROM obs GROUP BY 1
          |), sq AS (
          |  SELECT o.event_type, nt.n, nt.n_cells, dt.bigd,
          |    CAST(sum((20 // c.days) *
          |      (dt.bigd * o.obs - nt.n * c.days) *
          |      (dt.bigd * o.obs - nt.n * c.days)) AS BIGINT) AS num
          |  FROM obs o
          |  JOIN cal c USING (dw)
          |  JOIN nt USING (event_type)
          |  CROSS JOIN dt
          |  GROUP BY o.event_type, nt.n, nt.n_cells, dt.bigd
          |)
          |SELECT event_type, n, n_cells,
          |  CAST(num AS DOUBLE) / (20.0 * bigd * n) AS chi2,
          |  1000 * num > 251840 * bigd * n AS weekly_pulse
          |FROM sq ORDER BY event_type""".stripMargin)),

    // ----- Hill tail-index estimator (Hill 1975) per metric — the
    // heavy-tail diagnostic that tells a pipeline whether means and
    // variances even EXIST for this column (α ≤ 2 ⇒ infinite
    // variance ⇒ every moment-based monitor upstream is lying): ξ =
    // (1/k)Σ ln(x_i/x_(k+1)) over the k = 100 largest values, α =
    // 1/ξ. Order statistics come from the DESC-cumulative frequency
    // table (the m_gini compression — windows over distinct value
    // levels, never rows): x_(k+1) = max{v : #≥v ≥ k+1}, and each
    // level v > that reference contributes min(t, k − #strictly
    // above) copies — an exact integer multiset whose weights sum to
    // k by construction. Each ln ratio is floor-scaled to e6 BIGINTs
    // (the t_zipf_fit discipline) so the Hill sum is an exact
    // integer; ξ and α are single shared double expressions rounded
    // 4dp. Scale: one frequency aggregation + one per-type window
    // over distinct cents levels.
    Q("m_hill_tail",
      (s, d) => {
        val freq = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * 100.0).cast("long").as("v"))
          .filter(col("v") > 0L)
          .groupBy("event_type", "v").agg(count(lit(1)).as("t"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("v").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = freq.withColumn("cumd", sum("t").over(w))
        val xref = cum.filter(col("cumd") >= 101L)
          .groupBy("event_type").agg(max("v").as("xr"))
        val hill = cum.join(broadcast(xref), Seq("event_type"))
          .filter(col("v") >= col("xr") && col("cumd") - col("t") < 100L)
          .select(col("event_type"), col("xr"),
            least(col("t"), lit(100L) - (col("cumd") - col("t")))
              .as("wgt"),
            floor(log(col("v").cast("double") /
              col("xr").cast("double")) * 1000000.0).cast("long")
              .as("l6"))
          .groupBy("event_type", "xr")
          .agg(sum("wgt").as("k"), sum(col("wgt") * col("l6")).as("h6"))
        hill.select(col("event_type"), col("k"),
            col("xr").as("xref_cents"),
            round(col("h6").cast("double") /
              (col("k").cast("double") * 1000000.0), 4).as("xi"),
            round(col("k").cast("double") * 1000000.0 /
              col("h6").cast("double"), 4).as("alpha"))
          .orderBy("event_type")
      },
      Some(
        """WITH freq AS (
          |  SELECT event_type,
          |    CAST(floor("value" * 100.0) AS BIGINT) AS v,
          |    CAST(count(*) AS BIGINT) AS t
          |  FROM events WHERE floor("value" * 100.0) > 0
          |  GROUP BY event_type, v
          |), cum AS (
          |  SELECT event_type, v, t,
          |    CAST(sum(t) OVER (PARTITION BY event_type ORDER BY v DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS cumd
          |  FROM freq
          |), xref AS (
          |  SELECT event_type, CAST(max(v) AS BIGINT) AS xr
          |  FROM cum WHERE cumd >= 101 GROUP BY event_type
          |), hill AS (
          |  SELECT c.event_type, x.xr,
          |    CAST(sum(least(c.t, 100 - (c.cumd - c.t))) AS BIGINT)
          |      AS k,
          |    CAST(sum(least(c.t, 100 - (c.cumd - c.t)) *
          |      CAST(floor(ln(CAST(c.v AS DOUBLE) /
          |        CAST(x.xr AS DOUBLE)) * 1000000.0) AS BIGINT))
          |      AS BIGINT) AS h6
          |  FROM cum c JOIN xref x USING (event_type)
          |  WHERE c.v >= x.xr AND c.cumd - c.t < 100
          |  GROUP BY c.event_type, x.xr
          |)
          |SELECT event_type, k, xr AS xref_cents,
          |  round(CAST(h6 AS DOUBLE) /
          |    (CAST(k AS DOUBLE) * 1000000.0), 4) AS xi,
          |  round(CAST(k AS DOUBLE) * 1000000.0 /
          |    CAST(h6 AS DOUBLE), 4) AS alpha
          |FROM hill ORDER BY event_type""".stripMargin)),
  )
}
