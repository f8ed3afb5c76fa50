package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.Random

/** Randomized differential plan fuzzing (VERDICT r7 item 5).
  *
  * A seed-pinned generator composes the §2 relational operator surface —
  * project / filter / explode / join (inner, left, semi, anti, full) /
  * aggregate (incl. ROLLUP/CUBE grouping sets, count-distinct, conditional
  * sums, UTF8_LCASE-collated keys) / window / distinct — over the bounded
  * fixture tables, and each generated plan is rendered by THREE
  * coordinated backends:
  *
  *   1. [[toDF]]   — the Spark DataFrame under test;
  *   2. [[toSql]]  — equivalent ANSI SQL for the DuckDB oracle (driver gate);
  *   3. [[interp]] — an independent in-JVM collection interpreter with
  *                   explicit SQL semantics (3-valued logic, null join keys,
  *                   null-extending outer joins, group-by-null-equality),
  *                   sharing no Catalyst code at all.
  *
  * FuzzSpec checks Spark vs the interpreter over hundreds of seeds per CI
  * pass (seed-pinned repro on failure); a fixed screened seed set is also
  * registered in SparkEntry so the driver's DuckDB hash-differential
  * exercises the same generator every round.
  *
  * Every construct is chosen to be BIT-DETERMINISTIC across engines, because
  * the driver's comparison is hash-strict:
  *   - long arithmetic is always `abs(_) % k` — ANSI-overflow-free, sign
  *     ambiguity removed, values bounded so integer sums stay exact;
  *   - doubles appear only in per-row scalar expressions (identical IEEE
  *     evaluation on both engines) and order-insensitive min/max — never
  *     in sums; `avg` is restricted to bounded longs, whose double partial
  *     sums are exact integers below 2^53, hence order-independent;
  *   - double literals are emitted in e-notation (a plain decimal literal
  *     is DECIMAL in DuckDB — NOTES.md round-6 lesson);
  *   - window order keys are wrapped in COALESCE(…, sentinel): Spark
  *     defaults to NULLS FIRST on ASC where DuckDB defaults to NULLS LAST,
  *     so null orderings must never reach the engines' defaults;
  *   - rank/length/count are cast to BIGINT on both sides (Spark returns
  *     INT where DuckDB returns BIGINT — the driver is type-strict);
  *   - joins follow N:1 foreign keys only, so fuzzed row counts are bounded
  *     by the base scan (times at most two 2-element explodes).
  */
object Fuzz {

  /** Driver-facing pinned seeds, screened so each passes the DuckDB
    * differential at sf0.01 AND sf0.001 with a non-empty result, and so
    * the set jointly covers every operator the generator emits — all 36
    * inventory tags: joins (inner, left, semi, anti, FULL OUTER),
    * aggregates (incl. avg, count-distinct, conditional sums, ROLLUP /
    * CUBE grouping sets with GROUPING-id columns), uncorrelated
    * scalar-subquery filters, windows incl. the RANGE-frame running
    * sum, explode, distinct, set ops, and the null-semantics
    * predicates (null-safe equality, IN-lists under NOT, LIKE).
    * Selection (round 10 second pass, after the UTF8_LCASE
    * collated-aggregate construct re-rolled every seed's plan): the
    * greedy DOUBLE cover over the 128 seeds of 1-200 that are
    * non-empty at both gate scales — every one of the 40 inventory
    * tags (now incl. coll_agg, carried 4×) covered by ≥ 2 distinct
    * seeds where the pool offers two carriers — plus 252 and 278, the
    * set_except carriers (278 also the second wnd_rsrows). All 21
    * pass the DuckDB differential at sf0.001, sf0.01 AND sf0.1 with
    * non-empty results (see FuzzInventory / FuzzScreen). The plan AND
    * its oracle SQL are both re-derived from the seed at runtime, so
    * the two sides can never drift apart. */
  private val driverSeeds: Vector[Int] = Vector(
    4, 10, 15, 19, 31, 46, 52, 57, 65, 66, 83, 102, 107, 137, 141, 142,
    151, 152, 181, 252, 278)

  // lazy: toSql walks tableSchemas, which is defined further down the
  // object body — eager init would read it as null
  lazy val all: Seq[Q] = driverSeeds.map { seed =>
    val name = f"z_fuzz_$seed%03d"
    Q(name,
      (s: SparkSession, d: String) => toDF(s, d, gen(seed.toLong)),
      Some(toSql(gen(seed.toLong))))
  }

  // ---------------------------------------------------------------- types

  sealed trait Typ
  case object TL extends Typ
  case object TD extends Typ
  case object TS extends Typ

  final case class Cl(name: String, typ: Typ)

  sealed trait Ex { def typ: Typ }
  final case class Ref(n: String, t: Typ) extends Ex { def typ = t }
  final case class LL(v: Long) extends Ex { def typ = TL }
  final case class LD(v: Double) extends Ex { def typ = TD }
  final case class LS(v: String) extends Ex { def typ = TS }
  /** abs(a) % k — the only long arithmetic wrapper (see scaladoc). */
  final case class AMod(a: Ex, k: Long) extends Ex { def typ = TL }
  final case class Bin(op: String, a: Ex, b: Ex) extends Ex { def typ = a.typ }
  final case class NullIfE(a: Ex, b: Ex) extends Ex { def typ = a.typ }
  final case class CoalE(a: Ex, b: Ex) extends Ex { def typ = a.typ }
  final case class IfE(p: Pr, t: Ex, e: Ex) extends Ex { def typ = t.typ }
  final case class UpperE(a: Ex) extends Ex { def typ = TS }
  final case class SubstrE(a: Ex, pos: Int, len: Int) extends Ex { def typ = TS }
  final case class ConcatE(a: Ex, b: Ex) extends Ex { def typ = TS }
  final case class LenE(a: Ex) extends Ex { def typ = TL }
  final case class CastD(a: Ex) extends Ex { def typ = TD }
  /** VARIANT round trip (Spark 4 semi-structured columns): the value
    * rides through to_json → parse_json → try_variant_get('$.k',
    * <type>) — semantically the identity, but it drives the whole
    * VARIANT encode/path-extract machinery under every surrounding
    * operator the generator composes. TL/TS only: JSON round-trips
    * bounded integers and the grammar's ASCII strings exactly, while
    * doubles would re-enter through decimal text. NULL stays NULL on
    * all three backends (Spark's to_json drops the null field and
    * try_variant_get maps the absent path to NULL; DuckDB's
    * json_extract_string returns NULL for a JSON null). DuckDB has no
    * VARIANT, so its side is the JSON-function rendering of the same
    * round trip; the interpreter is the identity. */
  final case class VarE(a: Ex) extends Ex { def typ = a.typ }

  sealed trait Pr
  final case class Cmp(op: String, a: Ex, b: Ex) extends Pr
  final case class IsNull(a: Ex, negated: Boolean) extends Pr
  final case class AndP(a: Pr, b: Pr) extends Pr
  final case class OrP(a: Pr, b: Pr) extends Pr
  final case class NotP(a: Pr) extends Pr
  /** Null-safe equality — the one TWO-valued comparison in SQL
    * (NULL is equal to NULL, never UNKNOWN). Spark spells it `<=>`,
    * DuckDB `IS NOT DISTINCT FROM`. */
  final case class NsEq(a: Ex, b: Ex, negated: Boolean) extends Pr
  /** `a IN (lit, …)` over non-null literals — UNKNOWN when a is null;
    * NOT IN's famous 3VL arises via [[NotP]] wrapping. */
  final case class InP(a: Ex, lits: Vector[Ex]) extends Pr
  /** `a LIKE pattern`; patterns here use only letters, spaces and `%`
    * (no `_`, no escapes), so the three backends agree by
    * construction. */
  final case class LikeP(a: Ex, pattern: String) extends Pr

  sealed trait Ag
  case object CntAll extends Ag
  final case class Cnt(c: String) extends Ag
  final case class SumL(c: String) extends Ag
  final case class AvgL(c: String) extends Ag
  final case class MinA(c: String, t: Typ) extends Ag
  final case class MaxA(c: String, t: Typ) extends Ag
  /** count(DISTINCT c) — exact distinct count; value equality only
    * (the grammar never mints -0.0 or NaN, the two doubles whose
    * distinct-semantics differ across engines). */
  final case class CntD(c: String) extends Ag
  /** sum(CASE WHEN p THEN abs(c) % k ELSE 0 END) — the conditional-
    * aggregation idiom (filtered sums without a filter operator). The
    * summand is a bounded non-negative integer, so partial sums stay
    * exact; a NULL c under a true predicate contributes NULL, which
    * SUM skips on every backend. */
  final case class SumCase(p: Pr, c: String, k: Long) extends Ag

  sealed trait Pl { def schema: Vector[Cl] }
  final case class Scan(t: String) extends Pl {
    def schema: Vector[Cl] = tableSchemas(t)
  }
  final case class Proj(in: Pl, outs: Vector[(String, Ex)]) extends Pl {
    def schema: Vector[Cl] = outs.map { case (n, e) => Cl(n, e.typ) }
  }
  final case class Filt(in: Pl, p: Pr) extends Pl {
    def schema: Vector[Cl] = in.schema
  }
  /** Filter against an UNCORRELATED scalar subquery (the TPC-H
    * Q11/Q15 planning shape): keep rows where `a op (scalar of sub)`.
    * `sub` is always a keyless single-aggregate plan, which yields
    * exactly ONE row on every backend even over empty input; a NULL
    * scalar (e.g. min of an empty scan) makes the comparison UNKNOWN
    * and drops every row — the 3-valued corner this construct exists
    * to exercise. Spark renders it as crossJoin(broadcast(scalar)),
    * the plan a hand-written DataFrame pipeline would use; the SQL
    * side uses a genuine scalar subquery. */
  final case class FiltSub(in: Pl, a: Ex, op: String, sub: Pl) extends Pl {
    def schema: Vector[Cl] = in.schema
  }
  final case class Agg(in: Pl, keys: Vector[Cl],
                       aggs: Vector[(String, Ag)]) extends Pl {
    def schema: Vector[Cl] = keys ++ aggs.map { case (n, a) =>
      Cl(n, a match {
        case MinA(_, t) => t
        case MaxA(_, t) => t
        case AvgL(_)    => TD
        case _          => TL
      })
    }
  }
  /** UTF8_LCASE-collated single-key aggregate: the group key is
    * `collate(CASE WHEN pmod(mix,2)=0 THEN upper(key) ELSE key END,
    * 'UTF8_LCASE')` — the mixer column manufactures case variance so
    * the collation genuinely merges byte-distinct keys (over uniform-
    * case fixture strings a collated group-by would be
    * indistinguishable from a plain one). The emitted key is
    * lower()ed: a case-insensitive group's representative variant is
    * partition-order nondeterministic by contract, so only the
    * normalized form is hashable. DuckDB oracle renders lower(CASE …)
    * GROUP BY 1 — equivalent for the fuzzer's ASCII-only strings (the
    * collation-vs-lower() equivalence is exactly ASCII-wide; no
    * generated literal or fixture string leaves ASCII). The
    * interpreter lowercases the mixed key, which equals lower(key)
    * since lower∘upper = lower on ASCII. */
  final case class CollAgg(in: Pl, key: Cl, mix: Cl,
                           aggs: Vector[(String, Ag)]) extends Pl {
    def schema: Vector[Cl] = Cl(key.name, TS) +: aggs.map { case (n, a) =>
      Cl(n, a match {
        case MinA(_, t) => t
        case MaxA(_, t) => t
        case AvgL(_)    => TD
        case _          => TL
      })
    }
  }
  /** GROUP BY ROLLUP / CUBE over 1-2 keys — grouping-set semantics:
    * each set aggregates independently with its excluded keys
    * null-filled, so super-aggregate rows interleave engine-generated
    * nulls with data nulls. The sorted-multiset union is identical on
    * all three backends, so no GROUPING() disambiguator is needed for
    * a hash differential.
    *
    * Engine quirk (pinned in QuirksSpec): the SQL standard (and
    * DuckDB) emits the empty grouping set's grand-total row even over
    * ZERO input rows — like a keyless aggregate — while Spark 4's
    * rollup/cube emits nothing. The generated SQL appends
    * `HAVING count(*) > 0`, which is a no-op on any non-empty input
    * (every grouping-set row aggregates ≥ 1 row) and removes exactly
    * the empty-input grand-total row, so all three backends agree.
    *
    * When `gid` names a column, a grouping-id output disambiguates
    * super-aggregate nulls from data nulls — and pins the BIT
    * ENCODING agreement across engines: Spark's grouping_id() and
    * the standard's GROUPING(k1, …, kn) both place the FIRST listed
    * key in the most significant bit (1 = aggregated-away). The name
    * is per-step unique: stacked Rolls may legally GROUP BY an inner
    * grouping-id column, which a fixed name would shadow.
    *
    * Engine bug found by this generator (pinned in QuirksSpec): on
    * Spark 4.1, a conditional-aggregate CASE predicate that
    * references a grouping KEY, under ROLLUP/CUBE over a UNION,
    * trips RemoveRedundantAliases into an invalid (unresolved) plan
    * — [PLAN_VALIDATION_FAILED_RULE_IN_BATCH]. Plain GROUP BY, a
    * non-key predicate, or a no-union child are all fine. The
    * generator therefore draws grouping-set conditional-agg
    * predicates and operands from NON-KEY columns only. */
  final case class Roll(in: Pl, keys: Vector[Cl],
                        aggs: Vector[(String, Ag)],
                        cube: Boolean, gid: Option[String]) extends Pl {
    def schema: Vector[Cl] = {
      val base = Agg(in, keys, aggs).schema
      gid match {
        case Some(g) =>
          (base.take(keys.size) :+ Cl(g, TL)) ++ base.drop(keys.size)
        case None => base
      }
    }
  }
  /** how ∈ inner | left | semi | anti | full. Full outer extends BOTH
    * sides with nulls, so downstream operators see null join keys and
    * null-propagating expressions on columns that scanned non-null —
    * the semantic corner the round-7 verdict called out. */
  final case class Jn(l: Pl, r: Pl, lk: String, rk: String,
                      how: String) extends Pl {
    def schema: Vector[Cl] =
      if (how == "semi" || how == "anti") l.schema else l.schema ++ r.schema
  }
  final case class Dist(in: Pl) extends Pl {
    def schema: Vector[Cl] = in.schema
  }
  /** fun ∈ rank | dense_rank | cnt (partition count) | rsum (running
    * sum of `abs(ord) % 1000` over a RANGE frame — range, not rows,
    * because peers sum together so the result is TIE-INSENSITIVE and
    * bit-deterministic without a unique order key; only generated when
    * `ord` is TL so the summand stays a bounded exact integer) |
    * rsumb (the same summand over a BOUNDED range frame
    * `RANGE BETWEEN bound PRECEDING AND CURRENT ROW` — the moving-
    * window form; offsets follow the ORDER direction on every
    * backend, and value-range frames stay tie-insensitive where a
    * ROWS frame would not be) | rsrows (the same summand over a ROWS
    * frame `ROWS BETWEEN bound PRECEDING AND CURRENT ROW`). A ROWS
    * frame is position-sensitive, so it is only deterministic under a
    * TOTAL order: the ORDER BY is `ord` (direction) followed by EVERY
    * input column ASC NULLS FIRST — the same full-column total order
    * [[Lim]] already relies on. Orderings then differ only by
    * permutations of fully-identical rows, and identical rows produce
    * the same multiset of prefix sums, so the result multiset is
    * engine-independent. `bound` is read by rsumb (value offset) and
    * rsrows (row count). */
  final case class Wnd(in: Pl, name: String, fun: String, part: Cl,
                       ord: Cl, descending: Boolean,
                       bound: Long = 0L) extends Pl {
    def schema: Vector[Cl] = in.schema :+ Cl(name, TL)
  }
  /** explode(array(a, b)) — both elements TL. */
  final case class Expl(in: Pl, name: String, a: Ex, b: Ex) extends Pl {
    def schema: Vector[Cl] = in.schema :+ Cl(name, TL)
  }
  /** ORDER BY every column (NULLS FIRST, asc) LIMIT n — ordering by the
    * full column list is total up to duplicate rows, which are
    * interchangeable, so the selected MULTISET is deterministic. The
    * NULLS FIRST is explicit on both engines: Spark defaults to nulls
    * first on ASC where DuckDB defaults to nulls last. */
  final case class Lim(in: Pl, n: Int) extends Pl {
    def schema: Vector[Cl] = in.schema
  }
  /** UNION ALL of two same-schema branches (bag semantics). */
  final case class UnionA(l: Pl, r: Pl) extends Pl {
    def schema: Vector[Cl] = l.schema
  }
  /** EXCEPT / INTERSECT — set semantics (deduped) on both engines,
    * null-safe row equality. */
  final case class SetOp(l: Pl, r: Pl, op: String) extends Pl {
    def schema: Vector[Cl] = l.schema
  }

  // ----------------------------------------------------- bounded base scans

  /** Key bound applied to fact-ish tables so fuzzed plans stay small at
    * every sf (both engines apply the identical bound). */
  private val bounds: Map[String, (String, Long)] = Map(
    "customer" -> ("c_custkey", 300L),
    "orders"   -> ("o_orderkey", 600L),
    "supplier" -> ("s_suppkey", 300L),
    "part"     -> ("p_partkey", 300L))

  val tableSchemas: Map[String, Vector[Cl]] = Map(
    "nation" -> Vector(Cl("n_nationkey", TL), Cl("n_name", TS),
      Cl("n_regionkey", TL)),
    "region" -> Vector(Cl("r_regionkey", TL), Cl("r_name", TS)),
    "customer" -> Vector(Cl("c_custkey", TL), Cl("c_name", TS),
      Cl("c_nationkey", TL), Cl("c_acctbal", TD), Cl("c_mktsegment", TS)),
    "orders" -> Vector(Cl("o_orderkey", TL), Cl("o_custkey", TL),
      Cl("o_orderstatus", TS), Cl("o_totalprice", TD),
      Cl("o_orderpriority", TS)),
    "supplier" -> Vector(Cl("s_suppkey", TL), Cl("s_name", TS),
      Cl("s_nationkey", TL), Cl("s_acctbal", TD)),
    "part" -> Vector(Cl("p_partkey", TL), Cl("p_brand", TS),
      Cl("p_type", TS), Cl("p_size", TL), Cl("p_retailprice", TD)))

  /** N:1 foreign keys — fk column name → (dim table, dim key). */
  private val fkEdges: Map[String, (String, String)] = Map(
    "c_nationkey" -> ("nation", "n_nationkey"),
    "s_nationkey" -> ("nation", "n_nationkey"),
    "n_regionkey" -> ("region", "r_regionkey"),
    "o_custkey"   -> ("customer", "c_custkey"))

  /** Plausible literal pools, keyed by column name (fallback: generic). */
  private val longPools: Map[String, (Long, Long)] = Map(
    "c_custkey" -> (0L, 300L), "o_custkey" -> (0L, 300L),
    "o_orderkey" -> (0L, 600L), "p_partkey" -> (0L, 300L),
    "s_suppkey" -> (0L, 100L), "c_nationkey" -> (0L, 24L),
    "s_nationkey" -> (0L, 24L), "n_nationkey" -> (0L, 24L),
    "n_regionkey" -> (0L, 4L), "r_regionkey" -> (0L, 4L),
    "p_size" -> (1L, 50L))
  private val doublePools: Map[String, (Double, Double)] = Map(
    "c_acctbal" -> (-1000.0, 10000.0), "s_acctbal" -> (-1000.0, 10000.0),
    "o_totalprice" -> (1000.0, 500000.0),
    "p_retailprice" -> (900.0, 2100.0))
  private val stringPools: Map[String, Vector[String]] = Map(
    "c_mktsegment" -> Vector("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY"),
    "o_orderstatus" -> Vector("F", "O", "P"),
    "o_orderpriority" -> Vector("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW"),
    "r_name" -> Vector("AFRICA", "AMERICA", "ASIA", "EUROPE",
      "MIDDLE EAST"),
    "n_name" -> Vector("NATION_0", "NATION_7", "NATION_12", "NATION_23"),
    "p_brand" -> Vector("Brand#1", "Brand#9", "Brand#13", "Brand#22"),
    "p_type" -> Vector("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
      "STANDARD"))
  private val genericStrings =
    Vector("A", "M", "Z", "Cu", "br", "ION", "Customer#")

  // -------------------------------------------------------------- generator

  /** Deterministic plan from a seed (java.util.Random LCG is specified,
    * so seeds reproduce across JVMs). */
  def gen(seed: Long): Pl = {
    val rnd = new Random(seed)
    val t0 = Vector("nation", "customer", "orders", "supplier",
      "part")(rnd.nextInt(5))
    var p: Pl = Scan(t0)
    val used = mutable.Set(t0)
    var explodes = 0
    var windows = 0
    val nOps = 2 + rnd.nextInt(5)
    var step = 0
    while (step < nOps) {
      p = genStep(rnd, p, used, step, explodes, windows) match {
        case (q, e, w) => explodes = e; windows = w; q
      }
      step += 1
    }
    p
  }

  private def genStep(rnd: Random, p: Pl, used: mutable.Set[String],
                      step: Int, explodes0: Int,
                      windows0: Int): (Pl, Int, Int) = {
    var explodes = explodes0
    var windows = windows0
    val sch = p.schema
    val joinable = sch.collectFirst {
      case Cl(n, TL) if fkEdges.contains(n) && !used(fkEdges(n)._1) => n
    }
    val longCols = sch.filter(_.typ == TL)
    val roll = rnd.nextInt(100)
    val q: Pl =
      if (roll < 22) Filt(p, genPred(rnd, sch, 2))
      else if (roll < 25 && longCols.nonEmpty) {
        // scalar-subquery filter: compare a long expression against a
        // keyless aggregate of an independent bounded scan
        val t2 = Vector("nation", "region", "customer", "supplier",
          "part")(rnd.nextInt(5))
        val sch2 = tableSchemas(t2)
        val lc2 = sch2.filter(_.typ == TL)
        val inner: Pl =
          if (rnd.nextBoolean()) Filt(Scan(t2), genPred(rnd, sch2, 1))
          else Scan(t2)
        val ag: Ag = rnd.nextInt(4) match {
          case 0 => CntAll
          case 1 => SumL(lc2(rnd.nextInt(lc2.size)).name)
          case 2 => MinA(lc2(rnd.nextInt(lc2.size)).name, TL)
          case _ => MaxA(lc2(rnd.nextInt(lc2.size)).name, TL)
        }
        val op = Vector("<", "<=", ">", ">=", "<>")(rnd.nextInt(5))
        FiltSub(p, genEx(rnd, sch, TL, 1, step, 17), op,
          Agg(inner, Vector.empty, Vector(s"sq$step" -> ag)))
      } else if (roll < 25) Filt(p, genPred(rnd, sch, 2))
      else if (roll < 45) genProj(rnd, p, step)
      else if (roll < 65 && joinable.isDefined) {
        val lk = joinable.get
        val (tbl, rk) = fkEdges(lk)
        used += tbl
        val how =
          Vector("inner", "left", "semi", "anti", "full")(rnd.nextInt(5))
        Jn(p, Scan(tbl), lk, rk, how)
      } else if (roll < 77) genAgg(rnd, p, step)
      else if (roll < 87 && sch.size >= 2 && windows < 2) {
        windows += 1
        val part = sch(rnd.nextInt(sch.size))
        val rest = sch.filterNot(_ == part)
        val ord = rest(rnd.nextInt(rest.size))
        val funs =
          if (ord.typ == TL)
            Vector("rank", "dense_rank", "cnt", "rsum", "rsumb",
              "rsrows")
          else Vector("rank", "dense_rank", "cnt")
        val fun = funs(rnd.nextInt(funs.size))
        val bound =
          if (fun == "rsumb") 10L + rnd.nextInt(491)
          else if (fun == "rsrows") 1L + rnd.nextInt(5)
          else 0L
        Wnd(p, s"w$step", fun, part, ord, rnd.nextBoolean(), bound)
      } else if (roll < 91 && longCols.nonEmpty && explodes < 2) {
        explodes += 1
        val a = AMod(Ref(longCols(rnd.nextInt(longCols.size)).name, TL),
          7 + rnd.nextInt(91))
        val b = genEx(rnd, sch, TL, 1, step, 90 + step)
        Expl(p, s"e$step", a, b)
      } else if (roll < 93) Lim(p, 5 + rnd.nextInt(46))
      else if (roll < 95) UnionA(p, Filt(p, genPred(rnd, sch, 1)))
      else if (roll < 97)
        SetOp(p, Filt(p, genPred(rnd, sch, 1)),
          if (rnd.nextBoolean()) "except" else "intersect")
      else Dist(p)
    (q, explodes, windows)
  }

  private def genProj(rnd: Random, p: Pl, step: Int): Proj = {
    val sch = p.schema
    // keep a random majority of existing columns (always ≥ 1) …
    val keepN = math.max(1, sch.size - rnd.nextInt(3))
    val kept = sch.take(keepN).map(c => c.name -> (Ref(c.name, c.typ): Ex))
    // … plus 1-2 computed expressions
    val extra = (0 until 1 + rnd.nextInt(2)).map { j =>
      val t = Vector(TL, TD, TS)(rnd.nextInt(3))
      s"x${step}_$j" -> genEx(rnd, sch, t, 3, step, j)
    }
    Proj(p, (kept ++ extra).toVector)
  }

  private def genAgg(rnd: Random, p: Pl, step: Int): Pl = {
    val sch = p.schema
    val nKeys = rnd.nextInt(3) min sch.size
    val keys = rnd.shuffle(sch.toList).take(nKeys).toVector
    // the grouping-set decision comes FIRST: conditional-agg
    // generation must know it (see the Roll scaladoc — Spark 4.1's
    // RemoveRedundantAliases bug with key-referencing CASE predicates
    // under grouping sets over a union)
    val roll = keys.nonEmpty && rnd.nextInt(4) == 0
    val rest = sch.filterNot(keys.contains)
    val pool = if (rest.nonEmpty) rest else sch
    val longCols = pool.filter(_.typ == TL)
    val caseCols = if (roll) rest else sch
    val caseLongs = caseCols.filter(_.typ == TL)
    val nAggs = 1 + rnd.nextInt(3)
    val aggs = (0 until nAggs).map { j =>
      val c = pool(rnd.nextInt(pool.size))
      val a: Ag = rnd.nextInt(8) match {
        case 0 => CntAll
        case 1 => Cnt(c.name)
        case 2 if longCols.nonEmpty =>
          SumL(longCols(rnd.nextInt(longCols.size)).name)
        case 3 if longCols.nonEmpty =>
          AvgL(longCols(rnd.nextInt(longCols.size)).name)
        case 4 => MinA(c.name, c.typ)
        case 5 => MaxA(c.name, c.typ)
        case 6 => CntD(c.name)
        case _ if caseLongs.nonEmpty =>
          SumCase(genPred(rnd, caseCols, 1),
            caseLongs(rnd.nextInt(caseLongs.size)).name,
            7L + rnd.nextInt(991))
        case _ => MaxA(c.name, c.typ)
      }
      s"a${step}_$j" -> a
    }.toVector
    // a quarter of keyed aggregates become grouping-set forms
    if (roll)
      Roll(p, keys, aggs, rnd.nextBoolean(),
        if (rnd.nextBoolean()) Some(s"g$step") else None)
    else {
      // … and a quarter of the rest become UTF8_LCASE-collated
      // single-key aggregates when the schema offers a string key and
      // a long mixer column (see CollAgg — the mixer manufactures the
      // case variance the collation has to merge)
      val tsCols = sch.filter(_.typ == TS)
      val tlCols = sch.filter(_.typ == TL)
      if (tsCols.nonEmpty && tlCols.nonEmpty && rnd.nextInt(4) == 0)
        CollAgg(p, tsCols(rnd.nextInt(tsCols.size)),
          tlCols(rnd.nextInt(tlCols.size)), aggs)
      else Agg(p, keys, aggs)
    }
  }

  private def genEx(rnd: Random, sch: Vector[Cl], t: Typ, depth: Int,
                    step: Int, salt: Int): Ex = {
    val ofT = sch.filter(_.typ == t)
    def leaf(): Ex =
      if (ofT.nonEmpty && rnd.nextInt(4) > 0) {
        val c = ofT(rnd.nextInt(ofT.size))
        Ref(c.name, t)
      } else genLit(rnd, t, None)
    if (depth <= 0) leaf()
    else t match {
      case TL => rnd.nextInt(6) match {
        case 0 | 1 =>
          AMod(Bin(Vector("+", "-", "*")(rnd.nextInt(3)),
            genEx(rnd, sch, TL, depth - 1, step, salt),
            genEx(rnd, sch, TL, depth - 1, step, salt + 1)),
            7 + rnd.nextInt(991))
        case 2 =>
          val a = leaf()
          CoalE(NullIfE(a, genLitFor(rnd, a)), genLit(rnd, TL, None))
        case 3 => IfE(genPred(rnd, sch, 1),
          genEx(rnd, sch, TL, depth - 1, step, salt),
          genEx(rnd, sch, TL, depth - 1, step, salt + 1))
        case 4 if sch.exists(_.typ == TS) =>
          LenE(genEx(rnd, sch, TS, depth - 1, step, salt))
        case 5 => VarE(genEx(rnd, sch, TL, depth - 1, step, salt))
        case _ => leaf()
      }
      case TD => rnd.nextInt(5) match {
        // + and - only: a double multiply can mint -0.0 (zero value ×
        // negative), which Spark normalizes in keys, DuckDB groups by
        // IEEE ==, and boxed equality distinguishes — three different
        // DISTINCT/group semantics. Sums of non-zero-able operands
        // only ever produce +0.0.
        case 0 | 1 => Bin(Vector("+", "-")(rnd.nextInt(2)),
          genEx(rnd, sch, TD, depth - 1, step, salt),
          genEx(rnd, sch, TD, depth - 1, step, salt + 1))
        case 2 => CastD(genEx(rnd, sch, TL, depth - 1, step, salt))
        case 3 => IfE(genPred(rnd, sch, 1),
          genEx(rnd, sch, TD, depth - 1, step, salt),
          genEx(rnd, sch, TD, depth - 1, step, salt + 1))
        case _ => leaf()
      }
      case TS => rnd.nextInt(6) match {
        case 0 => UpperE(genEx(rnd, sch, TS, depth - 1, step, salt))
        case 1 => SubstrE(genEx(rnd, sch, TS, depth - 1, step, salt),
          1 + rnd.nextInt(3), 1 + rnd.nextInt(6))
        case 2 => ConcatE(genEx(rnd, sch, TS, depth - 1, step, salt),
          genEx(rnd, sch, TS, depth - 1, step, salt + 1))
        case 3 =>
          val a = leaf()
          CoalE(NullIfE(a, genLitFor(rnd, a)), genLit(rnd, TS, None))
        case 4 => IfE(genPred(rnd, sch, 1),
          genEx(rnd, sch, TS, depth - 1, step, salt),
          genEx(rnd, sch, TS, depth - 1, step, salt + 1))
        case 5 => VarE(genEx(rnd, sch, TS, depth - 1, step, salt))
        case _ => leaf()
      }
    }
  }

  /** Literal drawn from the column's plausible pool when the expr is a
    * direct column reference — keeps NULLIF/comparisons selective. */
  private def genLitFor(rnd: Random, a: Ex): Ex = a match {
    case Ref(n, t) => genLit(rnd, t, Some(n))
    case e         => genLit(rnd, e.typ, None)
  }

  private def genLit(rnd: Random, t: Typ, colHint: Option[String]): Ex =
    t match {
      case TL =>
        val (lo, hi) = colHint.flatMap(longPools.get).getOrElse((0L, 100L))
        LL(lo + rnd.nextInt((hi - lo + 1).toInt).toLong)
      case TD =>
        val (lo, hi) =
          colHint.flatMap(doublePools.get).getOrElse((-100.0, 100.0))
        // two-decimal grid so literals render compactly and exactly;
        // never exactly zero (see the -0.0 note in genEx)
        val cents = (lo * 100).toLong +
          (rnd.nextDouble() * ((hi - lo) * 100)).toLong
        LD((if (cents == 0L) 1L else cents) / 100.0)
      case TS =>
        val pool =
          colHint.flatMap(stringPools.get).getOrElse(genericStrings)
        LS(pool(rnd.nextInt(pool.size)))
    }

  private def genPred(rnd: Random, sch: Vector[Cl], depth: Int): Pr = {
    def cmp(): Pr = {
      val c = sch(rnd.nextInt(sch.size))
      val op = Vector("=", "<>", "<", "<=", ">", ">=")(rnd.nextInt(6))
      val same = sch.filter(x => x.typ == c.typ && x.name != c.name)
      val rhs: Ex =
        if (same.nonEmpty && rnd.nextInt(4) == 0) {
          val o = same(rnd.nextInt(same.size))
          Ref(o.name, o.typ)
        } else genLit(rnd, c.typ, Some(c.name))
      Cmp(op, Ref(c.name, c.typ), rhs)
    }
    if (depth <= 0) cmp()
    else rnd.nextInt(9) match {
      case 0 => AndP(genPred(rnd, sch, depth - 1),
        genPred(rnd, sch, depth - 1))
      case 1 => OrP(genPred(rnd, sch, depth - 1),
        genPred(rnd, sch, depth - 1))
      case 2 => NotP(genPred(rnd, sch, depth - 1))
      case 3 =>
        val c = sch(rnd.nextInt(sch.size))
        IsNull(NullIfE(Ref(c.name, c.typ),
          genLit(rnd, c.typ, Some(c.name))), rnd.nextBoolean())
      case 4 =>
        // LHS wrapped in nullif so the null arm of the two-valued
        // comparison is actually exercised, not just reachable
        val c = sch(rnd.nextInt(sch.size))
        NsEq(NullIfE(Ref(c.name, c.typ), genLit(rnd, c.typ, Some(c.name))),
          genLit(rnd, c.typ, Some(c.name)), rnd.nextBoolean())
      case 5 =>
        val c = sch(rnd.nextInt(sch.size))
        val n = 2 + rnd.nextInt(3)
        InP(Ref(c.name, c.typ),
          Vector.fill(n)(genLit(rnd, c.typ, Some(c.name))))
      case 6 =>
        val ts = sch.filter(_.typ == TS)
        if (ts.isEmpty) cmp()
        else {
          val c = ts(rnd.nextInt(ts.size))
          val pool = stringPools.getOrElse(c.name, genericStrings)
          // letters-and-spaces fragment only: `_`/`#`/digits in pool
          // values are LIKE metacharacters or noise we keep out of
          // patterns so no escaping logic can diverge across backends
          val letters = pool(rnd.nextInt(pool.size))
            .filter(ch => ch.isLetter || ch == ' ')
          val frag =
            if (letters.isEmpty) "A"
            else {
              val i = rnd.nextInt(letters.length)
              letters.substring(i,
                math.min(letters.length, i + 1 + rnd.nextInt(3)))
            }
          LikeP(Ref(c.name, c.typ), rnd.nextInt(3) match {
            case 0 => frag + "%"
            case 1 => "%" + frag + "%"
            case _ => "%" + frag
          })
        }
      case _ => cmp()
    }
  }

  // ---------------------------------------------------------- Spark backend

  def toDF(s: SparkSession, dir: String, p: Pl): DataFrame = p match {
    case Scan(t) =>
      val base = Tables.table(s, dir, t)
      val cols = tableSchemas(t).map { c =>
        (if (c.typ == TL) col(c.name).cast("long") else col(c.name))
          .as(c.name)
      }
      val sel = base.select(cols: _*)
      bounds.get(t) match {
        case Some((k, b)) => sel.filter(col(k) <= b)
        case None         => sel
      }
    case Proj(in, outs) =>
      toDF(s, dir, in).select(outs.map { case (n, e) =>
        exCol(e).as(n)
      }: _*)
    case Filt(in, pr) => toDF(s, dir, in).filter(prCol(pr))
    case FiltSub(in, a, op, sub) =>
      val df = toDF(s, dir, in)
      // the keyless aggregate is a 1-row table: broadcast it across
      // the fact side — never collect() the scalar to the driver
      val sc = toDF(s, dir, sub).select(col(sub.schema.head.name).as("__sq"))
      df.crossJoin(broadcast(sc))
        .filter(cmpCols(op, exCol(a), col("__sq")))
        .drop("__sq")
    case Agg(in, keys, aggs) =>
      val df = toDF(s, dir, in)
      val acs = aggs.map { case (n, a) => agCol(a).as(n) }
      if (keys.isEmpty) df.agg(acs.head, acs.tail: _*)
      else df.groupBy(keys.map(k => col(k.name)): _*)
        .agg(acs.head, acs.tail: _*)
    case CollAgg(in, key, mix, aggs) =>
      val df = toDF(s, dir, in)
      val mixed = when(pmod(col(mix.name), lit(2L)) === 0,
        upper(col(key.name))).otherwise(col(key.name))
      val acs = aggs.map { case (n, a) => agCol(a).as(n) }
      df.groupBy(collate(mixed, "UTF8_LCASE").as("__ck"))
        .agg(acs.head, acs.tail: _*)
        .select(lower(col("__ck")).cast("string").as(key.name) +:
          aggs.map { case (n, _) => col(n) }: _*)
    case Roll(in, keys, aggs, cube, gid) =>
      val df = toDF(s, dir, in)
      val acs0 = aggs.map { case (n, a) => agCol(a).as(n) }
      val acs = gid match {
        case Some(g) => grouping_id().cast("long").as(g) +: acs0
        case None    => acs0
      }
      val kcols = keys.map(k => col(k.name))
      val g = if (cube) df.cube(kcols: _*) else df.rollup(kcols: _*)
      g.agg(acs.head, acs.tail: _*)
    case Jn(l, r, lk, rk, how) =>
      val sparkHow = how match {
        case "semi" => "left_semi"
        case "anti" => "left_anti"
        case h      => h
      }
      toDF(s, dir, l).join(toDF(s, dir, r), col(lk) === col(rk), sparkHow)
    case Dist(in) => toDF(s, dir, in).distinct()
    case Wnd(in, name, fun, part, ord, desc, bound) =>
      val df = toDF(s, dir, in)
      val oc = coalesce(col(ord.name), sentinelCol(ord.typ))
      val c = fun match {
        case "cnt" =>
          count(lit(1)).over(Window.partitionBy(col(part.name)))
        case "rsum" =>
          val w = Window.partitionBy(col(part.name))
            .orderBy(if (desc) oc.desc else oc.asc)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
          sum(abs(col(ord.name)) % lit(1000L)).over(w).cast("long")
        case "rsumb" =>
          val w = Window.partitionBy(col(part.name))
            .orderBy(if (desc) oc.desc else oc.asc)
            .rangeBetween(-bound, 0L)
          sum(abs(col(ord.name)) % lit(1000L)).over(w).cast("long")
        case "rsrows" =>
          // ROWS frame under a TOTAL order: ord first, then every
          // input column ASC NULLS FIRST (see the Wnd scaladoc)
          val tiebreak = in.schema.map(c => col(c.name).asc_nulls_first)
          val w = Window.partitionBy(col(part.name))
            .orderBy((if (desc) oc.desc else oc.asc) +: tiebreak: _*)
            .rowsBetween(-bound, 0L)
          sum(abs(col(ord.name)) % lit(1000L)).over(w).cast("long")
        case f =>
          val w = Window.partitionBy(col(part.name))
            .orderBy(if (desc) oc.desc else oc.asc)
          (if (f == "rank") rank() else dense_rank()).over(w).cast("long")
      }
      df.withColumn(name, c)
    case Expl(in, name, a, b) =>
      toDF(s, dir, in)
        .select(col("*"), explode(array(exCol(a), exCol(b))).as(name))
    case Lim(in, n) =>
      val df = toDF(s, dir, in)
      df.orderBy(in.schema.map(c => col(c.name).asc_nulls_first): _*)
        .limit(n)
    case UnionA(l, r) => toDF(s, dir, l).unionByName(toDF(s, dir, r))
    case SetOp(l, r, op) =>
      val (ld, rd) = (toDF(s, dir, l), toDF(s, dir, r))
      if (op == "except") ld.except(rd) else ld.intersect(rd)
  }

  private def sentinelCol(t: Typ): Column = t match {
    case TL => lit(-1000000000000000L)
    case TD => lit(-1.0e15)
    case TS => lit("")
  }

  private def exCol(e: Ex): Column = e match {
    case Ref(n, _)      => col(n)
    case LL(v)          => lit(v)
    case LD(v)          => lit(v)
    case LS(v)          => lit(v)
    case AMod(a, k)     => abs(exCol(a)) % lit(k)
    case Bin("+", a, b) => exCol(a) + exCol(b)
    case Bin("-", a, b) => exCol(a) - exCol(b)
    case Bin(_, a, b)   => exCol(a) * exCol(b)
    case NullIfE(a, b)  => nullif(exCol(a), exCol(b))
    case CoalE(a, b)    => coalesce(exCol(a), exCol(b))
    case IfE(p, t, el)  => when(prCol(p), exCol(t)).otherwise(exCol(el))
    case UpperE(a)      => upper(exCol(a))
    case SubstrE(a, p, l) => substring(exCol(a), p, l)
    case ConcatE(a, b)  => concat(exCol(a), exCol(b))
    case LenE(a)        => length(exCol(a)).cast("long")
    case CastD(a)       => exCol(a).cast("double")
    case VarE(a) =>
      // try_: Spark's to_json drops null struct fields, so a NULL
      // value becomes an ABSENT path — strict variant_get would error
      // where the identity must yield NULL
      try_variant_get(
        parse_json(to_json(struct(exCol(a).as("k")))), "$.k",
        if (a.typ == TL) "bigint" else "string")
  }

  private def cmpCols(op: String, a: Column, b: Column): Column =
    op match {
      case "="  => a === b
      case "<>" => a =!= b
      case "<"  => a < b
      case "<=" => a <= b
      case ">"  => a > b
      case _    => a >= b
    }

  private def prCol(p: Pr): Column = p match {
    case Cmp(op, a, b)   => cmpCols(op, exCol(a), exCol(b))
    case IsNull(a, neg)  =>
      if (neg) exCol(a).isNotNull else exCol(a).isNull
    case AndP(a, b)      => prCol(a) && prCol(b)
    case OrP(a, b)       => prCol(a) || prCol(b)
    case NotP(a)         => !prCol(a)
    case NsEq(a, b, neg) =>
      val e = exCol(a) <=> exCol(b); if (neg) !e else e
    case InP(a, lits)    =>
      exCol(a).isin(lits.map {
        case LL(v) => v; case LD(v) => v; case LS(v) => v
        case other => sys.error(s"non-literal IN element: $other")
      }: _*)
    case LikeP(a, pat)   => exCol(a).like(pat)
  }

  private def agCol(a: Ag): Column = a match {
    case CntAll     => count(lit(1))
    case Cnt(c)     => count(col(c))
    case SumL(c)    => sum(col(c))
    case AvgL(c)    => avg(col(c))
    case MinA(c, _) => min(col(c))
    case MaxA(c, _) => max(col(c))
    case CntD(c)    => count_distinct(col(c))
    case SumCase(p, c, k) =>
      sum(when(prCol(p), abs(col(c)) % lit(k)).otherwise(lit(0L)))
  }

  // ------------------------------------------------------------ SQL backend

  def toSql(p: Pl): String = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    sqlOf(p, n)
  }

  private def sqlOf(p: Pl, c: java.util.concurrent.atomic.AtomicInteger)
  : String = {
    def al() = s"t${c.getAndIncrement()}"
    p match {
      case Scan(t) =>
        val cols = tableSchemas(t).map { cl =>
          if (cl.typ == TL) s"CAST(${cl.name} AS BIGINT) AS ${cl.name}"
          else cl.name
        }.mkString(", ")
        val where = bounds.get(t)
          .map { case (k, b) => s" WHERE $k <= $b" }.getOrElse("")
        s"SELECT $cols FROM $t$where"
      case Proj(in, outs) =>
        val sub = sqlOf(in, c)
        val cols = outs.map { case (nm, e) => s"${exSql(e)} AS $nm" }
          .mkString(", ")
        s"SELECT $cols FROM ($sub) ${al()}"
      case Filt(in, pr) =>
        val sub = sqlOf(in, c)
        s"SELECT * FROM ($sub) ${al()} WHERE ${prSql(pr)}"
      case FiltSub(in, a, op, sq) =>
        val sub = sqlOf(in, c)
        val sqs = sqlOf(sq, c)
        s"SELECT * FROM ($sub) ${al()} " +
          s"WHERE (${exSql(a)} $op (SELECT ${sq.schema.head.name} " +
          s"FROM ($sqs) ${al()}))"
      case Agg(in, keys, aggs) =>
        val sub = sqlOf(in, c)
        val ks = keys.map(_.name)
        val as = aggs.map { case (nm, a) => s"${agSql(a)} AS $nm" }
        val cols = (ks ++ as).mkString(", ")
        val grp =
          if (ks.isEmpty) "" else s" GROUP BY ${ks.mkString(", ")}"
        s"SELECT $cols FROM ($sub) ${al()}$grp"
      case CollAgg(in, key, mix, aggs) =>
        val sub = sqlOf(in, c)
        // pmod-safe parity (mix can be any long); NULL mix falls to
        // the ELSE branch on both engines
        val ke = s"lower(CASE WHEN ((${mix.name} % 2) + 2) % 2 = 0 " +
          s"THEN upper(${key.name}) ELSE ${key.name} END)"
        val as = aggs.map { case (nm, a) => s"${agSql(a)} AS $nm" }
        s"SELECT $ke AS ${key.name}, ${as.mkString(", ")} " +
          s"FROM ($sub) ${al()} GROUP BY 1"
      case Roll(in, keys, aggs, cube, gid) =>
        val sub = sqlOf(in, c)
        val ks = keys.map(_.name)
        val gs = gid.toSeq.map(g =>
          s"CAST(GROUPING(${ks.mkString(", ")}) AS BIGINT) AS $g")
        val as = aggs.map { case (nm, a) => s"${agSql(a)} AS $nm" }
        val kw = if (cube) "CUBE" else "ROLLUP"
        // HAVING count(*) > 0: no-op on non-empty input; strips the
        // standard's empty-input grand-total row Spark never emits
        s"SELECT ${(ks ++ gs ++ as).mkString(", ")} FROM ($sub) ${al()} " +
          s"GROUP BY $kw (${ks.mkString(", ")}) HAVING count(*) > 0"
      case Jn(l, r, lk, rk, how) =>
        val ls = sqlOf(l, c)
        val rs = sqlOf(r, c)
        val (la, ra) = (al(), al())
        how match {
          case "semi" | "anti" =>
            val not = if (how == "anti") "NOT " else ""
            s"SELECT * FROM ($ls) $la WHERE ${not}EXISTS " +
              s"(SELECT 1 FROM ($rs) $ra WHERE $la.$lk = $ra.$rk)"
          case h =>
            val kw = h match {
              case "left" => "LEFT JOIN"
              case "full" => "FULL JOIN"
              case _      => "JOIN"
            }
            val cols = (l.schema.map(x => s"$la.${x.name}") ++
              r.schema.map(x => s"$ra.${x.name}")).mkString(", ")
            s"SELECT $cols FROM ($ls) $la $kw ($rs) $ra " +
              s"ON $la.$lk = $ra.$rk"
        }
      case Dist(in) =>
        val sub = sqlOf(in, c)
        s"SELECT DISTINCT * FROM ($sub) ${al()}"
      case Wnd(in, name, fun, part, ord, desc, bound) =>
        val sub = sqlOf(in, c)
        val w = wndSql(in, fun, part, ord, desc, bound)
        s"SELECT *, $w AS $name FROM ($sub) ${al()}"
      case Expl(in, name, a, b) =>
        val sub = sqlOf(in, c)
        s"SELECT *, unnest([${exSql(a)}, ${exSql(b)}]) AS $name " +
          s"FROM ($sub) ${al()}"
      case Lim(in, n) =>
        val sub = sqlOf(in, c)
        val ord = in.schema.map(_.name + " NULLS FIRST").mkString(", ")
        s"SELECT * FROM ($sub) ${al()} ORDER BY $ord LIMIT $n"
      case UnionA(l, r) =>
        val ls = sqlOf(l, c)
        val rs = sqlOf(r, c)
        s"SELECT * FROM ($ls) ${al()} UNION ALL " +
          s"SELECT * FROM ($rs) ${al()}"
      case SetOp(l, r, op) =>
        val ls = sqlOf(l, c)
        val rs = sqlOf(r, c)
        val kw = if (op == "except") "EXCEPT" else "INTERSECT"
        s"SELECT * FROM ($ls) ${al()} $kw SELECT * FROM ($rs) ${al()}"
    }
  }

  private def sentinelSql(t: Typ): String = t match {
    case TL => "-1000000000000000"
    case TD => "-1.0e15"
    case TS => "''"
  }

  /** Window-call SQL, shared by the DuckDB subquery rendering and the
    * Spark pipe EXTEND stage (the text is dialect-neutral). */
  private def wndSql(in: Pl, fun: String, part: Cl, ord: Cl,
      desc: Boolean, bound: Long): String = {
    val oc = s"COALESCE(${ord.name}, ${sentinelSql(ord.typ)})"
    val dir = if (desc) " DESC" else ""
    fun match {
      case "cnt" => s"COUNT(*) OVER (PARTITION BY ${part.name})"
      case "rsum" =>
        s"CAST(SUM(abs(${ord.name}) % 1000) OVER " +
          s"(PARTITION BY ${part.name} ORDER BY $oc$dir " +
          "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "AS BIGINT)"
      case "rsumb" =>
        s"CAST(SUM(abs(${ord.name}) % 1000) OVER " +
          s"(PARTITION BY ${part.name} ORDER BY $oc$dir " +
          s"RANGE BETWEEN $bound PRECEDING AND CURRENT ROW) " +
          "AS BIGINT)"
      case "rsrows" =>
        val tiebreak = in.schema
          .map(x => s"${x.name} ASC NULLS FIRST").mkString(", ")
        s"CAST(SUM(abs(${ord.name}) % 1000) OVER " +
          s"(PARTITION BY ${part.name} ORDER BY $oc$dir, $tiebreak " +
          s"ROWS BETWEEN $bound PRECEDING AND CURRENT ROW) " +
          "AS BIGINT)"
      case f =>
        val fn = if (f == "rank") "rank()" else "dense_rank()"
        s"CAST($fn OVER (PARTITION BY ${part.name} " +
          s"ORDER BY $oc$dir) AS BIGINT)"
    }
  }

  /** Spark SQL-pipe rendering (the `|>` chains of SPARK-49555) for
    * LINEAR plans: Scan → WHERE / SELECT / EXTEND / AGGREGATE /
    * ORDER-LIMIT chains map one pipe stage per relational operator.
    * Operators with no pipe stage (joins, grouping sets, set ops,
    * explode, distinct, scalar-subquery filters) return None. Pipe is
    * parser surface, not semantics, so the rendered chain must produce
    * the SAME multiset as toDF and the interpreter — FuzzSpec's pipe
    * differential asserts exactly that over the seed stream. Scans
    * read the session temp views registered by [[pipeViews]]. */
  def toPipe(p: Pl): Option[String] = p match {
    case Scan(t) =>
      val cols = tableSchemas(t).map { cl =>
        if (cl.typ == TL) s"CAST(${cl.name} AS BIGINT) AS ${cl.name}"
        else cl.name
      }.mkString(", ")
      val bound = bounds.get(t)
        .map { case (k, b) => s"\n|> WHERE $k <= $b" }.getOrElse("")
      Some(s"FROM $t$bound\n|> SELECT $cols")
    case Filt(in, pr) =>
      toPipe(in).map(_ + s"\n|> WHERE ${prSql(pr, spark = true)}")
    case Proj(in, outs) =>
      toPipe(in).map(_ + "\n|> SELECT " + outs.map { case (n, e) =>
        s"${exSql(e, spark = true)} AS $n"
      }.mkString(", "))
    case Agg(in, keys, aggs) =>
      toPipe(in).map { base =>
        val as = aggs.map { case (n, a) =>
          s"${agSql(a, spark = true)} AS $n"
        }.mkString(", ")
        val grp =
          if (keys.isEmpty) ""
          else s" GROUP BY ${keys.map(_.name).mkString(", ")}"
        base + s"\n|> AGGREGATE $as$grp"
      }
    case Wnd(in, name, fun, part, ord, desc, bound) =>
      toPipe(in).map(_ +
        s"\n|> EXTEND ${wndSql(in, fun, part, ord, desc, bound)} AS $name")
    case Lim(in, n) =>
      toPipe(in).map { base =>
        val ord = in.schema.map(_.name + " ASC NULLS FIRST")
          .mkString(", ")
        base + s"\n|> ORDER BY $ord\n|> LIMIT $n"
      }
    case _ => None
  }

  /** EXECUTE IMMEDIATE rendering (VERDICT r10 item 4) for the SAME
    * linear subset [[toPipe]] covers: nested plain Spark SQL with the
    * scan's key bound lifted into a NAMED PARAMETER (`:bnd`), returned
    * as (sqlText, boundValue). The caller wraps it as
    * `EXECUTE IMMEDIATE '<text>' USING <bound>L AS bnd` — the dynamic-
    * SQL + parameter-binding session surface (`m_exec_immediate`'s
    * API), fuzzed instead of hand-pinned: same plan, FOURTH entry path
    * beside DataFrame / interpreter / pipe, so the wrapper can never
    * change results. Linear chains only (one scan → at most one
    * parameter); plans over unbounded tables carry no parameter.
    */
  def toExecImmediate(p: Pl): Option[(String, Option[Long])] = {
    val c = new java.util.concurrent.atomic.AtomicInteger(0)
    def al() = s"t${c.getAndIncrement()}"
    def render(q: Pl): Option[String] = q match {
      case Scan(t) =>
        val cols = tableSchemas(t).map { cl =>
          if (cl.typ == TL) s"CAST(${cl.name} AS BIGINT) AS ${cl.name}"
          else cl.name
        }.mkString(", ")
        val where = bounds.get(t)
          .map { case (k, _) => s" WHERE $k <= :bnd" }.getOrElse("")
        Some(s"SELECT $cols FROM $t$where")
      case Filt(in, pr) => render(in).map(sub =>
        s"SELECT * FROM ($sub) ${al()} WHERE ${prSql(pr, spark = true)}")
      case Proj(in, outs) => render(in).map { sub =>
        val cols = outs.map { case (nm, e) =>
          s"${exSql(e, spark = true)} AS $nm"
        }.mkString(", ")
        s"SELECT $cols FROM ($sub) ${al()}"
      }
      case Agg(in, keys, aggs) => render(in).map { sub =>
        val ks = keys.map(_.name)
        val as = aggs.map { case (nm, a) =>
          s"${agSql(a, spark = true)} AS $nm"
        }
        val grp =
          if (ks.isEmpty) "" else s" GROUP BY ${ks.mkString(", ")}"
        s"SELECT ${(ks ++ as).mkString(", ")} FROM ($sub) ${al()}$grp"
      }
      case Wnd(in, name, fun, part, ord, desc, bound) => render(in).map {
        sub =>
          s"SELECT *, ${wndSql(in, fun, part, ord, desc, bound)} " +
            s"AS $name FROM ($sub) ${al()}"
      }
      case Lim(in, n) => render(in).map { sub =>
        val ord = in.schema.map(_.name + " ASC NULLS FIRST")
          .mkString(", ")
        s"SELECT * FROM ($sub) ${al()} ORDER BY $ord LIMIT $n"
      }
      case _ => None
    }
    def scanBound(q: Pl): Option[Long] = q match {
      case Scan(t)     => bounds.get(t).map(_._2)
      case Filt(in, _) => scanBound(in)
      case Proj(in, _) => scanBound(in)
      case Agg(in, _, _) => scanBound(in)
      case Wnd(in, _, _, _, _, _, _) => scanBound(in)
      case Lim(in, _)  => scanBound(in)
      case _           => None
    }
    render(p).map(sql => (sql, scanBound(p)))
  }

  /** Temp views for [[toPipe]]'s FROM clauses — the raw fixture tables
    * under their bare names (bounds/casts are pipe stages). */
  def pipeViews(s: SparkSession, d: String): Unit =
    tableSchemas.keys.foreach(t =>
      Tables.table(s, d, t).createOrReplaceTempView(t))

  private def litD(v: Double): String = {
    // e-notation forces DOUBLE in DuckDB (plain decimals are DECIMAL)
    val s = v.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }

  private def exSql(e: Ex, spark: Boolean = false): String = e match {
    case Ref(n, _)     => n
    // Spark parses a bare integer literal as INT, so a pure-literal
    // expression (e.g. coalesce(nullif(7, 82), 64)) would surface as an
    // INT column where the DataFrame and interpreter sides are LONG —
    // the L suffix pins BIGINT. DuckDB literals are already BIGINT-kind.
    case LL(v)         => if (spark) s"${v}L" else v.toString
    case LD(v)         => litD(v)
    case LS(v)         => "'" + v.replace("'", "''") + "'"
    case AMod(a, k)    => s"(abs(${exSql(a, spark)}) % $k)"
    case Bin(op, a, b) => s"(${exSql(a, spark)} $op ${exSql(b, spark)})"
    case NullIfE(a, b) => s"nullif(${exSql(a, spark)}, ${exSql(b, spark)})"
    case CoalE(a, b)   => s"coalesce(${exSql(a, spark)}, ${exSql(b, spark)})"
    case IfE(p, t, el) =>
      s"(CASE WHEN ${prSql(p, spark)} THEN ${exSql(t, spark)} ELSE ${exSql(el, spark)} END)"
    case UpperE(a)     => s"upper(${exSql(a, spark)})"
    case SubstrE(a, p, l) => s"substr(${exSql(a, spark)}, $p, $l)"
    case ConcatE(a, b) => s"(${exSql(a, spark)} || ${exSql(b, spark)})"
    case LenE(a)       => s"CAST(length(${exSql(a, spark)}) AS BIGINT)"
    case CastD(a)      => s"CAST(${exSql(a, spark)} AS DOUBLE)"
    case VarE(a) =>
      // dialect fork: Spark renders the genuine VARIANT round trip;
      // DuckDB has no VARIANT, so its side is the same round trip in
      // JSON functions (json_extract_string is NULL for a JSON null or
      // absent path) — cast back for the long case
      if (spark) {
        val t = if (a.typ == TL) "bigint" else "string"
        s"try_variant_get(parse_json(to_json(named_struct('k', " +
          s"${exSql(a, spark)}))), '$$.k', '$t')"
      } else {
        val ex =
          s"json_extract_string(to_json({'k': ${exSql(a, spark)}}), '$$.k')"
        if (a.typ == TL) s"CAST($ex AS BIGINT)" else ex
      }
  }

  private def prSql(p: Pr, spark: Boolean = false): String = p match {
    case Cmp(op, a, b) => s"(${exSql(a, spark)} $op ${exSql(b, spark)})"
    case IsNull(a, neg) =>
      s"(${exSql(a, spark)} IS ${if (neg) "NOT " else ""}NULL)"
    case AndP(a, b) => s"(${prSql(a, spark)} AND ${prSql(b, spark)})"
    case OrP(a, b)  => s"(${prSql(a, spark)} OR ${prSql(b, spark)})"
    case NotP(a)    => s"(NOT ${prSql(a, spark)})"
    case NsEq(a, b, neg) =>
      // Spark's null-safe equality spelling is <=>; DuckDB's is the
      // standard IS NOT DISTINCT FROM
      if (spark) {
        val e = s"(${exSql(a, spark)} <=> ${exSql(b, spark)})"
        if (neg) s"(NOT $e)" else e
      } else
        s"(${exSql(a, spark)} IS ${if (neg) "" else "NOT "}DISTINCT FROM ${exSql(b, spark)})"
    case InP(a, lits) =>
      s"(${exSql(a, spark)} IN (${lits.map(exSql(_, spark)).mkString(", ")}))"
    case LikeP(a, pat) => s"(${exSql(a, spark)} LIKE '$pat')"
  }

  private def agSql(a: Ag, spark: Boolean = false): String = a match {
    case CntAll     => "CAST(count(*) AS BIGINT)"
    case Cnt(c)     => s"CAST(count($c) AS BIGINT)"
    case SumL(c)    => s"CAST(sum($c) AS BIGINT)"
    case AvgL(c)    => s"avg($c)"
    case MinA(c, _) => s"min($c)"
    case MaxA(c, _) => s"max($c)"
    case CntD(c)    => s"CAST(count(DISTINCT $c) AS BIGINT)"
    case SumCase(p, c, k) =>
      s"CAST(sum(CASE WHEN ${prSql(p, spark)} THEN (abs($c) % $k) " +
        "ELSE 0 END) AS BIGINT)"
  }

  // ------------------------------------------------- reference interpreter

  type Row = Vector[Any] // null | java.lang.Long | java.lang.Double | String

  /** Evaluate the plan over collection semantics. `base` supplies the rows
    * of a bounded base scan (schema order = tableSchemas). Independent of
    * Catalyst: explicit 3-valued logic, null-key joins, null grouping. */
  def interp(p: Pl, base: String => Seq[Row]): Seq[Row] = p match {
    case Scan(t) => base(t)
    case Proj(in, outs) =>
      val rows = interp(in, base)
      val idx = index(in.schema)
      rows.map(r => outs.map { case (_, e) => evalEx(e, r, idx) }.toVector)
    case Filt(in, pr) =>
      val idx = index(in.schema)
      interp(in, base).filter(r => evalPr(pr, r, idx).contains(true))
    case FiltSub(in, a, op, sub) =>
      // keyless aggregate: exactly one row, one column, possibly null
      val sv = interp(sub, base).head.head
      if (sv == null) Seq.empty // UNKNOWN for every row
      else {
        val idx = index(in.schema)
        val litV = LL(sv.asInstanceOf[Long])
        interp(in, base)
          .filter(r => evalPr(Cmp(op, a, litV), r, idx).contains(true))
      }
    case Agg(in, keys, aggs) =>
      val rows = interp(in, base)
      val idx = index(in.schema)
      val groups: Seq[(Vector[Any], Seq[Row])] =
        if (keys.isEmpty) Seq(Vector.empty[Any] -> rows)
        else rows.groupBy(r => keys.map(k => r(idx(k.name))))
          .toSeq.map { case (k, v) => (k, v) }
      groups.map { case (k, rs) =>
        k ++ aggs.map { case (_, a) => evalAg(a, rs, idx) }
      }
    case CollAgg(in, key, _, aggs) =>
      // lower∘upper = lower on the fuzzer's ASCII-only strings, so the
      // mixed key normalizes to lower(key) independent of the mixer
      val rows = interp(in, base)
      val idx = index(in.schema)
      val ki = idx(key.name)
      rows.groupBy { r =>
        val k = r(ki)
        if (k == null) null
        // Locale.ROOT: Spark's lower() and DuckDB's lower() are both
        // locale-independent; a Turkish default JVM locale would
        // otherwise lowercase 'I' to U+0131 and break the differential
        else k.asInstanceOf[String]
          .toLowerCase(java.util.Locale.ROOT)
      }.toSeq.map { case (k, rs) =>
        Vector[Any](k) ++ aggs.map { case (_, a) => evalAg(a, rs, idx) }
      }
    case Jn(l, r, lk, rk, how) =>
      val lrows = interp(l, base)
      val rrows = interp(r, base)
      val li = index(l.schema)
      val ri = index(r.schema)
      // null keys never match. Lazy because the "full" branch never
      // touches this value-keyed map — it builds its own POSITIONAL
      // grouping over rrows.zipWithIndex (duplicate right rows must be
      // matched by index), so forcing rmap there would be pure waste
      lazy val rmap = rrows.filter(_(ri(rk)) != null)
        .groupBy(row => row(ri(rk)))
      val lkIx = li(lk)
      how match {
        case "inner" => lrows.flatMap { lr =>
          val k = lr(lkIx)
          if (k == null) Nil
          else rmap.getOrElse(k, Nil).map(rr => lr ++ rr)
        }
        case "left" => lrows.flatMap { lr =>
          val k = lr(lkIx)
          val ms = if (k == null) Nil else rmap.getOrElse(k, Nil)
          if (ms.isEmpty) Seq(lr ++ Vector.fill[Any](r.schema.size)(null))
          else ms.map(rr => lr ++ rr)
        }
        case "full" =>
          // positional matched-set: right rows can be duplicates, so
          // match by index, not by value
          val rIndexed = rrows.zipWithIndex
          val rmapIx = rIndexed.filter { case (row, _) => row(ri(rk)) != null }
            .groupBy { case (row, _) => row(ri(rk)) }
          val matched = mutable.Set.empty[Int]
          val leftSide = lrows.flatMap { lr =>
            val k = lr(lkIx)
            val ms = if (k == null) Nil else rmapIx.getOrElse(k, Nil)
            if (ms.isEmpty)
              Seq(lr ++ Vector.fill[Any](r.schema.size)(null))
            else ms.map { case (rr, i) => matched += i; lr ++ rr }
          }
          val rightSide = rIndexed.collect {
            case (rr, i) if !matched(i) =>
              Vector.fill[Any](l.schema.size)(null) ++ rr
          }
          leftSide ++ rightSide
        case "semi" => lrows.filter { lr =>
          val k = lr(lkIx); k != null && rmap.contains(k)
        }
        case _ => lrows.filter { lr => // anti: null key never matches → kept
          val k = lr(lkIx); k == null || !rmap.contains(k)
        }
      }
    case Roll(in, keys, aggs, cube, gid) =>
      val rows = interp(in, base)
      val idx = index(in.schema)
      val n = keys.size
      val sets: Seq[Set[Int]] =
        if (cube) (0 until (1 << n)).map(m =>
          (0 until n).filter(i => (m & (1 << i)) != 0).toSet)
        else (0 to n).map(i => (0 until i).toSet)
      sets.flatMap { s =>
        // grouping id: first listed key = most significant bit,
        // 1 = aggregated-away (not in this grouping set)
        val gidVal: Any =
          Long.box((0 until n).map(i =>
            if (s(i)) 0L else 1L << (n - 1 - i)).sum)
        // empty input → zero rows for EVERY grouping set, including
        // the empty one: Spark semantics, enforced on the SQL side by
        // the generated HAVING count(*) > 0 (see the Roll scaladoc)
        rows.groupBy { r =>
          keys.zipWithIndex.map { case (k, i) =>
            if (s(i)) r(idx(k.name)) else (null: Any)
          }
        }.toSeq.map { case (kv, rs) =>
          (if (gid.isDefined) kv :+ gidVal else kv) ++
            aggs.map { case (_, a) => evalAg(a, rs, idx) }
        }
      }
    case Dist(in) => interp(in, base).distinct
    case Wnd(in, _, fun, part, ord, desc, bound) =>
      val rows = interp(in, base)
      val idx = index(in.schema)
      val pIx = idx(part.name)
      val oIx = idx(ord.name)
      val sent: Any = ord.typ match {
        case TL => Long.box(-1000000000000000L)
        case TD => Double.box(-1.0e15)
        case TS => ""
      }
      def oVal(r: Row): Any = { val v = r(oIx); if (v == null) sent else v }
      val lt: (Any, Any) => Boolean = ord.typ match {
        case TL => (a, b) =>
          a.asInstanceOf[Long] < b.asInstanceOf[Long]
        case TD => (a, b) =>
          a.asInstanceOf[Double] < b.asInstanceOf[Double]
        case TS => (a, b) =>
          a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) < 0
      }
      def before(a: Any, b: Any): Boolean =
        if (desc) lt(b, a) else lt(a, b)
      rows.groupBy(_(pIx)).values.toSeq.flatMap { grp =>
        fun match {
          case "cnt" =>
            grp.map(r => r :+ Long.box(grp.size.toLong))
          case "rsum" =>
            // RANGE frame = predecessors + peers = every row NOT
            // strictly after the current one; SQL SUM skips nulls and
            // returns NULL for an all-null frame
            grp.map { r =>
              val v = oVal(r)
              val vals = grp.filter(o => !before(v, oVal(o)))
                .map(_(oIx)).filter(_ != null)
                .map(x => math.abs(x.asInstanceOf[Long]) % 1000L)
              r :+ (if (vals.isEmpty) null
                    else Long.box(vals.sum))
            }
          case "rsumb" =>
            // bounded value-range frame: offsets follow the ORDER
            // direction — [v-bound, v] ascending, [v, v+bound]
            // descending (ord is always TL here)
            grp.map { r =>
              val v = oVal(r).asInstanceOf[Long]
              val (lo, hi) =
                if (desc) (v, v + bound) else (v - bound, v)
              val vals = grp.filter { o =>
                val x = oVal(o).asInstanceOf[Long]
                x >= lo && x <= hi
              }.map(_(oIx)).filter(_ != null)
                .map(x => math.abs(x.asInstanceOf[Long]) % 1000L)
              r :+ (if (vals.isEmpty) null
                    else Long.box(vals.sum))
            }
          case "rsrows" =>
            // bounded ROWS frame under the total order (ord first,
            // then the full row ASC NULLS FIRST — see Wnd scaladoc)
            val sorted = grp.sortWith { (a, b) =>
              val (va, vb) = (oVal(a), oVal(b))
              if (va != vb) before(va, vb)
              else rowLt(in.schema, a, b)
            }
            sorted.zipWithIndex.map { case (r, i) =>
              val lo = math.max(0, i - bound.toInt)
              val vals = sorted.slice(lo, i + 1)
                .map(_(oIx)).filter(_ != null)
                .map(x => math.abs(x.asInstanceOf[Long]) % 1000L)
              r :+ (if (vals.isEmpty) null
                    else Long.box(vals.sum))
            }
          case "rank" =>
            grp.map { r =>
              val v = oVal(r)
              r :+ Long.box(1L + grp.count(o => before(oVal(o), v)))
            }
          case _ => // dense_rank
            grp.map { r =>
              val v = oVal(r)
              val distincts = grp.map(oVal).distinct
              r :+ Long.box(1L + distincts.count(o => before(o, v)))
            }
        }
      }
    case Expl(in, _, a, b) =>
      val idx = index(in.schema)
      interp(in, base).flatMap { r =>
        Seq(evalEx(a, r, idx), evalEx(b, r, idx)).map(v => r :+ v)
      }
    case Lim(in, n) =>
      val rows = interp(in, base)
      rows.sortWith((a, b) => rowLt(in.schema, a, b)).take(n)
    case UnionA(l, r) => interp(l, base) ++ interp(r, base)
    case SetOp(l, r, op) =>
      val rset = interp(r, base).toSet
      val ldist = interp(l, base).distinct
      if (op == "except") ldist.filterNot(rset.contains)
      else ldist.filter(rset.contains)
  }

  /** Total lexicographic row order: null first, then typed compare —
    * matches ASC NULLS FIRST over every column on both engines. */
  private def rowLt(sch: Vector[Cl], a: Row, b: Row): Boolean = {
    var i = 0
    while (i < sch.size) {
      val (x, y) = (a(i), b(i))
      if (x == null && y != null) return true
      if (x != null && y == null) return false
      if (x != null && y != null) {
        val c = sch(i).typ match {
          case TL => java.lang.Long.compare(x.asInstanceOf[Long],
            y.asInstanceOf[Long])
          case TD => java.lang.Double.compare(x.asInstanceOf[Double],
            y.asInstanceOf[Double])
          case TS => x.asInstanceOf[String]
            .compareTo(y.asInstanceOf[String])
        }
        if (c != 0) return c < 0
      }
      i += 1
    }
    false
  }

  private def index(sch: Vector[Cl]): Map[String, Int] =
    sch.zipWithIndex.map { case (c, i) => c.name -> i }.toMap

  private def evalEx(e: Ex, r: Row, idx: Map[String, Int]): Any = e match {
    case Ref(n, _) => r(idx(n))
    case LL(v)     => Long.box(v)
    case LD(v)     => Double.box(v)
    case LS(v)     => v
    case AMod(a, k) =>
      val v = evalEx(a, r, idx)
      if (v == null) null
      else Long.box(math.abs(v.asInstanceOf[Long]) % k)
    case Bin(op, a, b) =>
      val va = evalEx(a, r, idx)
      val vb = evalEx(b, r, idx)
      if (va == null || vb == null) null
      else e.typ match {
        case TL =>
          val (x, y) = (va.asInstanceOf[Long], vb.asInstanceOf[Long])
          Long.box(op match {
            case "+" => x + y
            case "-" => x - y
            case _   => x * y
          })
        case _ =>
          val (x, y) = (va.asInstanceOf[Double], vb.asInstanceOf[Double])
          Double.box(op match {
            case "+" => x + y
            case "-" => x - y
            case _   => x * y
          })
      }
    case NullIfE(a, b) =>
      val va = evalEx(a, r, idx)
      val vb = evalEx(b, r, idx)
      if (va == null) null
      else if (vb != null && va == vb) null
      else va
    case CoalE(a, b) =>
      val va = evalEx(a, r, idx)
      if (va != null) va else evalEx(b, r, idx)
    case IfE(p, t, el) =>
      if (evalPr(p, r, idx).contains(true)) evalEx(t, r, idx)
      else evalEx(el, r, idx)
    case UpperE(a) =>
      val v = evalEx(a, r, idx)
      if (v == null) null else v.asInstanceOf[String].toUpperCase(java.util.Locale.ROOT) // locale-independent, like Spark's upper()
    case SubstrE(a, pos, len) =>
      val v = evalEx(a, r, idx)
      if (v == null) null
      else v.asInstanceOf[String].drop(pos - 1).take(len)
    case ConcatE(a, b) =>
      val va = evalEx(a, r, idx)
      val vb = evalEx(b, r, idx)
      if (va == null || vb == null) null
      else va.asInstanceOf[String] + vb.asInstanceOf[String]
    case LenE(a) =>
      val v = evalEx(a, r, idx)
      if (v == null) null
      else Long.box(v.asInstanceOf[String].length.toLong)
    case CastD(a) =>
      val v = evalEx(a, r, idx)
      if (v == null) null
      else Double.box(v.asInstanceOf[Long].toDouble)
    // the variant round trip is the identity for the TL/TS values the
    // grammar mints (bounded longs, ASCII strings) — which is the point:
    // the ENGINES must prove their JSON/VARIANT machinery agrees
    case VarE(a) => evalEx(a, r, idx)
  }

  private def evalPr(p: Pr, r: Row, idx: Map[String, Int])
  : Option[Boolean] = p match {
    case Cmp(op, a, b) =>
      val va = evalEx(a, r, idx)
      val vb = evalEx(b, r, idx)
      if (va == null || vb == null) None
      else {
        val c = a.typ match {
          case TL => java.lang.Long.compare(va.asInstanceOf[Long],
            vb.asInstanceOf[Long])
          case TD => java.lang.Double.compare(va.asInstanceOf[Double],
            vb.asInstanceOf[Double])
          case TS => va.asInstanceOf[String]
            .compareTo(vb.asInstanceOf[String])
        }
        Some(op match {
          case "="  => c == 0
          case "<>" => c != 0
          case "<"  => c < 0
          case "<=" => c <= 0
          case ">"  => c > 0
          case _    => c >= 0
        })
      }
    case IsNull(a, neg) =>
      val isNull = evalEx(a, r, idx) == null
      Some(if (neg) !isNull else isNull)
    case AndP(a, b) =>
      (evalPr(a, r, idx), evalPr(b, r, idx)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true))            => Some(true)
        case _                                   => None
      }
    case OrP(a, b) =>
      (evalPr(a, r, idx), evalPr(b, r, idx)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false))        => Some(false)
        case _                                 => None
      }
    case NotP(a) => evalPr(a, r, idx).map(!_)
    case NsEq(a, b, neg) =>
      // two-valued by definition: never returns None
      val va = evalEx(a, r, idx)
      val vb = evalEx(b, r, idx)
      val eq =
        if (va == null || vb == null) va == null && vb == null
        else a.typ match {
          case TL => va.asInstanceOf[Long] == vb.asInstanceOf[Long]
          case TD => java.lang.Double.compare(
            va.asInstanceOf[Double], vb.asInstanceOf[Double]) == 0
          case TS => va == vb
        }
      Some(if (neg) !eq else eq)
    case InP(a, lits) =>
      val va = evalEx(a, r, idx)
      if (va == null) None // UNKNOWN, and NotP keeps it UNKNOWN
      else Some(lits.exists { l =>
        val vl = evalEx(l, r, idx)
        a.typ match {
          case TL => va.asInstanceOf[Long] == vl.asInstanceOf[Long]
          case TD => java.lang.Double.compare(
            va.asInstanceOf[Double], vl.asInstanceOf[Double]) == 0
          case TS => va == vl
        }
      })
    case LikeP(a, pat) =>
      val va = evalEx(a, r, idx)
      if (va == null) None
      else Some(likeRegex(pat).matcher(va.asInstanceOf[String]).matches())
  }

  /** Compiled-per-pattern LIKE regex (evalPr runs per ROW — compiling
    * in place would re-build the automaton for every row). Patterns
    * come from a finite generator pool, so the map stays tiny; the
    * translation quotes the literal segments and maps `%` to `.*`
    * (the grammar emits only letters/spaces/`%` — no `_`, no escapes). */
  private val likeCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.regex.Pattern]()
  private def likeRegex(pat: String): java.util.regex.Pattern =
    likeCache.computeIfAbsent(pat, p =>
      java.util.regex.Pattern.compile("(?s)" + p.split("%", -1)
        .map(seg =>
          if (seg.isEmpty) "" else java.util.regex.Pattern.quote(seg))
        .mkString(".*")))

  private def evalAg(a: Ag, rs: Seq[Row], idx: Map[String, Int]): Any =
    a match {
      case CntAll => Long.box(rs.size.toLong)
      case Cnt(c) =>
        Long.box(rs.count(_(idx(c)) != null).toLong)
      case SumL(c) =>
        val vs = rs.map(_(idx(c))).filter(_ != null)
        if (vs.isEmpty) null
        else Long.box(vs.map(_.asInstanceOf[Long]).sum)
      case AvgL(c) =>
        val vs = rs.map(_(idx(c))).filter(_ != null)
        if (vs.isEmpty) null
        else {
          // mirror both engines: exact integer partial sums in double
          var s = 0.0
          vs.foreach(v => s += v.asInstanceOf[Long].toDouble)
          Double.box(s / vs.size)
        }
      case MinA(c, t) => extremum(rs, idx(c), t, wantMin = true)
      case MaxA(c, t) => extremum(rs, idx(c), t, wantMin = false)
      case CntD(c) =>
        Long.box(rs.map(_(idx(c))).filter(_ != null).distinct.size.toLong)
      case SumCase(p, c, k) =>
        val ix = idx(c)
        val vals = rs.map { r =>
          if (evalPr(p, r, idx).contains(true)) {
            val v = r(ix)
            if (v == null) null
            else Long.box(math.abs(v.asInstanceOf[Long]) % k)
          } else Long.box(0L)
        }.filter(_ != null)
        if (vals.isEmpty) null
        else Long.box(vals.map(_.asInstanceOf[Long]).sum)
    }

  private def extremum(rs: Seq[Row], ix: Int, t: Typ,
                       wantMin: Boolean): Any = {
    val vs = rs.map(_(ix)).filter(_ != null)
    if (vs.isEmpty) return null
    val lt: (Any, Any) => Boolean = t match {
      case TL => (a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long]
      case TD => (a, b) => a.asInstanceOf[Double] < b.asInstanceOf[Double]
      case TS => (a, b) =>
        a.asInstanceOf[String].compareTo(b.asInstanceOf[String]) < 0
    }
    vs.reduce((a, b) =>
      if (if (wantMin) lt(a, b) else lt(b, a)) a else b)
  }

  // -------------------------------------------------------- canonicalization

  /** Canonical sorted multiset of rows with columns sorted by name —
    * the driver's comparison convention. Doubles are rendered by raw
    * IEEE bits: the fuzz grammar is designed bit-deterministic, so the
    * differential is exact, not tolerance-based. */
  def canon(schema: Vector[Cl], rows: Seq[Row]): Seq[String] = {
    val order = schema.map(_.name).zipWithIndex.sortBy(_._1).map(_._2)
    rows.map { r =>
      order.map { i =>
        r(i) match {
          case null      => "∅"
          case v: Long   => s"L$v"
          case v: Double => "D" + java.lang.Double.doubleToLongBits(v)
          case v: String => "S" + v
          case v         => "?" + v
        }
        // cell separator \u0001 (escaped — a literal control char
        // in source renders as mkString("") in diffs and misleads
        // review): without it adjacent strings are ambiguous
        // (("AS","IA") and ("A","SIA") would both canonicalize to
        // "SASSIA") and a real divergence could compare as a false
        // pass. \u0001 cannot appear in a cell: pool values are
        // printable ASCII and substr/concat/upper mint no new chars.
      }.mkString("\u0001")
    }.sorted
  }
}
