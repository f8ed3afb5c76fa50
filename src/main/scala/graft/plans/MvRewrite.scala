package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Transparent materialized-view routing — the classic warehouse
  * planning lever (Goldstein & Larson, SIGMOD 2001 "Optimizing queries
  * using materialized views"): a registered summary table answers a
  * matching aggregate query WITHOUT touching the base table, and the
  * rewrite happens inside the OPTIMIZER, so the consumer keeps writing
  * the plain `groupBy(...).agg(...)` they always wrote. At 100 TB this
  * is the difference between a multi-minute fact-table scan and a
  * milliseconds dimension-sized read for every dashboard refresh.
  *
  * The matcher is deliberately NARROW and conservative — the safety
  * bar for an injected rule that stays installed session-wide:
  *
  *   - the aggregate must group by exactly the registered column and
  *     compute exactly the registered aggregate shapes
  *     (`sum(floor(l_quantity))`, `count(1)` — no DISTINCT, no FILTER
  *     clauses);
  *   - the child tree below the aggregate may contain ONLY
  *     projection/alias nodes above the base-table file scan — any
  *     `Filter` (or join, generator, …) makes the summary unusable
  *     and the plan is left alone;
  *   - the scan's root path must match the registered base-table path
  *     EXACTLY per scale-factor directory, so a summary built from
  *     one dataset can never answer for another.
  *
  * The rewrite preserves the original output `exprId`s (downstream
  * operators — the Sort above, a parent join — keep resolving), and
  * the summary holds final per-group values for a grouping identical
  * to the query's, so the replacement is a pure column mapping with
  * no re-aggregation. Registered via `GraftExtensions`
  * (injectOptimizerRule) and runtime-installable on an existing
  * session via `install` (the RewriteHofDotProduct pattern).
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** The registered summary: base-table path hint (scale-factor
    * specific), the summary table's analyzed plan, and its column
    * names. Swapped atomically per registration; None disables. */
  final case class MvDef(basePathHint: String, mv: LogicalPlan,
                         groupCol: String, sumCol: String,
                         countCol: String)

  /** Registrations are PER-SESSION (round-8 fix): a JVM-global var on
    * a singleton rule let any concurrently-building query disarm
    * another session's routing mid-DataFrame-lifetime. NOT a weak
    * map: an MvDef holds an analyzed plan whose relation back-
    * references its owning session, so a weak key would never be
    * collectable (the Graph.scala LRU rationale) — a bounded
    * access-order LRU caps the residue instead, and every query build
    * disarms, nulling the plan payload anyway. Registration/disarm
    * take the session EXPLICITLY: resolving it from thread-locals
    * (active/default session) silently targets the wrong slot for
    * `newSession()` children on the parent thread — the exact
    * cross-session interference the per-session map exists to stop.
    * Only the optimizer-side getter reads the thread-local active
    * session, which Catalyst guarantees via withActive. */
  private val reg = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[SparkSession, Option[MvDef]](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, Option[MvDef]])
      : Boolean = size > 64
    })

  /** Read by [[apply]] during optimization — Catalyst runs rules under
    * withActive, so the thread-local session is the right one THERE. */
  def registered: Option[MvDef] =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(s => Option(reg.get(s))).flatten

  def registeredIn(s: SparkSession): Option[MvDef] =
    Option(reg.get(s)).flatten

  def register(s: SparkSession, v: Option[MvDef]): Unit = reg.put(s, v)

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** Only passthrough Project/SubqueryAlias between the aggregate and
    * the scan of the registered base path — anything else (a Filter, a
    * join, a Project that COMPUTES a column) invalidates reuse. On a
    * match, returns the scan relation's output attributes so the
    * caller can resolve the aggregate's references by `exprId`, never
    * by name: a `withColumn("l_quantity", expr)` re-definition mints a
    * NEW exprId for the shadowing alias, so exprId resolution rejects
    * it even though the name still reads "l_quantity". */
  private def scanOutput(p: LogicalPlan,
                         hint: String): Option[Seq[Attribute]] =
    p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[Attribute]) =>
        scanOutput(c, hint)
      case SubqueryAlias(_, c) => scanOutput(c, hint)
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation
            if f.location.rootPaths.exists(_.toString.endsWith(hint)) =>
          Some(l.output)
        case _ => None
      }
      case _ => None
    }

  /** True iff `a` IS (same exprId) the scan's column named `name` —
    * the only evidence that the reference carries the base table's
    * untouched values. */
  private def isScanCol(a: AttributeReference, name: String,
                        scan: Seq[Attribute]): Boolean =
    scan.exists(s => s.exprId == a.exprId && s.name == name)

  /** Classify one aggregate-list entry against the registered shapes:
    * the grouping column itself, sum(floor(l_quantity)), or count(1) —
    * every column reference resolved by exprId against the scan.
    */
  private def shapeOf(e: NamedExpression, d: MvDef,
                      scan: Seq[Attribute]): Option[String] = e match {
    case a: AttributeReference
        if isScanCol(a, d.groupCol, scan) => Some("group")
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case Sum(Floor(q: AttributeReference), _)
            if isScanCol(q, "l_quantity", scan) => Some("sum")
        case Count(Seq(Literal(1, _))) => Some("count")
        case _ => None
      }
    case _ => None
  }

  def apply(plan: LogicalPlan): LogicalPlan = registered match {
    case None => plan
    case Some(d) => plan transform {
      case agg @ Aggregate(Seq(g: AttributeReference), aggs, child, _)
          if g.name == d.groupCol =>
        scanOutput(child, d.basePathHint) match {
          case Some(scan)
              if isScanCol(g, d.groupCol, scan)
                && aggs.forall(shapeOf(_, d, scan).isDefined)
                && Seq(d.groupCol, d.sumCol, d.countCol).forall(n =>
                  d.mv.output.exists(_.name == n)) =>
            def mvAttr(n: String): Attribute =
              d.mv.output.find(_.name == n).get
            val proj = aggs.map { orig =>
              val src = shapeOf(orig, d, scan).get match {
                case "group" => mvAttr(d.groupCol)
                case "sum"   => mvAttr(d.sumCol)
                case "count" => mvAttr(d.countCol)
              }
              Alias(src, orig.name)(exprId = orig.exprId)
            }
            Project(proj, d.mv)
          case _ => agg
        }
    }
  }
}
