package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,(x,y)=>x*y), 0d, _+_)`) allocates an
  * intermediate array per row and evaluates a lambda per element; this
  * expression emits a single fused loop into whole-stage codegen — no
  * allocation, no virtual calls — which is what the 100-TB ANN path wants
  * (SURVEY §4 "codegen cosine-distance Expression" candidate).
  *
  * Interpreted eval is provided for completeness/testing; codegen is the
  * hot path.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** NULL, not NaN/garbage, on every degenerate input: length mismatch,
    * a null element, or a zero-norm vector (where the quotient would be
    * 0/0 = NaN — which poisons downstream comparisons since NaN breaks
    * ordering assumptions differently per engine).
    */
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |  }
         |  if (!${ev.isNull} && ($nx == 0.0 || $ny == 0.0)) {
         |    ${ev.isNull} = true;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot /
         |      (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native functions.
  *
  * Canonical path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (SparkSessionExtensions.injectFunction). [[GraftFunctions.register]]
  * covers sessions built without the extension (the driver harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSimDescriptor)
    ext.injectFunction(GraftFunctions.jaccardSortedDescriptor)
    ext.injectFunction(GraftFunctions.rollingHashesDescriptor)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftFunctions {
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs.head, exprs(1)))

  val jaccardSortedDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (exprs: Seq[Expression]) => JaccardSorted(exprs.head, exprs(1)))

  val rollingHashesDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo(classOf[RollingHashes].getName, "rolling_hashes"),
      (exprs: Seq[Expression]) => RollingHashes(exprs.head, exprs(1)))

  /** Idempotent per-session registration of all native functions. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => CosineSim(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted",
      exprs => JaccardSorted(exprs.head, exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "corr_matrix",
      exprs => CorrMatrixAgg(exprs),
      "built-in")
    // Runtime-filter primitives (the machinery behind Spark's own
    // injected bloom joins, surfaced as callable functions):
    // bloom_build(key[, capacity]) aggregates a bloom over xxhash64(key),
    // sized for `capacity` expected distinct keys (default 1M — an
    // over-capacity build silently saturates to a pass-through, exact
    // but useless, so size it from the build side's key estimate);
    // bloom_probe(bloom, key) tests membership of xxhash64(key).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build",
      exprs => {
        val key = new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(exprs.head))
        if (exprs.length >= 2)
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(key,
              // SQL integer literals parse as INT; the aggregate's
              // capacity slot is BIGINT-typed
              org.apache.spark.sql.catalyst.expressions.Cast(
                exprs(1), org.apache.spark.sql.types.LongType))
        else
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(key, 1000000L)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_probe",
      exprs => new org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            exprs.tail)),
      "built-in")
    // cms_estimate(sketch, key): point-frequency probe of the engine's
    // own count_min_sketch aggregate output — the third mergeable-sketch
    // family next to HLL (distinct counts, m_hll_rollup) and bloom
    // (membership): bounded-overcount frequency without per-key state.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_estimate",
      exprs => CmsEstimate(exprs.head, exprs(1)),
      "built-in")
    // rolling_hashes(text, g): the Karp-Rabin position-hash stream —
    // the anchor stage of exact substring dedup (t_dup_substrings).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hashes",
      exprs => RollingHashes(exprs.head, exprs(1)),
      "built-in")
  }

  /** Install graft optimizer rules on a session built without the
    * extensions conf (idempotent). */
  def installOptimizations(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
}
