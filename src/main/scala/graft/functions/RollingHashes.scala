package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  IntegerType, LongType, StringType}

/** `rolling_hashes(text, g)` — the Karp-Rabin position-hash stream: one
  * 64-bit polynomial hash per character offset `i` of the `g`-length
  * substring starting there (`len - g + 1` hashes; empty array when the
  * string is shorter than `g`).
  *
  * This is the ANCHOR half of exact substring-level deduplication (the
  * suffix-array family — Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): shuffling an 8-byte hash per position
  * instead of the `g`-byte gram itself cuts the anchor stage's shuffle
  * ~3x at g=25, and the duplicated-candidate set is then VERIFIED against
  * the real substrings (`t_dup_substrings`), so 64-bit collisions cannot
  * produce a wrong answer — only a vanishingly rare extra candidate to
  * verify.
  *
  * Hash: h(i) = Σ_{j<g} c(i+j)·B^(g-1-j) in wrapping Long arithmetic
  * (B = 1000003); each next position is O(1) via
  * h(i+1) = (h(i) − c(i)·B^(g-1))·B + c(i+g). Positions and grams are
  * UTF-16 code-unit based — identical to `substring()` semantics on both
  * engines for BMP text (the fixtures are ASCII), and the verify stage
  * re-extracts via `substring` anyway so the anchor granularity can never
  * change the verified result.
  *
  * `g` must be a foldable positive int — the gram length is a plan-time
  * constant (it is interpolated into the DuckDB oracle too, shared-val
  * style), not data.
  */
case class RollingHashes(child: Expression, gramExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = gramExpr

  override def prettyName: String = "rolling_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"rolling_hashes expects a string column, got " +
        child.dataType.simpleString)
    else if (gramExpr.dataType != IntegerType || !gramExpr.foldable)
      TypeCheckFailure("rolling_hashes expects a foldable INT gram length")
    else {
      val g = gramExpr.eval(null)
      if (g == null || g.asInstanceOf[Int] <= 0)
        TypeCheckFailure("rolling_hashes gram length must be a positive INT")
      else TypeCheckSuccess
    }
  }

  private lazy val gram: Int = gramExpr.eval(null).asInstanceOf[Int]

  private final val B = 1000003L

  /** B^(g-1) in wrapping Long arithmetic — the roll-off multiplier. */
  private lazy val bPow: Long = {
    var p = 1L
    var j = 1
    while (j < gram) { p *= B; j += 1 }
    p
  }

  override def nullSafeEval(s: Any, g: Any): Any = {
    val str = s.toString
    val n = str.length
    val out = RollingHashes.compute(str, n, gram, bPow, B)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val gLit = gram
    val bPowLit = bPow
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val str = ctx.freshName("str")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      s"""
         |java.lang.String $str = $s.toString();
         |int $n = $str.length();
         |int $m = $n - $gLit + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |if ($m > 0) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $gLit; $i++) {
         |    $h = $h * ${B}L + (long) $str.charAt($i);
         |  }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $m; $i++) {
         |    $h = ($h - ((long) $str.charAt($i - 1)) * ${bPowLit}L)
         |      * ${B}L + (long) $str.charAt($i + $gLit - 1);
         |    $out[$i] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHashes =
    copy(child = newLeft, gramExpr = newRight)
}

object RollingHashes {
  /** Shared by interpreted eval and the spec's reference impl. */
  private[functions] def compute(str: String, n: Int, gram: Int,
                                 bPow: Long, b: Long): Array[Long] = {
    val m = math.max(0, n - gram + 1)
    val out = new Array[Long](m)
    if (m > 0) {
      var h = 0L
      var j = 0
      while (j < gram) { h = h * b + str.charAt(j).toLong; j += 1 }
      out(0) = h
      var i = 1
      while (i < m) {
        h = (h - str.charAt(i - 1).toLong * bPow) * b +
          str.charAt(i + gram - 1).toLong
        out(i) = h
        i += 1
      }
    }
    out
  }
}
