package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}

/** `rolling_hashes(text, g)` — the Karp-Rabin position-hash stream: one
  * 64-bit polynomial hash per CODE-POINT offset `i` of the `g`-code-point
  * substring starting there (`len - g + 1` hashes where `len` is the
  * code-point length; empty array when the string is shorter than `g`).
  *
  * This is the ANCHOR half of exact substring-level deduplication (the
  * suffix-array family — Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): shuffling an 8-byte hash per position
  * instead of the `g`-char gram itself cuts the anchor stage's shuffle
  * ~3x at g=25, and the duplicated-candidate set is then VERIFIED against
  * the real substrings (`t_dup_substrings`), so 64-bit collisions cannot
  * produce a wrong answer — only a vanishingly rare extra candidate to
  * verify.
  *
  * Hash: h(i) = Σ_{j<g} cp(i+j)·B^(g-1-j) in wrapping Long arithmetic
  * (B = 1000003); each next position is O(1) via
  * h(i+1) = (h(i) − cp(i)·B^(g-1))·B + cp(i+g). Positions and grams are
  * UNICODE CODE POINTS — the same unit `substring()`/`length()` use in
  * Spark SQL and `substr()`/`length()` use in DuckDB, so the emitted
  * offsets feed `substring(text, pos, g)` verbatim for ALL of Unicode
  * (astral chars included), not just BMP text.
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

  /** B^(g-1) in wrapping Long arithmetic — the roll-off multiplier. */
  private lazy val bPow: Long = {
    var p = 1L
    var j = 1
    while (j < gram) { p *= RollingHashes.B; j += 1 }
    p
  }

  override def nullSafeEval(s: Any, g: Any): Any =
    new GenericArrayData(
      RollingHashes.compute(s.toString, gram, bPow))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val gLit = gram
    val bPowLit = bPow
    val bLit = RollingHashes.B
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val str = ctx.freshName("str")
      val cps = ctx.freshName("cps")
      val n = ctx.freshName("n")
      val u = ctx.freshName("u")
      val cp = ctx.freshName("cp")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      // code-point decode first (positions must align with substring()
      // semantics — see class scaladoc), then the O(1) roll
      s"""
         |java.lang.String $str = $s.toString();
         |int[] $cps = new int[$str.length()];
         |int $n = 0;
         |for (int $u = 0; $u < $str.length(); ) {
         |  int $cp = $str.codePointAt($u);
         |  $cps[$n++] = $cp;
         |  $u += java.lang.Character.charCount($cp);
         |}
         |int $m = $n - $gLit + 1;
         |if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |if ($m > 0) {
         |  long $h = 0L;
         |  for (int $i = 0; $i < $gLit; $i++) {
         |    $h = $h * ${bLit}L + (long) $cps[$i];
         |  }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $m; $i++) {
         |    $h = ($h - ((long) $cps[$i - 1]) * ${bPowLit}L)
         |      * ${bLit}L + (long) $cps[$i + $gLit - 1];
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
  private[functions] final val B = 1000003L

  /** Shared by interpreted eval and the spec's reference impl. */
  private[graft] def compute(str: String, gram: Int,
                             bPow: Long): Array[Long] = {
    val cps = new Array[Int](str.length)
    var n = 0
    var u = 0
    while (u < str.length) {
      val cp = str.codePointAt(u)
      cps(n) = cp
      n += 1
      u += Character.charCount(cp)
    }
    val m = math.max(0, n - gram + 1)
    val out = new Array[Long](m)
    if (m > 0) {
      var h = 0L
      var j = 0
      while (j < gram) { h = h * B + cps(j).toLong; j += 1 }
      out(0) = h
      var i = 1
      while (i < m) {
        h = (h - cps(i - 1).toLong * bPow) * B + cps(i + gram - 1).toLong
        out(i) = h
        i += 1
      }
    }
    out
  }
}
