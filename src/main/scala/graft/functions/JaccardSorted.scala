package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Native codegen'd exact Jaccard similarity over two SORTED, DISTINCT
  * `array<string>` columns (the shape `array_sort(array_distinct(...))`
  * produces — sortedness uses the same binary UTF8String ordering
  * `array_sort` emits, so the contract is free at the producer).
  *
  * The built-in formulation
  * (`size(array_intersect(a,b)) / size(array_union(a,b))`) allocates an
  * intersection array, a union array, AND a hash set per pair; this
  * expression is one allocation-free merge-walk per pair — what the
  * MinHash verify stage wants at 100 TB, where candidate pairs (not
  * documents) dominate: each document's set is sorted once, then every
  * pair it appears in walks for free. `m_minhash_dedup_native` must
  * hash-match the exact oracle of the HOF twin.
  *
  * NULL on: a null element in either array, or two empty sets (0/0).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaccard_sorted expects two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 && m == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    while (i < n) { if (x.isNullAt(i)) return null; i += 1 }
    while (j < m) { if (y.isNullAt(j)) return null; j += 1 }
    inter.toDouble / (n + m - inter)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if ($n == 0 && $m == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0, $j = 0, $inter = 0;
         |  while ($i < $n && $j < $m) {
         |    if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($c == 0) { $inter++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |  while (!${ev.isNull} && $i < $n) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; } $i++;
         |  }
         |  while (!${ev.isNull} && $j < $m) {
         |    if ($b.isNullAt($j)) { ${ev.isNull} = true; } $j++;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ((double) $inter) / ($n + $m - $inter);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}
