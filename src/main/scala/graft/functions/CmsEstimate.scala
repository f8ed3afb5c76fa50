package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, key)`: point-frequency estimate of `key` from a
  * serialized Spark [[CountMinSketch]] (the binary produced by the
  * built-in `count_min_sketch` aggregate).
  *
  * Completes the mergeable-sketch probe surface next to `bloom_probe`
  * (membership) — build with the engine's own aggregate, read with this
  * expression. The sketch operand is expected to be a runtime constant
  * (scalar subquery / broadcast 1-row capsule), so deserialization is
  * cached after the first evaluation per task. CodegenFallback is
  * deliberate: probes run over a handful of keys per query (the
  * pair-dominated paths are elsewhere), so interpreted eval is not a
  * hot path and the fallback keeps the sketch cache trivially correct.
  *
  * CMS contract surfaced by the acceptance columns in `m_cms_freq`:
  * estimates NEVER undercount, and overcount by at most eps * N with
  * probability >= confidence — per-row error bounded without storing
  * per-key state, which is what makes the sketch mergeable across
  * 100-TB partitions (depth x width integer matrix, element-wise add).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  // Seq is covariant, so Seq[DataType] satisfies Seq[AbstractDataType]
  // (AbstractDataType itself is private[sql] in Spark 4)
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cached: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, key: Any): Any = {
    if (cached == null) {
      cached = CountMinSketch.readFrom(
        new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    }
    cached.estimateCount(key.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
