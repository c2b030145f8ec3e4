package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer dot product of two `ARRAY<INT>` columns, summed in
  * long: `int_dot(a, b)`. This is the codegen'd primitive behind the
  * int8 quantized search ([[graft.llm.Similarity.int8TopKPerQuery]]):
  * the per-pair score inside a corpus×queries join is the hottest
  * expression in the operator, and the `aggregate(zip_with(...))`
  * higher-order formulation runs interpreted (CodegenFallback) with a
  * boxed lambda call per element — the same cliff [[MatVec]] removes
  * for the float path, visible as a ~99 s cold JIT outlier in the r11
  * bench. Here the dot is one primitive loop inside whole-stage
  * codegen.
  *
  * Unlike [[MatVec]] neither side is foldable — corpus codes and query
  * codes are both columns. Sums of int8-range codes are exact in long
  * (≤ 127²·dim per pair), so results are bit-identical to the HOF
  * formulation and to an integer SQL oracle. Rows of unequal length
  * contribute only their overlap (caller bug, but must not throw
  * mid-job).
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "int_dot"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntDot.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntDot {
  /** Shared by interpreted eval and generated code (named `dot`, not
    * `eval` — see the static-forwarder hazard note on [[MatVec.dot]]). */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val x = a.toIntArray()
    val y = b.toIntArray()
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) { s += x(i).toLong * y(i); i += 1 }
    s
  }
}
