package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Per-row second-moment vector for one-pass covariance/PCA: for a
  * d-vector x, emits `[x_0..x_{d-1}, x_0x_0, x_0x_1, .., x_{d-1}x_{d-1}]`
  * — the vector itself followed by the flattened upper triangle of
  * x·xᵀ (d + d(d+1)/2 doubles). Summing this column with [[VectorSum]]
  * plus a `count(*)` yields everything a covariance matrix needs in
  * ONE aggregation pass with map-side partials — the same
  * scales-like-count(*) shape as [[graft.llm.Regression]]'s moment
  * aggregate, generalized to vector features.
  *
  * Why native: the HOF formulation (`flatten(transform(sequence...))`)
  * is CodegenFallback and boxes d(d+1)/2 Doubles per row — measured
  * superlinear on the repetition-features precedent; this is one
  * primitive loop emitted as a direct static call inside whole-stage
  * codegen.
  */
case class OuterUpper(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "outer_upper"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"outer_upper needs ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    OuterUpper.moments(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.OuterUpper.moments($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OuterUpper {
  /** Named `moments`, not `eval` — companion methods shadowing class
    * members get no static forwarder (codegen would silently degrade
    * to interpreted). */
  def moments(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val x: Array[Double] =
      if (isFloat) {
        val f = vec.toFloatArray()
        val a = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { a(i) = f(i); i += 1 }
        a
      } else vec.toDoubleArray()
    val d = x.length
    val out = new Array[Double](d + d * (d + 1) / 2)
    System.arraycopy(x, 0, out, 0, d)
    var k = d
    var i = 0
    while (i < d) {
      val xi = x(i)
      var j = i
      while (j < d) { out(k) = xi * x(j); k += 1; j += 1 }
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
