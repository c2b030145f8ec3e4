package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Matrix-vector product against a FOLDABLE matrix literal:
  * `matvec(matrix, vec)` returns `ARRAY<DOUBLE>` of per-row dot
  * products. This is the codegen'd primitive behind every "score a
  * vector against N fixed directions" operator (LSH hyperplane
  * projections, IVF centroid scoring): Spark's higher-order functions
  * (`transform`/`zip_with`/`aggregate`) are CodegenFallback, so a
  * matrix of dots expressed through them runs interpreted with a boxed
  * lambda call per element — measured ~4x slower at 192x64 per row.
  * Here the matrix is extracted ONCE from the literal and the whole
  * product is two primitive loops.
  *
  * Dot accumulation is left-to-right double adds — bit-identical to the
  * `aggregate(zip_with(...))` formulation and to DuckDB's
  * `list_dot_product`, so oracle checks stay exact. The vector may be
  * FLOAT or DOUBLE typed; rows shorter than a matrix row contribute
  * only their overlap (matrix/vector length mismatch is a caller bug,
  * but must not throw mid-job).
  */
case class MatVec(matrix: Expression, vec: Expression)
    extends BinaryExpression {
  require(matrix.foldable, "matvec: matrix must be a literal")

  override def left: Expression = matrix
  override def right: Expression = vec
  override def prettyName: String = "matvec"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val mat: Array[Array[Double]] = {
    val md = matrix.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(md.numElements())(i => md.getArray(i).toDoubleArray())
  }

  private val vecIsFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(m: Any, v: Any): Any =
    MatVec.dot(mat, v.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matvecMatrix", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = graft.functions.MatVec.dot($matRef, $v, $vecIsFloat);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(matrix = newLeft, vec = newRight)
}

object MatVec {
  /** Shared by interpreted eval and generated code. Named `dot`, NOT
    * `eval`: the class inherits `Expression.eval(InternalRow)`, and a
    * same-named companion method gets NO static forwarder — the
    * generated `graft.functions.MatVec.eval(...)` call then fails
    * Janino compilation and the whole projection silently degrades to
    * interpreted mode (found via the UnsafeProjection fallback WARN). */
  def dot(mat: Array[Array[Double]], vec: ArrayData,
      isFloat: Boolean): ArrayData = {
    val varr: Array[Double] =
      if (isFloat) {
        val f = vec.toFloatArray()
        val a = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { a(i) = f(i); i += 1 }
        a
      } else vec.toDoubleArray()
    val out = new Array[Double](mat.length)
    var i = 0
    while (i < mat.length) {
      val row = mat(i)
      val n = math.min(row.length, varr.length)
      var s = 0.0
      var j = 0
      while (j < n) { s += row(j) * varr(j); j += 1 }
      out(i) = s
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
