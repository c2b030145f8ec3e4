package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** ST_ClosestPoint + ST_Distance against a linestring, planar, in one
  * native pass: `closest_point_on_line(line, px, py)` returns
  * `STRUCT<dist2, x, y>` — the squared planar distance from the point
  * to the polyline and the snapped (closest) point on it, the
  * projection pgRouting snaps stops to before routing. Squared
  * distance so the hot path needs no sqrt and stays exactly
  * reproducible (only +,-,*,/ and a clamp — DuckDB evaluating the same
  * formula gets the same bits).
  *
  * Coordinates are treated planar (degree space, or [[Geo.lccProject]]
  * output for meters). Why native: the per-segment loop with a
  * data-dependent argmin would need `transform(sequence(...))` +
  * `array_min` HOFs — all CodegenFallback and boxing a struct per
  * segment; this is one primitive loop per row, emitted as a direct
  * static call inside whole-stage codegen.
  */
case class ClosestPointOnLine(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dist2", DoubleType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false)))

  override def prettyName: String = "closest_point_on_line"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(s: StructType, _), DoubleType, DoubleType)
          if s.size == 2 && s.forall(_.dataType == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, p, q) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "closest_point_on_line needs (ARRAY<STRUCT<double,double>>, " +
            s"DOUBLE, DOUBLE), got (${l.catalogString}, ${p.catalogString}, " +
            s"${q.catalogString})")
    }

  override protected def nullSafeEval(line: Any, px: Any, py: Any): Any =
    ClosestPointOnLine.evalClosest(line.asInstanceOf[ArrayData],
      px.asInstanceOf[Double], py.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, x, y) =>
      s"graft.functions.ClosestPointOnLine.evalClosest($l, $x, $y)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ClosestPointOnLine {
  /** Named `evalClosest`, not `eval`: a companion method shadowing an
    * inherited class member gets no static forwarder and codegen would
    * silently fall back to interpreted mode. An empty line has no
    * closest point: returns `(+Infinity, NaN, NaN)` — NOT null, because
    * `defineCodeGen` assigns the helper's result without a null check
    * (ev.isNull is already decided by the children), so a null here
    * would NPE the generated projection; the infinite distance makes
    * every `dist2 <= r²` refinement drop the row naturally. */
  def evalClosest(line: ArrayData, px: Double, py: Double): GenericInternalRow = {
    val n = line.numElements()
    if (n == 0) return new GenericInternalRow(
      Array[Any](Double.PositiveInfinity, Double.NaN, Double.NaN))
    var p = line.getStruct(0, 2)
    var ax = p.getDouble(0); var ay = p.getDouble(1)
    var bestD = { val ex = px - ax; val ey = py - ay; ex * ex + ey * ey }
    var bestX = ax; var bestY = ay
    var i = 1
    while (i < n) {
      p = line.getStruct(i, 2)
      val bx = p.getDouble(0); val by = p.getDouble(1)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val t =
        if (len2 == 0.0) 0.0
        else {
          val raw = ((px - ax) * dx + (py - ay) * dy) / len2
          if (raw < 0.0) 0.0 else if (raw > 1.0) 1.0 else raw
        }
      val cx = ax + t * dx; val cy = ay + t * dy
      val ex = px - cx; val ey = py - cy
      val d = ex * ex + ey * ey
      if (d < bestD) { bestD = d; bestX = cx; bestY = cy }
      ax = bx; ay = by
      i += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestX, bestY))
  }
}
