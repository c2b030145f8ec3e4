package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** ST_Simplify: Douglas–Peucker polyline simplification over the
  * engine's linestring model `ARRAY<STRUCT<lon,lat>>`, tolerance in the
  * coordinate units (planar — same semantics as PostGIS `ST_Simplify`;
  * project with [[Geo.lccProject]] first for a meters tolerance). The
  * reference renders road geometries that carry every redundant
  * collinear OSM node; this is the standard way to shed them before
  * export or display.
  *
  * Why native: the retained-vertex set needs a data-dependent
  * stack-driven recursion (split at the farthest vertex while any
  * vertex is farther than eps from the current chord) — not expressible
  * in `functions._` array HOFs, and a Scala UDF would box every point.
  * One primitive-array pass per row, emitted through `doGenCode` as a
  * direct static call so it stays inside whole-stage codegen (same
  * pattern as [[ExtractInts]] / [[MatVec]] / [[RepetitionStats]]).
  *
  * Guarantees (spec-checked): output vertices are a subsequence of the
  * input including both endpoints; every dropped vertex lies within
  * `eps` of the chord that dropped it, hence within `eps` of the output
  * polyline. Distance is point-to-SEGMENT (clamped projection), so
  * coincident chord endpoints and hairpin shapes are handled. Vertices
  * at distance exactly `eps` are dropped (strictly-greater keeps), the
  * PostGIS convention.
  *
  * 100 TB shape: scan-local per-row work, O(n) memory, worst-case
  * O(n²) time only for adversarial zigzags (real road geometry is
  * near-linear); no shuffle, pipelines into whatever projection
  * follows.
  */
case class SimplifyLine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = left.dataType

  override def prettyName: String = "simplify_line"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: StructType, _), DoubleType)
          if s.size == 2 && s.forall(_.dataType == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simplify_line needs (ARRAY<STRUCT<double,double>>, DOUBLE), " +
            s"got (${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(line: Any, eps: Any): Any =
    SimplifyLine.evalLine(line.asInstanceOf[ArrayData],
      eps.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, e) => s"graft.functions.SimplifyLine.evalLine($l, $e)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SimplifyLine {
  /** Squared point-to-segment distance, planar. */
  private def segDist2(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 == 0.0) 0.0
      else {
        val raw = ((px - ax) * dx + (py - ay) * dy) / len2
        if (raw < 0.0) 0.0 else if (raw > 1.0) 1.0 else raw
      }
    val ex = px - (ax + t * dx); val ey = py - (ay + t * dy)
    ex * ex + ey * ey
  }

  /** Shared by interpreted eval and generated code. Named `evalLine`,
    * not `eval`: a companion method shadowing an inherited class member
    * gets no static forwarder and the generated call would silently
    * fall back to interpreted mode. */
  def evalLine(line: ArrayData, eps: Double): ArrayData = {
    val n = line.numElements()
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = line.getStruct(i, 2)
      xs(i) = p.getDouble(0); ys(i) = p.getDouble(1)
      i += 1
    }
    val keep = new Array[Boolean](n)
    if (n > 0) { keep(0) = true; keep(n - 1) = true }
    if (n > 2) {
      val eps2 = eps * eps
      // explicit int-pair stack: max depth n ranges, 2 slots each
      var stack = new Array[Int](64)
      var sp = 0
      def push(a: Int, b: Int): Unit = {
        if (sp + 2 > stack.length) stack = java.util.Arrays.copyOf(stack, stack.length * 2)
        stack(sp) = a; stack(sp + 1) = b; sp += 2
      }
      push(0, n - 1)
      while (sp > 0) {
        sp -= 2
        val a = stack(sp); val b = stack(sp + 1)
        if (b > a + 1) {
          var best = -1; var bestD = eps2
          var k = a + 1
          while (k < b) {
            val d = segDist2(xs(k), ys(k), xs(a), ys(a), xs(b), ys(b))
            if (d > bestD) { bestD = d; best = k }
            k += 1
          }
          if (best >= 0) { keep(best) = true; push(a, best); push(best, b) }
        }
      }
    }
    var m = 0
    i = 0
    while (i < n) { if (keep(i)) m += 1; i += 1 }
    val out = new Array[Any](m)
    var o = 0
    i = 0
    while (i < n) {
      if (keep(i)) {
        out(o) = new GenericInternalRow(Array[Any](xs(i), ys(i)))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
