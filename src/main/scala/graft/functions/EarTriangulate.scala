package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** Ear-clipping triangulation of a simple polygon ring
  * `ARRAY<STRUCT<lon,lat>>` (open ring, the engine's polygon model) →
  * `ARRAY` of CCW triangles, each `ARRAY<STRUCT<lon,lat>>` of size 3.
  * The triangles PARTITION the polygon interior (two-ears theorem), so
  * any convex-only kernel — [[Geo.convexClip]], point-in-convex tests —
  * extends to CONCAVE polygons by mapping over the triangles and
  * summing/unioning the per-triangle results. This is the missing half
  * of general `ST_Intersection(polygon, polygon)`
  * (osm-road-graphs-fix.sql:96): admin/boundary clip polygons are
  * routinely concave, where Sutherland–Hodgman alone is unsound.
  *
  * Why native: the ear search is a data-dependent mutating loop (find a
  * convex vertex whose triangle contains no other active vertex,
  * remove, repeat) — not expressible in array HOFs, and a UDF would box
  * every vertex. One primitive-array pass per row via `doGenCode`, same
  * pattern as [[SimplifyLine]].
  *
  * Semantics: input orientation is normalized to CCW (shoelace sign);
  * zero-area ears (collinear vertices) are dropped without emitting,
  * so the output area sum equals the polygon area. Rings with fewer
  * than 3 distinct non-collinear vertices yield an empty array. For
  * INVALID (self-intersecting) rings the decomposition is undefined but
  * the loop still terminates: when no strict ear exists, the first
  * convex vertex is clipped anyway.
  */
case class EarTriangulate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def prettyName: String = "ear_triangulate"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.size == 2 && s.forall(_.dataType == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ear_triangulate needs ARRAY<STRUCT<double,double>>, " +
            s"got ${t.catalogString}")
    }

  override protected def nullSafeEval(ring: Any): Any =
    EarTriangulate.evalRing(ring.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.EarTriangulate.evalRing($r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EarTriangulate {
  /** Shared by interpreted eval and generated code (named `evalRing`,
    * not `eval` — see the static-forwarder hazard note on
    * [[SimplifyLine.evalLine]]). */
  def evalRing(ring: ArrayData): ArrayData = {
    val n = ring.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = ring.getStruct(i, 2)
      xs(i) = p.getDouble(0); ys(i) = p.getDouble(1)
      i += 1
    }
    // normalize to CCW (positive shoelace)
    var s2 = 0.0
    i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      s2 += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    if (s2 < 0.0) {
      var a = 0; var b = n - 1
      while (a < b) {
        val tx = xs(a); xs(a) = xs(b); xs(b) = tx
        val ty = ys(a); ys(a) = ys(b); ys(b) = ty
        a += 1; b -= 1
      }
    }
    // doubly-linked active ring over indices
    val nxt = Array.tabulate(n)(i => (i + 1) % n)
    val prv = Array.tabulate(n)(i => (i + n - 1) % n)
    def cross(a: Int, b: Int, c: Int): Double =
      (xs(b) - xs(a)) * (ys(c) - ys(a)) - (ys(b) - ys(a)) * (xs(c) - xs(a))
    // NON-strict containment: a vertex exactly ON the candidate ear's
    // boundary blocks it. With a strict test, a reflex vertex sitting
    // on the a–c diagonal (square minus an L whose notch corner lies on
    // the diagonal) lets an ear through whose diagonal EXITS the
    // polygon — the triangles then overlap the notch and the area sum
    // is wrong. For simple polygons a valid ear never has another
    // vertex on its closed boundary (collinear chains are consumed by
    // the zero-area cr==0 branch first), so blocking on touch costs
    // nothing; truly degenerate rings still terminate via the
    // earless-pass fallback below.
    def blocksEar(p: Int, a: Int, b: Int, c: Int): Boolean =
      cross(a, b, p) >= 0.0 && cross(b, c, p) >= 0.0 && cross(c, a, p) >= 0.0
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(0, n - 2))
    def emit(a: Int, b: Int, c: Int): Unit =
      out += new GenericArrayData(Array[Any](
        new GenericInternalRow(Array[Any](xs(a), ys(a))),
        new GenericInternalRow(Array[Any](xs(b), ys(b))),
        new GenericInternalRow(Array[Any](xs(c), ys(c)))))
    var remaining = n
    var cur = 0
    var sinceEar = 0
    while (remaining > 3) {
      val a = prv(cur); val c = nxt(cur)
      val cr = cross(a, cur, c)
      var isEar = false
      if (cr == 0.0) {
        isEar = true // zero-area ear: clip away, emit nothing
      } else if (cr > 0.0) {
        isEar = true
        var p = nxt(c)
        while (isEar && p != a) {
          if (blocksEar(p, a, cur, c)) isEar = false
          p = nxt(p)
        }
        // invalid-ring termination guard: after a full earless pass,
        // clip the first convex vertex regardless of containment
        if (!isEar && sinceEar >= remaining) isEar = true
      } else if (sinceEar >= 2 * remaining) {
        // all-reflex (impossible for simple rings): drop a vertex
        // without emitting so the loop always terminates
        isEar = true
      }
      if (isEar) {
        if (cr > 0.0) emit(a, cur, c)
        nxt(a) = c; prv(c) = a
        remaining -= 1
        cur = c
        sinceEar = 0
      } else {
        cur = nxt(cur)
        sinceEar += 1
      }
    }
    val a0 = cur; val b0 = nxt(cur); val c0 = nxt(b0)
    if (cross(a0, b0, c0) > 0.0) emit(a0, b0, c0)
    new GenericArrayData(out.toArray)
  }
}
