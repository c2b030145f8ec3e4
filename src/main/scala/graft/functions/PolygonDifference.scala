package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** General `ST_Difference(polygon, polygon)` as `ST_Dump`-style convex
  * pieces: triangulate BOTH rings ([[EarTriangulate.evalRing]] —
  * concave-capable), then subtract each clip triangle from every
  * surviving subject piece via the half-plane decomposition (for
  * triangle edge j: the part INSIDE edges 0..j−1 and OUTSIDE edge j —
  * ≤3 disjoint convex pieces per subtraction, residue inside all three
  * edges is the intersection, discarded). Clip triangles partition the
  * clip interior, so the sequential fold subtracts the whole polygon;
  * surviving pieces tile `subject ∖ clip` exactly. Piece boundaries
  * along triangulation diagonals are decomposition artifacts (the
  * [[Geo.intersectionPieces]] caveat) but membership and area are
  * exact.
  *
  * Why native (the [[EarTriangulate]] rationale, squared): the
  * column-expression formulation nests three Sutherland–Hodgman clip
  * stages per triangle inside two HOF lambdas — the tree is tens of
  * thousands of Catalyst nodes and ANALYSIS dominates runtime (14 s to
  * plan a 7-row fixture). Here the whole fold is one primitive-array
  * pass per row via `doGenCode`; plan cost is one function call node.
  *
  * Input/output: two open rings `ARRAY<STRUCT<lon,lat>>` (any
  * orientation) → `ARRAY` of convex CCW rings. Degenerate slivers
  * (< 3 vertices or |area| ≤ 1e-15) are dropped. */
case class PolygonDifference(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(left.dataType, containsNull = false)

  override def prettyName: String = "polygon_difference"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(s: StructType, _)
          if s.size == 2 && s.forall(_.dataType == DoubleType) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polygon_difference needs two ARRAY<STRUCT<double,double>>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(subj: Any, clip: Any): Any =
    PolygonDifference.evalDiff(subj.asInstanceOf[ArrayData],
      clip.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, c) =>
      s"graft.functions.PolygonDifference.evalDiff($s, $c)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PolygonDifference {
  /** A convex piece as parallel coordinate arrays. */
  private final class Piece(val xs: Array[Double], val ys: Array[Double]) {
    def n: Int = xs.length
  }

  private def area2(xs: Array[Double], ys: Array[Double]): Double = {
    var s = 0.0; var i = 0; val n = xs.length
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    s
  }

  /** One Sutherland–Hodgman pass of `p` against the line a→b, keeping
    * the left side when `keepLeft` (the inside of a CCW edge) else the
    * right. Boundary vertices belong to both sides. Mirrors
    * [[Geo.clipHalfPlane]]: a zero denominator with straddling sides
    * (float rounding on a near-parallel edge) degrades to the segment
    * start. Returns null when fewer than 3 vertices survive. */
  private def clip(p: Piece, ax: Double, ay: Double, bx: Double, by: Double,
      keepLeft: Boolean): Piece = {
    val ex = bx - ax; val ey = by - ay
    val n = p.n
    val ox = new Array[Double](2 * n + 4)
    val oy = new Array[Double](2 * n + 4)
    var m = 0
    var i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val sx = p.xs(i); val sy = p.ys(i)
      val tx = p.xs(j); val ty = p.ys(j)
      val cs = ex * (sy - ay) - ey * (sx - ax)
      val ct = ex * (ty - ay) - ey * (tx - ax)
      val sIn = if (keepLeft) cs >= 0.0 else cs <= 0.0
      val tIn = if (keepLeft) ct >= 0.0 else ct <= 0.0
      if (sIn != tIn) {
        val dx = tx - sx; val dy = ty - sy
        val den = ey * dx - ex * dy
        val tt = if (den == 0.0) 0.0 else cs / den
        ox(m) = sx + tt * dx; oy(m) = sy + tt * dy; m += 1
      }
      if (tIn) { ox(m) = tx; oy(m) = ty; m += 1 }
      i += 1
    }
    if (m < 3) null
    else new Piece(java.util.Arrays.copyOf(ox, m), java.util.Arrays.copyOf(oy, m))
  }

  def evalDiff(subj: ArrayData, clipRing: ArrayData): ArrayData = {
    // subject pieces = subject triangulation
    val subjTris = EarTriangulate.evalRing(subj)
    var pcs = new scala.collection.mutable.ArrayBuffer[Piece](subjTris.numElements())
    var i = 0
    while (i < subjTris.numElements()) {
      val tri = subjTris.getArray(i)
      val xs = new Array[Double](3); val ys = new Array[Double](3)
      var k = 0
      while (k < 3) {
        val p = tri.getStruct(k, 2)
        xs(k) = p.getDouble(0); ys(k) = p.getDouble(1)
        k += 1
      }
      pcs += new Piece(xs, ys)
      i += 1
    }
    val clipTris = EarTriangulate.evalRing(clipRing)
    var t = 0
    while (t < clipTris.numElements() && pcs.nonEmpty) {
      val tri = clipTris.getArray(t)
      val tx = new Array[Double](3); val ty = new Array[Double](3)
      var k = 0
      while (k < 3) {
        val p = tri.getStruct(k, 2)
        tx(k) = p.getDouble(0); ty(k) = p.getDouble(1)
        k += 1
      }
      val next = new scala.collection.mutable.ArrayBuffer[Piece](pcs.length)
      var pi = 0
      while (pi < pcs.length) {
        var cur = pcs(pi) // remainder still inside all edges seen so far
        var e = 0
        while (e < 3 && cur != null) {
          val j = if (e == 2) 0 else e + 1
          val out = clip(cur, tx(e), ty(e), tx(j), ty(j), keepLeft = false)
          if (out != null && math.abs(area2(out.xs, out.ys)) > 2e-15)
            next += out
          cur = clip(cur, tx(e), ty(e), tx(j), ty(j), keepLeft = true)
          e += 1
        }
        // cur (inside all three edges) = piece ∩ triangle: discarded
        pi += 1
      }
      pcs = next
      t += 1
    }
    new GenericArrayData(pcs.map { p =>
      val rows = new Array[Any](p.n)
      var k = 0
      while (k < p.n) {
        rows(k) = new GenericInternalRow(Array[Any](p.xs(k), p.ys(k)))
        k += 1
      }
      new GenericArrayData(rows): Any
    }.toArray)
  }
}
