package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `get_ints_from_text`
  * scalar UDF (general-functions.sql:3-5): extract every run of digits
  * from a string as an `ARRAY<INT>` (e.g. "50 mph" -> [50],
  * "1-URGENT" -> [1]).
  *
  * Implemented as a codegen'd `UnaryExpression` (SURVEY §2.10 X1) rather
  * than a Scala UDF so it stays inside whole-stage codegen: `doGenCode`
  * emits a direct static call, no serialization or row boxing.
  *
  * Deviation from PG (documented): PG casts each digit run with `::int`
  * and would raise on runs exceeding 2^31-1; we drop such runs instead
  * of failing the job — OSM tag values never hit this.
  */
case class ExtractInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "get_ints_from_text"

  override protected def nullSafeEval(input: Any): Any =
    ExtractInts.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExtractInts.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractInts {
  /** Shared by interpreted eval and generated code. */
  def extract(s: UTF8String): ArrayData = {
    val parts = s.toString.split("[^0-9]+")
    val out = new java.util.ArrayList[Any](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty) {
        val t = p.replaceFirst("^0+(?=.)", "")
        if (t.length <= 10) {
          val v = t.toLong
          if (v <= Int.MaxValue) out.add(v.toInt)
        }
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }
}
