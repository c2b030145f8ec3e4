package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd `UnaryExpression` — the
  * canonical-composition pass a text-curation pipeline runs BEFORE any
  * hash-keyed operator: "café" in composed (U+00E9) and decomposed
  * (e + U+0301) forms is the same text to a reader but a different md5,
  * a different shingle set, and a different minhash signature — without
  * normalization, visually identical near-duplicates silently survive
  * every dedup pass.
  *
  * Same implementation shape as [[ExtractInts]]: `doGenCode` emits one
  * static call, so the expression stays inside whole-stage codegen (a
  * Scala UDF would box every row). The JDK's `java.text.Normalizer` is
  * the normalization engine — deterministic, no external dependency.
  * Already-normalized ASCII short-circuits via `Normalizer.isNormalized`
  * (the overwhelmingly common case in real corpora) without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
