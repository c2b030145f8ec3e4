package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing the Gopher-style within-document
  * repetition features from a whitespace-token array in ONE pass:
  *
  *   - `dup_token_frac`  = (n_tokens - n_distinct_tokens) / n_tokens
  *   - `top_bigram_frac` = count of the most frequent adjacent bigram
  *                         divided by the total bigram count (n - 1)
  *
  * Why native: the previous formulation built the bigram array with a
  * `transform(sequence(...))` HOF, sorted it, and folded a 3-field
  * struct accumulator through `aggregate` — every one of those
  * higher-order functions is CodegenFallback (interpreted, one boxed
  * lambda call and one GenericInternalRow per element), and projecting
  * two fields from the resulting `struct(...)` made Catalyst's
  * SimplifyExtractValueOps inline the whole subtree once PER FIELD.
  * Measured cost: 42 s of a 125 s bench at sf0.1. Here the same numbers
  * come from one O(n) loop (HashSet for distinct tokens, HashMap for
  * bigram counts — no sort needed just for a max), emitted through
  * `doGenCode` as a direct static call so it stays inside whole-stage
  * codegen, the same pattern as [[ExtractInts]] / [[MatVec]].
  *
  * Semantics match the relational oracle exactly: bigram identity is the
  * space-joined token pair (tokens cannot contain whitespace, so the
  * join is unambiguous); both fractions round to 4 places with
  * BigDecimal HALF_UP — bit-identical to Spark's `round` and DuckDB's
  * `round` for these non-negative values. A document with fewer than two
  * tokens has no bigrams and scores `top_bigram_frac = 0.0` (the
  * previous HOF form THREW here: `sequence(1, 0)` evaluates to the
  * descending array `[1, 0]`, sending `element_at(toks, 0)` into ANSI
  * errors — real corpora always contain empty/one-token docs).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats needs ARRAY<STRING>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.evalTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RepetitionStats.evalTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared by interpreted eval and generated code. Null array elements
    * (impossible from `split`, but the type allows them) count as the
    * empty token — detected via `isNullAt`, which every ArrayData
    * implementation honors; `getUTF8String` on a null slot returns null
    * only for GenericArrayData, so a null-compare there would make the
    * semantics depend on the array's physical format (ADVICE r6).
    *
    * Named `evalTokens`, NOT `eval`: the case class inherits
    * `Expression.eval(InternalRow)`, and a same-named companion method
    * gets NO static forwarder — the generated static call then fails
    * Janino compilation and the projection silently degrades to
    * interpreted mode (found via the UnsafeProjection fallback WARN). */
  def evalTokens(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0.0, 0.0))
    val distinct = new java.util.HashSet[UTF8String](n * 2)
    val bigrams = new java.util.HashMap[UTF8String, Int]()
    var best = 0
    var prev: UTF8String = null
    val space = UTF8String.fromString(" ")
    val empty = UTF8String.EMPTY_UTF8
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) empty else toks.getUTF8String(i)
      distinct.add(t)
      if (i > 0) {
        val key = UTF8String.concat(prev, space, t)
        val c = bigrams.getOrDefault(key, 0) + 1
        bigrams.put(key, c)
        if (c > best) best = c
      }
      prev = t
      i += 1
    }
    val dup = round4((n - distinct.size).toDouble / n)
    val top = if (n >= 2) round4(best.toDouble / (n - 1)) else 0.0
    new GenericInternalRow(Array[Any](dup, top))
  }
}
