package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-curation operators: deterministic sampling / split assignment
  * and benchmark decontamination. Beyond the reference's surface — part
  * of the engine's training-data-pipeline family (SURVEY §2 sibling of
  * the dedup/quality operators).
  *
  * Every operator here is DETERMINISTIC BY CONSTRUCTION (hash-derived,
  * not RNG-derived): at 100 TB, sampling decisions must be reproducible
  * across reruns, engines, and partitionings — `rand()` is none of
  * those. The hash family is the portable md5 one (Dedup.md5Hash31's
  * sibling) so an independent SQL engine reproduces every decision
  * bit-for-bit.
  */
object Curation {

  /** Uniform-in-[0,1) from the first 32 md5 bits of the key — the
    * standard deterministic sampling coin. Same doubles in any engine
    * that can md5 (4294967296 = 2^32; the 32-bit int is exact in a
    * double, so the comparison against a rate is exact too). */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Stratified deterministic sampling: keep a row iff its hash coin is
    * under its stratum's rate. Missing strata default to `defaultRate`.
    * One narrow scan — no shuffle, no RNG, rerun-stable. */
  def sampleByHash(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val rateCol = coalesce(
      element_at(typedlit(rates), stratum), lit(defaultRate))
    df.filter(hashUniform(key) < rateCol)
  }

  /** Deterministic train/val/test assignment from the same coin:
    * [0, train) -> "train", [train, train+val) -> "val", else "test".
    * A document's split never changes when the corpus around it does —
    * the property RNG-based splitting lacks. */
  def splitAssign(key: Column, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): Column = {
    val u = hashUniform(key)
    when(u < trainFrac, "train")
      .when(u < trainFrac + valFrac, "val")
      .otherwise("test")
  }

  /** Fixed-size deterministic per-stratum sample: the `n` rows with the
    * smallest hash coins in each stratum — what reservoir sampling gives
    * you, but reproducible (same members every rerun, any partitioning,
    * any engine) and distributed (one shuffle on the stratum key; the
    * ranking window never sees more than a stratum per partition).
    * Ties cannot happen: coins are injective on distinct keys up to md5
    * collisions. */
  def sampleFixedPerStratum(df: DataFrame, key: Column, stratum: Column,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(hashUniform(key), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Benchmark decontamination: drop every document sharing ANY word
    * `n`-gram with the benchmark set. Scale shape: the benchmark gram
    * set is tiny relative to the corpus, so Catalyst broadcasts it into
    * a LeftSemi over the exploded corpus grams (one narrow pass over
    * the big side, no shuffle of the corpus), then contaminated ids
    * anti-join back — never a cross product, never a corpus-sized
    * shuffle. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String,
      text: Column, n: Int = 8): DataFrame = {
    val benchGrams = benchmark
      .select(explode(Dedup.wordNgrams(text, n)).as("__g"))
      .distinct()
    val contaminated = docs
      .select(col(idCol), explode(Dedup.wordNgrams(text, n)).as("__g"))
      .join(benchGrams, Seq("__g"), "left_semi")
      .select(idCol).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}
