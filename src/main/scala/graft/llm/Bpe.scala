package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed byte-pair-encoding (BPE) vocabulary training — the
  * standard tokenizer-prep job of a training-data pipeline (Sennrich
  * et al., ACL 2016: iterated merging of the most frequent adjacent
  * symbol pair).
  *
  * Scale shape: the 100 TB part is the ONE corpus scan that builds the
  * word-frequency table ([[wordCounts]] — hash agg, corpus-sized
  * input, vocabulary-sized output). Training then iterates over that
  * unique-words table only: each merge round is ONE hash-agg shuffle
  * (adjacent-pair counting weighted by word frequency) + a driver
  * top-1, and the merged words re-cache so every round reads the
  * previous round's vocabulary-sized cache, never the corpus. Below
  * `localThreshold` unique words the whole loop runs on the driver
  * (same merges bit-for-bit — the graph operators' local fast-path
  * policy).
  *
  * Determinism contract (shared with the DuckDB oracle): pairs count
  * every adjacent occurrence (overlapping included: [a,a,a] counts
  * (a,a) twice); the winning pair is max count, ties to the
  * lexicographically smallest (left, right); a merge pass rewrites
  * non-overlapping occurrences left-to-right ([a,a,a] -> [aa,a]).
  */
object Bpe {

  /** Word-frequency table `(word, cnt)` over a text column: lowercase,
    * `[a-z]+` word extraction. The one corpus-sized job of BPE
    * training; everything after operates on its (vocabulary-sized)
    * output. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(
        regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** All adjacent symbol pairs of one round, weighted by word count:
    * `(l, r, c)`. One hash-agg — the round's only shuffle (asserted by
    * BpeSpec's plan audit). */
  private[graft] def pairCounts(words: DataFrame): DataFrame = {
    val n = size(col("syms"))
    words
      .select(col("cnt"), explode(arrays_zip(
        slice(col("syms"), lit(1), n - 1).as("l"),
        slice(col("syms"), lit(2), n - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("c"))
  }

  /** One greedy merge pass over a symbol array as a fold: carry
    * (accumulated array, pending symbol); when (pending, current)
    * equals the winning pair, emit the merged symbol and clear pending
    * so the merged token cannot cascade within the same pass —
    * exactly the left-to-right non-overlapping rewrite the oracle's
    * string `replace` performs. */
  private[graft] def mergeOnce(syms: Column, l: String, r: String): Column = {
    val init = struct(
      array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("p"))
    aggregate(syms, init,
      (st, x) => {
        val acc = st.getField("acc")
        val p = st.getField("p")
        when(p === lit(l) && x === lit(r),
          struct(concat(acc, array(lit(l + r))).as("acc"),
            lit(null).cast("string").as("p")))
        .otherwise(
          struct(when(p.isNull, acc).otherwise(concat(acc, array(p))).as("acc"),
            x.as("p")))
      },
      st => when(st.getField("p").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("p")))))
  }

  /** True iff `syms` contains the ADJACENT pair (l, r) — the words a
    * merge round actually touches. Same zip shape as [[pairCounts]]. */
  private[graft] def hasAdjacentPair(syms: Column, l: String,
      r: String): Column = {
    val n = size(syms)
    exists(arrays_zip(
        slice(syms, lit(1), n - 1).as("l"), slice(syms, lit(2), n - 1).as("r")),
      p => p.getField("l") === lit(l) && p.getField("r") === lit(r))
  }

  /** Train `numMerges` BPE merges over a `(word, cnt)` table. Returns
    * the ranked merge list — driver-sized (the model).
    *
    * Distributed loop with INCREMENTAL pair-count maintenance (the
    * fastBPE/ tokenizers-style bookkeeping, distributed): the pair
    * table is built ONCE, and each round delta-updates it from only
    * the words that CONTAIN the winning pair adjacently — subtract
    * those words' old pair multiset, add their post-merge multiset,
    * fold into the counts table. A full recount touches every word
    * every round (the r13 watch item at real vocab sizes: 4M words x
    * 50k merges = 200G word-rescans); the delta touches the affected
    * slice, which shrinks fast as merges specialize (the winning
    * pair's host words are a vanishing vocabulary fraction after the
    * first dozen rounds). Exactness: counts' = counts + delta is
    * integer arithmetic — bit-identical merges to the full recount
    * and to [[trainBpeLocal]] (spec-gated).
    *
    * Per round: TakeOrdered(1) off the cached counts table, one
    * filter scan of the cached vocab, one pair hash-agg over affected
    * words only, one counts-sized merge agg. `localCheckpoint` (not
    * persist) on both rolling tables — 256+ rounds of filter+union
    * would otherwise nest the logical plan 256 deep and stall the
    * planner (the [[graft.osm.GraphCheck]] loop policy). */
  def trainBpe(wordCounts: DataFrame, numMerges: Int,
      localThreshold: Long = 100000L): Seq[(String, String)] = {
    if (localThreshold > 0 &&
        wordCounts
          .limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val local = wordCounts.collect()
        .map(r => (r.getString(0).map(_.toString).toIndexedSeq, r.getLong(1)))
      return trainBpeLocal(local, numMerges)
    }
    var words = wordCounts
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .localCheckpoint(true)
    var counts = pairCounts(words).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    for (_ <- 1 to numMerges if continue) {
      val top = counts
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) continue = false
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        val hit = hasAdjacentPair(col("syms"), l, r)
        val affected = words.filter(hit)
        val mergedW = affected
          .select(mergeOnce(col("syms"), l, r).as("syms"), col("cnt"))
          .localCheckpoint(true) // read twice: next vocab + delta
        val delta = pairCounts(mergedW.unionByName(
          affected.select(col("syms"), (-col("cnt")).as("cnt"))))
          .filter(col("c") =!= 0)
        // coalesce BEFORE the checkpoint: filter∪union preserves parent
        // partitions, so without it the vocab table GAINS ~one task set
        // per round — 48 rounds measured 37 min from quadratic task
        // counts alone; coalesced it's minutes. No shuffle (narrow).
        val parts = words.rdd.getNumPartitions min
          words.sparkSession.sparkContext.defaultParallelism
        words = words.filter(!hit).unionByName(mergedW)
          .coalesce(parts)
          .localCheckpoint(true)
        counts = counts.unionByName(delta)
          .groupBy("l", "r").agg(sum("c").as("c"))
          .filter(col("c") > 0)
          .localCheckpoint(true)
      }
    }
    merges.toList
  }

  /** Driver-local training loop — identical merges to the distributed
    * path by construction (same count/tie/rewrite rules). */
  private[graft] def trainBpeLocal(words: Seq[(IndexedSeq[String], Long)],
      numMerges: Int): Seq[(String, String)] = {
    var ws = words
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    for (_ <- 1 to numMerges if continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      ws.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        ws = ws.map { case (syms, cnt) => (mergeLocal(syms, best), cnt) }
      }
    }
    merges.toList
  }

  /** Greedy left-to-right non-overlapping merge pass (local form of
    * [[mergeOnce]]). */
  private[graft] def mergeLocal(syms: IndexedSeq[String],
      pair: (String, String)): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += pair._1 + pair._2
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toIndexedSeq
  }

  /** Retokenize a corpus with a trained merge list: per word, apply
    * each merge in rank order as one greedy pass (Sennrich's apply —
    * replays training exactly, so a word seen at train time tokenizes
    * to its final train-time symbols). The merge list is driver-sized
    * model state captured into the closure (broadcast by the task
    * serializer); the pass is inherently sequential per word, so this
    * is a typed mapPartitions stage (the multimodal-codec policy), not
    * an expression. Output: `(idCol, tokens ARRAY<STRING>)`, tokens in
    * document order. */
  def applyBpe(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges.toArray
    val wordRe = "[a-z]+".r
    docs.select(col(idCol).cast("long"), lower(col(textCol)))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition memo: corpora repeat words heavily, and one
        // word's tokenization is pure
        val memo = scala.collection.mutable.Map.empty[String, Seq[String]]
        def tok(w: String): Seq[String] = memo.getOrElseUpdate(w, {
          var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
          ms.foreach { m =>
            if (syms.length > 1) syms = mergeLocal(syms, m)
          }
          syms
        })
        it.map { case (id, text) =>
          (id, wordRe.findAllIn(if (text == null) "" else text)
            .flatMap(tok).toSeq)
        }
      }
      .toDF(idCol, "tokens")
  }
}
