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

  // a space can't occur in symbols ([a-z]+ alphabet + concatenations),
  // so "<l> <r>" is an unambiguous pair key for the batch-merge map
  private def pairKey(l: Column, r: Column): Column =
    concat(l, lit(" "), r)

  private def batchMap(pairs: Seq[(String, String)]): Column =
    map(pairs.flatMap { case (l, r) =>
      Seq(lit(l + " " + r), lit(l + r)) }: _*)

  /** True iff `syms` contains ANY of the batch's pairs adjacently. */
  private[graft] def hasAdjacentAny(syms: Column,
      pairs: Seq[(String, String)]): Column = {
    val m = batchMap(pairs)
    val n = size(syms)
    exists(arrays_zip(
        slice(syms, lit(1), n - 1).as("l"), slice(syms, lit(2), n - 1).as("r")),
      p => element_at(m, pairKey(p.getField("l"), p.getField("r"))).isNotNull)
  }

  /** One combined greedy pass applying a SYMBOL-DISJOINT batch of
    * merges — same fold as [[mergeOnce]] with a map lookup instead of
    * one literal pair. Because no two batch pairs share a symbol,
    * their merge sites can't overlap, so one combined left-to-right
    * pass produces exactly the result of applying each pair's own
    * pass in sequence (any order). */
  private[graft] def mergeBatch(syms: Column,
      pairs: Seq[(String, String)]): Column = {
    val m = batchMap(pairs)
    val init = struct(
      array().cast("array<string>").as("acc"),
      lit(null).cast("string").as("p"))
    aggregate(syms, init,
      (st, x) => {
        val acc = st.getField("acc")
        val p = st.getField("p")
        val merged = element_at(m, pairKey(p, x))
        when(p.isNotNull && merged.isNotNull,
          struct(concat(acc, array(merged)).as("acc"),
            lit(null).cast("string").as("p")))
        .otherwise(
          struct(when(p.isNull, acc).otherwise(concat(acc, array(p))).as("acc"),
            x.as("p")))
      },
      st => when(st.getField("p").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("p")))))
  }

  /** The SEQUENCE-PRESERVING batch of merges from a sorted top-K
    * candidate window `(l, r, c)` (count desc, then (l, r) asc):
    * greedily accept a PREFIX whose pairs are pairwise symbol-disjoint
    * (merged symbols included — a later candidate naming an accepted
    * merge's output string would see new occurrences), stop at the
    * first conflicting candidate, and keep only candidates whose count
    * is STRICTLY above the first rejected/unknown candidate's count.
    *
    * Why this equals the one-merge-at-a-time sequence: merging (x, y)
    * only changes counts of pairs sharing x or y (destroyed neighbors)
    * or naming the merged symbol (created neighbors (w, xy), whose
    * count is bounded by count(w, x) — a sharing pair). Every sharing
    * pair sorts at or after the first rejected candidate, so its count
    * — and every created pair's — is <= that candidate's count, i.e.
    * strictly below every accepted candidate's. Accepted candidates'
    * own counts are exactly invariant under each other's merges, and
    * old pairs never gain count, so after applying accepted merges
    * 1..i-1 the (count desc, l, r) winner is exactly candidate i.
    * The strictness cut is what handles ties: a created pair could TIE
    * a kept candidate's count and win on lexicographic order.
    * `maxAccept` caps the batch (remaining merge budget). The head
    * candidate (the true sequential winner) is always accepted. */
  private[graft] def planBatch(top: Seq[(String, String, Long)],
      windowFull: Boolean, maxAccept: Int): Seq[(String, String)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val accepted = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var tailCount = -1L
    var stopped = false
    top.foreach { case cand @ (l, r, c) =>
      if (!stopped) {
        if (accepted.size >= maxAccept) { tailCount = c; stopped = true }
        else if (used(l) || used(r)) { tailCount = c; stopped = true }
        else {
          accepted += cand
          used += l; used += r; used += (l + r)
        }
      }
    }
    // whole window accepted: candidates beyond it are unknown but
    // bounded by the window's last count (sorted desc)
    if (!stopped && windowFull && top.nonEmpty) tailCount = top.last._3
    accepted.toList match {
      case head :: tail =>
        (head :: tail.takeWhile(_._3 > tailCount)).map(t => (t._1, t._2))
      case Nil => Nil
    }
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
    * Per round: one TakeOrdered window off the cached counts table,
    * one filter scan of the cached vocab, one pair hash-agg over
    * affected words only, one counts-sized merge agg. `localCheckpoint`
    * (not persist) on both rolling tables — 256+ rounds of
    * filter+union would otherwise nest the logical plan 256 deep and
    * stall the planner (the [[graft.osm.GraphCheck]] loop policy).
    *
    * BATCHED rounds: a 32k-merge production vocabulary at one shuffle
    * round per merge is hours of fixed per-round cost, so each round
    * pulls the top-`batchWindow` candidates and applies the
    * [[planBatch]] symbol-disjoint prefix — PROVABLY the same merge
    * sequence as one-at-a-time (see planBatch), just fewer shuffle
    * rounds. `batchWindow = 1` reproduces the classic loop shape. */
  def trainBpe(wordCounts: DataFrame, numMerges: Int,
      localThreshold: Long = 100000L,
      batchWindow: Int = 64): Seq[(String, String)] = {
    if (localThreshold > 0 &&
        wordCounts
          .limit(math.min(localThreshold + 1, Int.MaxValue.toLong).toInt)
          .count() <= localThreshold) {
      val local = wordCounts.collect()
        .map(r => (r.getString(0).map(_.toString).toIndexedSeq, r.getLong(1)))
      return trainBpeLocal(local, numMerges)
    }
    val spark = wordCounts.sparkSession
    import spark.implicits._
    var words = wordCounts
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .localCheckpoint(true)
    // counts is pair-vocabulary sized (alphabet² at most early) — one
    // partition keeps the per-round top-K and merge-agg jobs 1-task
    var counts = pairCounts(words).coalesce(1).localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    var rounds = 0
    while (continue && merges.size < numMerges) {
      val top = counts
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(batchWindow).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val batch = planBatch(top, windowFull = top.size >= batchWindow,
        maxAccept = numMerges - merges.size)
      if (batch.isEmpty) continue = false
      else {
        merges ++= batch
        // ONE typed pass rewrites every word and carries the pre-merge
        // symbols of changed words for the delta (null when untouched).
        // A plain-Scala greedy pass, not the Column `aggregate` fold:
        // the fold carries a struct + array-concat per element —
        // O(len²) interpreted column ops per word, measured as the
        // round's dominant cost at 145k words. Same per-word greedy
        // semantics as [[mergeLocal]]; batch disjointness makes the
        // combined pass equal the per-pair sequential passes.
        val bm = batch.map { case (l, r) => (l, r) -> (l + r) }.toMap
        val rewritten = words.as[(Seq[String], Long)]
          .mapPartitions { it =>
            it.map { case (syms, cnt) =>
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var changed = false
              var i = 0
              while (i < syms.length) {
                val m = if (i < syms.length - 1)
                  bm.getOrElse((syms(i), syms(i + 1)), null) else null
                if (m != null) { out += m; changed = true; i += 2 }
                else { out += syms(i); i += 1 }
              }
              (out.toSeq, if (changed) syms else null, cnt)
            }
          }
          .toDF("syms", "old_syms", "cnt")
          .localCheckpoint(true) // the round's ONE eager vocab-scan job
        words = rewritten.select("syms", "cnt")
        val changed = rewritten.filter(col("old_syms").isNotNull)
        val delta = pairCounts(
          changed.select(col("syms"), col("cnt")).unionByName(
            changed.select(col("old_syms").as("syms"), (-col("cnt")).as("cnt"))))
          .filter(col("c") =!= 0)
        // LAZY checkpoint: still truncates the plan immediately, but
        // materializes inside the next round's top-K job instead of
        // as its own blocking job — one fewer job boundary per round
        counts = counts.unionByName(delta)
          .groupBy("l", "r").agg(sum("c").as("c"))
          .filter(col("c") > 0)
          .coalesce(1)
          .localCheckpoint(false)
      }
      rounds += 1
    }
    System.err.println(s"[bpe] ${merges.size} merges in $rounds shuffle " +
      s"rounds (window $batchWindow)")
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
