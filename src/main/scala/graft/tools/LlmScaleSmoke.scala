package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Curation, Dedup, TextAnalysis}

/** Scale-headroom smoke for the LLM dedup/curation hot path: synthesizes
  * a document corpus straight from `spark.range` (no files — measures the
  * operators, not the scan) and times the three heaviest curation
  * operators at a base scale and at `factor` times that scale, reporting
  * the empirical scaling exponent log(t_hi/t_lo)/log(factor) for each:
  *
  *   - `Dedup.minhashNearDups`  — shingle -> minhash -> banded LSH join
  *     -> exact-Jaccard verify (the full near-dup chain);
  *   - `Dedup.simhashNearDups`  — native SimhashAgg fingerprint ->
  *     2-of-(maxDist+2) composite-chunk pigeonhole join -> hamming
  *     verify;
  *   - `Curation.decontaminate` — word-8-gram broadcast semi-join against
  *     a benchmark set, then anti-join.
  *
  * The corpus is adversarially shaped like real near-dup data, not random
  * noise: every 100th document is a 49/50-word copy of its neighbor (so
  * LSH finds true pairs in numbers proportional to n, exercising the
  * verify stage). A constant pair density per document is what makes the
  * exponent meaningful: superlinear growth here means the banding/
  * bucketing is degenerating into all-pairs, not that the fixture got
  * denser. The decontamination benchmark set is a FIXED 10k documents
  * (sharing the corpus's first 10k ids, so hits exist) regardless of
  * corpus size — that matches reality (benchmark suites don't grow with
  * the training corpus) and keeps the gram set broadcast-sized, which is
  * the operator's documented contract: an early version of this fixture
  * scaled the benchmark WITH the corpus and measured exponent 1.25, the
  * broadcast semi-join silently degrading to sort-merge once the gram
  * set crossed the broadcast threshold.
  *
  * Prints one JSON line. `runMain graft.tools.LlmScaleSmoke [baseDocsK]
  * [factor]` (defaults 300 and 10: 300k docs vs 3M docs — the base must
  * be big enough that per-job fixed costs don't dominate the low-scale
  * timing, or the exponent reads as spuriously sublinear; a 100k-doc
  * probe measured simhash FASTER at 1M than at 100k, i.e. pure noise).
  */
object LlmScaleSmoke {
  /** ~50-word documents, 6-hex-char words, deterministic in id. Doc ids
    * with id % 100 == 1 repeat doc id-1's first 49 words (true near-dup
    * at Jaccard well above any sane threshold); all other docs are
    * unique with high probability.
    *
    * Generated in a typed mapPartitions with MessageDigest, NOT a
    * Column `transform(..., md5(...))` HOF: higher-order functions are
    * interpreted Expressions, and 50 interpreted md5 evals per doc x 3M
    * docs dominated (and JIT-destabilized) every operator measurement
    * that consumed the lazy corpus — the harness was measuring its own
    * generator. Strings are byte-identical to the previous SQL form:
    * first 6 hex chars of md5("<srcId>_<i>"). */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions { ids =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def word(srcId: Long, i: Int): String = {
        val d = md.digest(s"${srcId}_$i".getBytes("UTF-8"))
        // 6 hex chars = first 3 bytes
        val sb = new StringBuilder(6)
        var b = 0
        while (b < 3) {
          sb.append(Character.forDigit((d(b) >> 4) & 0xf, 16))
          sb.append(Character.forDigit(d(b) & 0xf, 16))
          b += 1
        }
        sb.toString
      }
      ids.map { id =>
        val sb = new StringBuilder(50 * 7)
        var i = 0
        while (i <= 49) {
          val srcId = if (id % 100 == 1 && i < 49) id - 1 else id
          if (i > 0) sb.append(' ')
          sb.append(word(srcId, i))
          i += 1
        }
        (id, sb.toString)
      }
    }.toDF("id", "text")
  }

  private def time(body: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val rows = body
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val hostBefore = HostRegime.loadavg()
    val baseK = if (args.nonEmpty) args(0).toDouble else 300.0
    val factor = if (args.length > 1) args(1).toDouble else 10.0
    // optional third arg: comma-separated op filter (dev iteration on
    // one op's exponent without the full 20-minute sweep)
    val opFilter = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    def wanted(op: String) = opFilter.isEmpty || opFilter(op)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nLo = (baseK * 1e3).toLong
    val nHi = (nLo * factor).toLong

    def runAll(n: Long): Map[String, (Double, Long)] = {
      val docs = corpus(spark, n)
      // fixed-size benchmark: ids overlap the corpus's first 10k docs
      val bench = corpus(spark, math.min(10000L, n / 2))
      // clearCache between ops: ngramLmScore persists its model
      // relation by contract; a stale cache would subsidize the next
      // op's timing and distort the exponent.
      // STEADY-STATE timing: each op runs twice, min wins. A fresh
      // JVM's first execution of a heavy generated method runs
      // interpreted until C2 lands — measured up to 8x the compiled
      // rate, landing randomly on the lo or hi scale and corrupting
      // the exponent (r16 observed the same binary report simhash
      // exponents 0.50 and 1.27 run-to-run). The exponent question is
      // "does the ALGORITHM degenerate with n", so the compiled rate
      // is the honest measurand; nothing is cached between the two
      // runs (clearCache after each), only code warmth carries over.
      def timed(body: => Long): (Double, Long) = {
        val r1 = time(body); spark.catalog.clearCache()
        val r2 = time(body); spark.catalog.clearCache()
        (math.min(r1._1, r2._1), r2._2)
      }
      // an ordered Seq of thunks, NOT a Map of eager values: a >4-entry
      // Scala Map hash-scrambles iteration order, and op order matters
      // to the measurement (an op timed after the heavy new ones
      // inherits their GC/old-gen pressure — observed as a phantom
      // decontam exponent jump 0.92 -> 1.26)
      val ops: Seq[(String, () => Long)] = Seq(
        "minhash" -> (() =>
          Dedup.minhashNearDups(docs, "id", col("text")).count()),
        "simhash" -> (() =>
          Dedup.simhashNearDups(docs, "id", col("text")).count()),
        "decontam" -> (() =>
          Curation.decontaminate(docs, bench, "id", col("text")).count()),
        // the bloom path must match decontam's exponent on the same
        // fixture (both are one narrow corpus pass when the bench set
        // broadcasts; the bloom's advantage only appears when it does
        // NOT, which this fixed-benchmark fixture deliberately avoids)
        "decontam_bloom" -> (() =>
          Curation.decontaminateBloom(docs, bench, "id", col("text"))
            .count()),
        // the fractional rule adds the per-doc distinct-gram shuffle
        // (fixed-width md5 keys) — the cost the exponent must clear
        "decontam_overlap" -> (() =>
          Curation.decontaminateOverlap(docs, bench, "id", col("text"),
            maxOverlapFrac = 0.2).count()),
        // every-100th-doc near-dups share long word runs -> true
        // duplicated 8-gram passages proportional to n
        "dup_passages" -> (() =>
          Dedup.duplicatePassages(docs, "id", col("text")).count()),
        // hex words are ~unique per doc, so the bigram vocabulary grows
        // LINEARLY with the corpus — the worst case for the model-side
        // join (real corpora grow vocabulary sublinearly)
        "lm_score" -> (() =>
          TextAnalysis.ngramLmScore(docs, "id", col("text")).count()),
        // near-dup docs share 49 of 50 words -> duplicate 10-token
        // chunks proportional to n; three keyed shuffles, expect ~1.0.
        // NOT .count(): the final per-doc frame is `totals LEFT JOIN
        // reassembled` on a unique key, and under count() Catalyst
        // ELIMINATES the join (and with it the entire dedup) — the
        // sum over a right-side column forces the real work
        "paragraph_dedup" -> (() => {
          val r = Dedup.paragraphDedup(docs, "id", col("text"), 10)
            .agg(count(lit(1)), sum(col("kept_chunks"))).head()
          r.getLong(0)
        }),
        // near-dup docs share 49-word runs -> duplicated >=12-token
        // spans proportional to n; hash prefilter keeps the exact
        // string stage duplicate-mass-sized, expect ~1.0 (same forced
        // aggregate — see paragraph_dedup)
        "substring_dedup" -> (() => {
          val r = Dedup.substringDedup(docs, "id", col("text"), 12)
            .agg(count(lit(1)), sum(col("removed_tokens"))).head()
          r.getLong(0)
        }),
        // same near-dup structure as paragraph_dedup but with
        // content-defined boundaries; same forced aggregate
        "cdc_dedup" -> (() => {
          val r = Dedup.cdcChunkDedup(docs, "id", col("text"), 10)
            .agg(count(lit(1)), sum(col("kept_chunks"))).head()
          r.getLong(0)
        }),
        // 50-token docs -> slice rows grow linearly; the probe watches
        // the block-decomposed prefix sum (window only inside 1024-doc
        // blocks + a blocks-sized prefix frame) hold up as blocks grow
        "pack_slices" -> (() =>
          Curation.packSlices(docs, "id",
            TextAnalysis.tokenCount(col("text")), seqLen = 512).count()),
        // one keyed shuffle + a codegen'd per-block fold; bins-per-
        // block bounded, expect ~1.0 from the linearly-growing output
        "pack_bins" -> (() =>
          Curation.packBinsNextFit(docs, "id",
            TextAnalysis.tokenCount(col("text")), seqLen = 512).count()),
        // every doc is length 50 -> ONE histogram row and ONE hot
        // rank-within-length key: the adversarial regime for the
        // decomposed rank (per-(length, block) counters, never the
        // documents themselves, cross the hot key's partition)
        "pack_bfd" -> (() =>
          Curation.packBinsHistogram(docs, "id",
            TextAnalysis.tokenCount(col("text")), seqLen = 512).count()),
        // two corpus scans + an O(k) broadcast + <= k-key agg: the
        // hex-word vocabulary (up to 16.7M distinct) dwarfs k=2000 so
        // MG decrements constantly — the adversarial regime for the
        // sketch's O(k) sweep. One
        // planted token at ~2x the phi threshold keeps the result
        // non-vacuous (exactly 1 heavy hitter at every scale).
        "heavy_hitters" -> (() => {
          val toks = docs
            .select(posexplode(split(col("text"), " ")).as(Seq("p", "w")))
            .select(col("w"))
            .unionByName(spark.range(n * 50 / 400)
              .select(lit("HOT").as("w")))
          val rows = graft.llm.HeavyHitters.heavyHitters(
            toks, col("w"), k = 2000, phi = 0.0005).count()
          require(rows == 1L, s"heavy_hitters: expected 1 row, got $rows")
          rows
        }))
      ops.filter(kv => wanted(kv._1))
        .map { case (name, body) => name -> timed(body()) }.toMap
    }

    // Warm-up protocol: one DISCARDED full run at the lo scale, then
    // wait for the JIT compile queue to drain before measuring. C2
    // compiles the big generated methods asynchronously over ~minutes
    // of wall time; execution stays interpreted (up to 8x slower)
    // until each compile lands, so without the quiesce wait the slow
    // window lands randomly inside the lo or hi measurement (r16
    // observed the same binary report exponents -0.54, 0.50 and 1.27).
    // A 1/10-scale warm-up proved insufficient — tiny tasks don't push
    // the monsters over the compile thresholds.
    runAll(nLo)
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    var quiesceWaited = 0
    var lastCt = -1L
    while (quiesceWaited < 180 && comp.getTotalCompilationTime != lastCt) {
      lastCt = comp.getTotalCompilationTime
      Thread.sleep(5000); quiesceWaited += 5
    }
    System.err.println(s"JIT quiesced after ${quiesceWaited}s " +
      s"(total compile ${lastCt / 1000}s)")

    val lo = runAll(nLo)
    val hi = runAll(nHi)
    val parts = Seq("minhash", "simhash", "decontam", "decontam_bloom",
        "decontam_overlap", "pack_slices", "pack_bins", "pack_bfd",
        "dup_passages",
        "lm_score", "paragraph_dedup", "substring_dedup", "cdc_dedup",
        "heavy_hitters").filter(wanted).map { op =>
      val (tLo, rLo) = lo(op); val (tHi, rHi) = hi(op)
      val exp = math.log(tHi / tLo) / math.log(factor)
      f""""${op}_sec_lo":$tLo%.2f,"${op}_sec_hi":$tHi%.2f,""" +
        s""""${op}_rows_lo":$rLo,"${op}_rows_hi":$rHi,""" +
        f""""${op}_exponent":$exp%.3f"""
    }

    // int8 quantization headroom is an exponent over DIM, not corpus
    // size: a scale fold re-evaluated inside the codes lambda is
    // O(dim²) per row — invisible in an n-sweep (still linear in n),
    // measured directly by timing dim 64 vs dim 1024 on a fixed corpus.
    // withInt8's materialized-scale plan must hold exponent ~1.
    val quantParts = if (wanted("quantize")) {
      def quantizeTime(n: Long, dim: Int): Double = {
        val vecs = spark.range(n).select(
          transform(sequence(lit(0), lit(dim - 1)),
            i => pmod(hash(col("id"), i), lit(1000)).cast("double") / 500.0 - 1.0)
            .as("embedding"))
        val (t, _) = time {
          graft.llm.Similarity.withInt8(vecs, col("embedding"), "__s", "__c")
            .select(aggregate(col("__c"), lit(0L), (a, x) => a + x).as("cs"))
            .agg(sum(col("cs"))).collect()
          n
        }
        t
      }
      val nQ = math.max(nLo / 4, 50000L)
      quantizeTime(nQ / 10, 64) // warm codegen at small scale
      val tLoQ = quantizeTime(nQ, 64)
      val tHiQ = quantizeTime(nQ, 1024)
      val dimExp = math.log(tHiQ / tLoQ) / math.log(1024.0 / 64.0)
      Seq(f""""quantize_rows":$nQ,"quantize_sec_dim64":$tLoQ%.2f,""" +
        f""""quantize_sec_dim1024":$tHiQ%.2f,"quantize_dim_exponent":$dimExp%.3f""")
    } else Nil

    // PCA fit cost = the single moment aggregation (count + vector_sum
    // of outer_upper) — must be linear in corpus size at fixed dim,
    // like count(*). Dim 64 keeps the O(d²)=2080-double per-row moment
    // honest; the op's documented cap is full-covariance PCA to a few
    // hundred dims (d=1024 would be a 525k-double row — use a sketch
    // or sample beyond that).
    val pcaParts = if (wanted("pca")) {
      def pcaTime(n: Long): Double = {
        val vecs = spark.range(n).select(col("id"),
          transform(sequence(lit(0), lit(63)),
            i => (pmod(hash(col("id"), i), lit(1000)).cast("double") / 500.0 - 1.0)
              .cast("float"))
            .as("embedding"))
        val (t, _) = time { graft.llm.Pca.fit(vecs, col("embedding"), 8).n }
        t
      }
      val nP = math.max(nLo, 100000L)
      pcaTime(nP / 10) // warm
      val tLoP = pcaTime(nP)
      val tHiP = pcaTime((nP * factor).toLong)
      val pcaExp = math.log(tHiP / tLoP) / math.log(factor.toDouble)
      Seq(f""""pca_vecs_lo":$nP,"pca_sec_lo":$tLoP%.2f,""" +
        f""""pca_sec_hi":$tHiP%.2f,"pca_exponent":$pcaExp%.3f""")
    } else Nil

    // BPE at REAL merge counts: the r13 watch item was the full pair
    // recount per round; the incremental delta-maintenance must hold
    // >=256 merges on a forced-distributed vocabulary without the
    // per-round cost tracking vocabulary size. Gate: completes all 256
    // merges; wall time reported for the round-over-round economics.
    def bpeWordTable(nWords: Long): DataFrame =
      spark.range(nWords).select(
        md5(col("id").cast("string"))
          .substr(lit(1), (pmod(hash(col("id")), lit(6)) + 4).cast("int"))
          .as("word"),
        (pmod(hash(col("id"), lit(7)), lit(50)) + 1).cast("long").as("cnt"))
        .groupBy("word").agg(sum("cnt").as("cnt"))
        .localCheckpoint(true)
    val bpeParts = if (wanted("bpe")) {
      def bpeRun(nWords: Long, merges: Int,
          symThreshold: Long): (Double, Int, Long) = {
        val wc = bpeWordTable(nWords)
        val nw = wc.count()
        val t0 = System.nanoTime()
        val ms = graft.llm.Bpe.trainBpe(wc, merges, localThreshold = 0,
          localSymThreshold = symThreshold)
        ((System.nanoTime() - t0) / 1e9, ms.length, nw)
      }
      bpeRun(5000L, 8, 0L) // warm
      // forced-distributed 256 merges: tracks the incremental
      // delta-maintenance economics round over round
      val (bpeSec, bpeMerges, bpeWords) = bpeRun(150000L, 256, 0L)
      // PRODUCTION-VOCAB economics (VERDICT r17 item 6): 1024 merges
      // with the active-set hand-off enabled — the symbol-sum probe
      // fires and the indexed local loop finishes the tail with zero
      // further shuffle rounds
      val (bpe1kSec, bpe1kMerges, _) = bpeRun(150000L, 1024,
        32000000L)
      Seq(s""""bpe_words":$bpeWords,"bpe_merges":$bpeMerges,""" +
        f""""bpe_sec":$bpeSec%.2f,""" +
        s""""bpe1024_merges":$bpe1kMerges,""" +
        f""""bpe1024_sec":$bpe1kSec%.2f""")
    } else Nil

    // PRODUCTION tokenizer vocabulary (VERDICT r18 item 3): a real
    // tokenizer is 32k-50k merges, and nothing witnessed that
    // configuration — only 1024. The active-set hand-off fires at
    // round 0 here (~1M live symbols << the 32M threshold), so this
    // measures trainBpeLocalIndexed running the whole 32k ladder:
    // the claim under test is minutes, not the hours a per-merge
    // shuffle round would cost. Then the APPLY path is checked
    // against the resulting vocabulary: a 2,000-word sample is
    // tokenized with the exact applyWith rewrite (the mergeLocal
    // ladder in merge order), asserting every word round-trips by
    // concatenation and every emitted token is in the trained
    // vocabulary (initial alphabet + merge outputs).
    val bpe32kParts = if (wanted("bpe32k")) {
      val wc = bpeWordTable(150000L)
      val nw = wc.count()
      val t0 = System.nanoTime()
      val ms = graft.llm.Bpe.trainBpe(wc, 32000, localThreshold = 0,
        localSymThreshold = 32000000L)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val msArr = ms.toArray
      val vocab = new java.util.HashSet[String]()
      "0123456789abcdef".foreach(c => vocab.add(c.toString))
      msArr.foreach { case (l, r) => vocab.add(l + r) }
      // hash-spread sample, not top-frequency: the frequent head all
      // collapses to single symbols (avg tokens 1.000 measured), which
      // would leave the vocab-membership assertion vacuous — partially
      // merged tail words emit INTERMEDIATE tokens that genuinely test
      // vocabulary closure
      val sample = wc.orderBy(md5(col("word")), col("word")).limit(2000)
        .select("word").collect().map(_.getString(0))
      val t1 = System.nanoTime()
      var tokTotal = 0L
      sample.foreach { w =>
        var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
        msArr.foreach { m =>
          if (syms.length > 1) syms = graft.llm.Bpe.mergeLocal(syms, m)
        }
        require(syms.mkString == w, s"apply round-trip broke on $w")
        syms.foreach(s => require(vocab.contains(s),
          s"token $s of $w not in trained vocabulary"))
        tokTotal += syms.length
      }
      val applySec = (System.nanoTime() - t1) / 1e9
      val avgTok = tokTotal.toDouble / sample.length
      Seq(s""""bpe32k_words":$nw,"bpe32k_merges":${ms.length},""" +
        f""""bpe32k_train_sec":$trainSec%.2f,""" +
        f""""bpe32k_apply2000_sec":$applySec%.2f,""" +
        f""""bpe32k_avg_tokens_per_word":$avgTok%.3f""")
    } else Nil

    println(s"""{"metric":"llm_scale_smoke","docs_lo":$nLo,"docs_hi":$nHi,""" +
      (parts ++ quantParts ++ pcaParts ++ bpeParts ++ bpe32kParts)
        .mkString(",") + "," + HostRegime.json(hostBefore) + "}")
    spark.stop()
  }
}
