package graft

import org.apache.spark.sql.functions._

import graft.llm.Curation

/** GPT-style sequence packing: the block-decomposed running sum must
  * equal the textbook global window for any block size, and the
  * per-slice manifest must tile documents and sequences exactly —
  * the invariants a training-sample writer relies on. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  // token counts chosen so docs start/end exactly ON boundaries (5+3),
  // straddle one boundary (9 across 8|16), straddle TWO boundaries
  // (21 across 24|32|40), and a zero-token doc sits mid-stream
  private val docs = Seq(
    (10L, 5L), (11L, 3L), (12L, 9L), (13L, 0L), (14L, 4L), (15L, 21L))
    .toDF("doc_id", "n")

  private def slices(blockSize: Long) =
    Curation.packSlices(docs, "doc_id", col("n"), seqLen = 8,
        blockSize = blockSize)
      .orderBy("seq_id", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("closed-form manifest: boundary-exact, straddling, zero-token") {
    // offsets: 10->[0,5) 11->[5,8) 12->[8,17) 13->[17,17) 14->[17,21)
    //          15->[21,42); seqLen 8
    val expected = Seq(
      (0L, 10L, 0L, 0L, 5L),
      (0L, 11L, 0L, 5L, 3L),
      (1L, 12L, 0L, 0L, 8L),
      (2L, 12L, 8L, 0L, 1L),
      (2L, 14L, 0L, 1L, 4L),
      (2L, 15L, 0L, 5L, 3L),
      (3L, 15L, 3L, 0L, 8L),
      (4L, 15L, 11L, 0L, 8L),
      (5L, 15L, 19L, 0L, 2L))
    assert(slices(64L) == expected)
  }

  test("zero-token documents emit no slices and shift nothing") {
    assert(!slices(64L).exists(_._2 == 13L))
  }

  test("block decomposition is invisible: any blockSize, same rows") {
    val reference = slices(1024L)
    for (b <- Seq(1L, 2L, 3L, 64L))
      assert(slices(b) == reference, s"blockSize=$b diverged")
  }

  test("tiling invariants: docs and sequences sum exactly") {
    val rows = slices(64L)
    // per document: lens sum to n, doc_offs contiguous from 0
    for ((id, n) <- Seq(10L -> 5L, 11L -> 3L, 12L -> 9L, 14L -> 4L,
        15L -> 21L)) {
      val d = rows.filter(_._2 == id).sortBy(_._3)
      assert(d.map(_._5).sum == n, s"doc $id len sum")
      assert(d.map(_._3) ==
        d.map(_._5).scanLeft(0L)(_ + _).init, s"doc $id offsets")
    }
    // per sequence: lens sum to seqLen (last partial excepted),
    // seq_offs contiguous from 0 — padding-free
    val bySeq = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val last = bySeq.map(_._1).max
    for ((sid, ss) <- bySeq) {
      val sorted = ss.sortBy(_._4)
      if (sid != last) assert(sorted.map(_._5).sum == 8L, s"seq $sid fill")
      assert(sorted.map(_._4) ==
        sorted.map(_._5).scanLeft(0L)(_ + _).init, s"seq $sid offsets")
    }
  }

  test("next-fit: closed-form walk, oversize isolation, block reset") {
    // block 0 (ids 0-3): 5 fits, +3 fits (8), 505 doesn't (513) and
    // opens bin 1, 600 doesn't fit behind it and sits oversize-alone
    // in bin 2; block 1 (ids 64-65): fresh walk, 7 then 2 share bin 64
    val d = Seq((0L, 5L), (1L, 3L), (2L, 505L), (3L, 600L),
        (64L, 7L), (65L, 2L))
      .toDF("doc_id", "n")
    val got = Curation.packBinsNextFit(d, "doc_id", col("n"), seqLen = 512,
        blockSize = 64L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 5L), (1L, 0L, 3L), (2L, 1L, 505L),
      (3L, 2L, 600L), (64L, 64L, 7L), (65L, 64L, 2L)))
  }

  test("next-fit invariants on random lengths: capacity, coverage") {
    val rows = (0L until 200L).map(i => (i, (i * 2654435761L) % 700))
    val d = rows.toDF("doc_id", "n")
    val got = Curation.packBinsNextFit(d, "doc_id", col("n"), seqLen = 512,
        blockSize = 32L).as[(Long, Long, Long)].collect().toSeq
    // every document exactly once, length preserved
    assert(got.map(r => r._1 -> r._3).sorted == rows.sorted)
    // no bin over capacity unless it is a lone oversize document
    for ((bin, bs) <- got.groupBy(_._2))
      assert(bs.map(_._3).sum <= 512L || (bs.size == 1 && bs.head._3 > 512L),
        s"bin $bin overfilled: $bs")
    // bins never cross blocks: bin_id = block*blockSize + local
    for (r <- got) assert(r._2 / 32L == r._1 / 32L, s"bin crossed block: $r")
  }

  test("next-fit is partitioning-invariant") {
    val rows = (0L until 150L).map(i => (i, (i * 48271L) % 600))
    val base = rows.toDF("doc_id", "n")
    val a = Curation.packBinsNextFit(base.repartition(7), "doc_id",
      col("n"), 512, 32L).orderBy("doc_id").collect().toSeq
    val b = Curation.packBinsNextFit(base.coalesce(1), "doc_id",
      col("n"), 512, 32L).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bfdHistogram: closed-form groups, oversize self-isolating") {
    val groups = Curation.bfdHistogram(
      Seq(600L -> 1L, 512L -> 1L, 256L -> 2L, 200L -> 1L), 512L)
    assert(groups == Seq(
      (1L, -88L, Map(600L -> 1L)),
      (1L, 0L, Map(512L -> 1L)),
      (1L, 256L, Map(256L -> 1L)),
      (1L, 56L, Map(256L -> 1L, 200L -> 1L))))
  }

  test("histogram packing: closed-form assignment via strategy table") {
    val d = Seq((0L, 512L), (1L, 256L), (2L, 256L), (3L, 200L),
        (4L, 600L), (5L, 0L))
      .toDF("doc_id", "n")
    val got = Curation.packBinsHistogram(d, "doc_id", col("n"), 512, 64L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // groups in creation order: [600] [512] [256] [256,200] ->
    // bins 0..3; the zero-token doc packs nothing
    assert(got == Seq((0L, 1L, 512L), (1L, 2L, 256L), (2L, 3L, 256L),
      (3L, 3L, 200L), (4L, 0L, 600L)))
  }

  test("histogram packing invariants and next-fit dominance") {
    val rows = (0L until 300L).map(i => (i, (i * 2654435761L) % 700))
    val d = rows.toDF("doc_id", "n")
    val got = Curation.packBinsHistogram(d, "doc_id", col("n"), 512, 32L)
      .as[(Long, Long, Long)].collect().toSeq
    val pos = rows.filter(_._2 >= 1)
    // coverage: every positive-length doc exactly once, length kept
    assert(got.map(r => r._1 -> r._3).sorted == pos.sorted)
    // capacity + oversize isolation
    for ((bin, bs) <- got.groupBy(_._2))
      assert(bs.map(_._3).sum <= 512L || (bs.size == 1 && bs.head._3 > 512L),
        s"bin $bin overfilled: $bs")
    // global-histogram solve beats blockwise next-fit on bins used
    val nfBins = Curation.packBinsNextFit(d.filter(col("n") >= 1),
        "doc_id", col("n"), 512, 32L)
      .select("bin_id").distinct().count()
    assert(got.map(_._2).distinct.size <= nfBins)
    // deterministic under partitioning
    val again = Curation.packBinsHistogram(d.repartition(11), "doc_id",
        col("n"), 512, 32L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.sorted == again.sorted)
  }

  test("histogram packing plan: broadcast strategy join, no global window") {
    val d = (0L until 200L).map(i => (i, 40L + i % 30))
      .toDF("doc_id", "n")
    val plan = Curation.packBinsHistogram(d, "doc_id", col("n"), 512, 32L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"strategy table should broadcast:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"both windows partition by key — nothing may go global:\n$plan")
  }

  test("no single-partition exchange over the corpus side") {
    // the only allowed SinglePartition stage is the block-prefix frame
    // (corpus/blockSize rows); the corpus path must stay partitioned —
    // count the single-partition exchanges and require exactly the one
    val plan = Curation.packSlices(docs, "doc_id", col("n"), 8, 2L)
      .queryExecution.executedPlan.toString
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single <= 1, s"expected <=1 SinglePartition exchange:\n$plan")
    assert(plan.contains("hashpartitioning"),
      s"corpus window should run under a hash partitioning:\n$plan")
  }
}
