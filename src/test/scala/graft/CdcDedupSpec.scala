package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Content-defined chunking dedup: the insertion-robustness property
  * that motivates CDC over fixed-stride chunking, plus reassembly
  * invariants. */
class CdcDedupSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic 240-word document; words hash-uniform so boundaries
  // appear at the expected ~1/8 rate
  private val words = (0 until 240).map(i => f"w${(i * 2654435761L) % 9973}%04d")
  private val original = words.mkString(" ")
  private val shifted = ("INSERTED " + original)

  test("one inserted word: CDC re-syncs, fixed-stride chunking does not") {
    val docs = Seq((1L, original), (2L, shifted)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(docs, "doc_id", col("text"), avgTokens = 8)
      .orderBy("doc_id").collect()
    val fixed = Dedup.paragraphDedup(docs, "doc_id", col("text"), chunkTokens = 8)
      .orderBy("doc_id").collect()
    // doc 1 is first-occurrence everywhere: fully kept under both
    assert(cdc(0).getAs[Long]("dropped_chunks") == 0)
    assert(cdc(0).getAs[String]("clean_text") == original)
    assert(fixed(0).getAs[Long]("dropped_chunks") == 0)
    // doc 2 under CDC: only the chunks up to the first boundary after
    // the insertion differ; everything later re-synchronizes and dedups
    val cdcTotal = cdc(1).getAs[Long]("kept_chunks") +
      cdc(1).getAs[Long]("dropped_chunks")
    assert(cdc(1).getAs[Long]("dropped_chunks") >= (cdcTotal * 0.8).toLong,
      s"CDC should dedupe most of the shifted doc, " +
        s"dropped ${cdc(1).getAs[Long]("dropped_chunks")} of $cdcTotal")
    // doc 2 under fixed stride: every frame shifted by one token, so
    // (statistically) nothing matches doc 1's chunks
    assert(fixed(1).getAs[Long]("dropped_chunks") <= 1,
      "fixed-stride chunking should NOT dedupe a one-token-shifted doc")
  }

  test("chunk boundaries partition the token stream exactly") {
    val docs = Seq((7L, original)).toDF("doc_id", "text")
    val out = Dedup.cdcChunkDedup(docs, "doc_id", col("text"), avgTokens = 8)
      .collect().head
    // a unique doc reassembles to itself and keeps every chunk
    assert(out.getAs[String]("clean_text") == original)
    assert(out.getAs[Long]("dropped_chunks") == 0)
    // expected chunk count ~ 240/8 = 30; sanity band that fails if the
    // boundary rule degenerates to all-boundaries or none
    val kept = out.getAs[Long]("kept_chunks")
    assert(kept >= 10 && kept <= 80, s"implausible chunk count $kept")
  }

  test("exact duplicate document dedupes to empty under CDC") {
    val docs = Seq((1L, original), (9L, original)).toDF("doc_id", "text")
    val out = Dedup.cdcChunkDedup(docs, "doc_id", col("text"), avgTokens = 8)
      .orderBy("doc_id").collect()
    assert(out(1).getAs[String]("clean_text") == "")
    assert(out(1).getAs[Long]("kept_chunks") == 0)
  }
}
