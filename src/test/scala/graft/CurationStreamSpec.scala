package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Curation, TextAnalysis}
import graft.sources.Warc

/** End-to-end streaming curation witness: WARC micro-batch ingest ->
  * gopher quality filter + language ID + URL dedup -> idempotent
  * per-batch parquet append, exactly-once across a simulated crash
  * (lost commit marker -> batch replay) and a restart. Composes the
  * three pieces that were individually spec-gated (WarcSourceSpec,
  * LlmSpec curation, EventStreamSpec) into the production pipeline
  * shape: stateless filters on the stream, batch-relational curation
  * inside foreachBatch, cross-batch URL dedup against prior batches'
  * landed output, and batchId-keyed OVERWRITE so replays are no-ops. */
class CurationStreamSpec extends SparkTestBase {

  // a passing doc: >=50 tokens, avg token length in [3,10], stopword
  // hits, <=60% duplicate tokens (3 of 7 tokens per line are unique)
  private def goodText(seed: Int): String =
    (0 until 8).map(i => s"the quick item${seed}x$i spans value$i node$i here")
      .mkString(" ") // 56 tokens, 28 distinct
  private val badText = "too short"

  private def rec(uri: String, text: String) =
    ("conversion", uri, "2024-03-01T12:00:00Z", "text/plain",
      text.getBytes("UTF-8"))

  private def land(dir: java.io.File, name: String,
      rs: Seq[(String, String, String, String, Array[Byte])]): Unit =
    Files.write(new java.io.File(dir, name).toPath,
      Warc.writeRecords(rs, gzipPerRecord = true))

  /** The curation pipeline on one micro-batch (batch semantics inside
    * foreachBatch): decode -> language gate -> gopher gate -> in-batch
    * URL dedup -> cross-batch URL dedup vs previously landed batches ->
    * idempotent overwrite of this batch's partition. */
  private def curateBatch(batch: DataFrame, batchId: Long,
      outDir: String): Unit = {
    val docs = batch
      .filter(col("record_type") === "conversion")
      .select(col("target_uri"), col("warc_date"),
        col("payload").cast("string").as("text"))
      .withColumn("lang", TextAnalysis.languageId(col("text")))
      .filter(col("lang") === "en")
      .withColumn("__rid", monotonically_increasing_id())
    val pass = Curation.gopherFilter(docs, "__rid", col("text"))
      .filter(col("pass")).select("__rid")
    val kept = docs.join(pass, "__rid")
    val inBatch = Curation.dedupByUrl(kept, col("target_uri"),
      Seq(col("warc_date"), col("__rid"))).drop("__rid")
    val priorDirs = Option(new java.io.File(outDir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .filter(_.getName.stripPrefix("batch=").toLong < batchId)
      .map(_.getPath)
    val fresh =
      if (priorDirs.isEmpty) inBatch
      else {
        val seen = batch.sparkSession.read.parquet(priorDirs: _*)
          .select(Curation.normalizeUrl(col("target_uri")).as("__u"))
        inBatch.join(seen,
          Curation.normalizeUrl(col("target_uri")) === col("__u"),
          "left_anti")
      }
    // batchId-keyed OVERWRITE: a replayed batch rewrites the same
    // partition instead of appending duplicates — exactly-once output
    // from at-least-once execution
    fresh.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  test("streaming curation e2e: exactly-once counts across crash replay and restart") {
    val in = Files.createTempDirectory("curin").toFile
    val out = Files.createTempDirectory("curout").toFile.getPath
    val chk = Files.createTempDirectory("curchk").toFile.getPath

    def start() = Warc.readStream(spark, in.getPath)
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch((df: DataFrame, id: Long) => curateBatch(df, id, out))
      .start()

    def landedUris(): Seq[String] = {
      val dirs = Option(new java.io.File(out).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getPath)
      if (dirs.isEmpty) Seq.empty
      else spark.read.parquet(dirs: _*).select("target_uri")
        .collect().map(_.getString(0)).toSeq
    }

    // batch 0: two good docs, one gopher-fail, one URL dup inside the file
    land(in, "part-00000.wet.gz", Seq(
      rec("https://a.org/1", goodText(1)),
      rec("https://a.org/2", goodText(2)),
      rec("https://a.org/short", badText),
      rec("https://a.org/1", goodText(1))))
    val q1 = start()
    q1.processAllAvailable()
    assert(landedUris().sorted === Seq("https://a.org/1", "https://a.org/2"))

    // batch 1: one new doc + a cross-batch duplicate of a.org/1
    land(in, "part-00001.wet.gz", Seq(
      rec("https://b.org/3", goodText(3)),
      rec("https://a.org/1", goodText(1))))
    q1.processAllAvailable()
    q1.stop()
    assert(landedUris().sorted ===
      Seq("https://a.org/1", "https://a.org/2", "https://b.org/3"))

    // CRASH SIMULATION: the engine committed batch 1's offsets but we
    // delete its commit marker — on restart Spark MUST replay batch 1
    // (at-least-once); the batchId-keyed overwrite keeps output exact
    val commit1 = new java.io.File(s"$chk/commits/1")
    assert(commit1.exists(), "commit marker for batch 1 expected")
    assert(commit1.delete())
    // also drop the local-fs checksum shadow, or ChecksumFs refuses to
    // re-commit the replayed batch
    new java.io.File(s"$chk/commits/.1.crc").delete()

    // plus a new file that becomes batch 2 after the restart
    land(in, "part-00002.wet.gz", Seq(
      rec("https://c.org/4", goodText(4)),
      rec("https://b.org/3", goodText(3))))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val uris = landedUris()
    assert(uris.length === uris.distinct.length,
      s"replay duplicated rows: $uris")
    assert(uris.sorted === Seq("https://a.org/1", "https://a.org/2",
      "https://b.org/3", "https://c.org/4"))
  }

  test("streaming INDEX maintenance: appendBatch stays exactly-once " +
      "across the same crash replay and restart (VERDICT r19 item 4)") {
    import graft.llm.{IndexStore, Similarity}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.initCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.pqCodebooksFixed(
      Similarity.residualCorpus(emb, "vec_id", "embedding", cents)
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    val idxDir = Files.createTempDirectory("idx-cr").toString
    // base index: the codebook-training slice, indexed before any crawl
    IndexStore.save(IndexStore.build("ivfpq_residual",
      emb.filter(col("vec_id").between(8, 23)), "vec_id", "embedding",
      cents, cb), idxDir)
    val baseIdx = IndexStore.load(spark, idxDir)

    val in = Files.createTempDirectory("idxin").toFile
    val chk = Files.createTempDirectory("idxchk").toFile.getPath
    // crawl docs carry their vec_id in the fragment; the batch handler
    // fetches embeddings for the batch's ids and appends them as the
    // batch's idempotent delta
    def indexBatch(batch: DataFrame, batchId: Long): Unit = {
      val ids = batch.filter(col("record_type") === "conversion")
        .select(regexp_extract(col("target_uri"), "#v(\\d+)$", 1)
          .cast("long").as("doc_id")).distinct()
      val vecs = ids.join(emb, col("doc_id") === col("vec_id"))
        .select(col("vec_id"), col("embedding"))
      IndexStore.appendBatch(baseIdx, idxDir, vecs, "embedding", batchId)
    }
    def start() = Warc.readStream(spark, in.getPath)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch((df: DataFrame, id: Long) => indexBatch(df, id))
      .start()

    land(in, "part-00000.wet.gz",
      (0 to 3).map(i => rec(s"https://v.org/$i#v$i", goodText(i))))
    val q1 = start(); q1.processAllAvailable()
    land(in, "part-00001.wet.gz",
      (4 to 7).map(i => rec(s"https://v.org/$i#v$i", goodText(i))))
    q1.processAllAvailable(); q1.stop()

    // crash: lose batch 1's commit marker -> restart MUST replay it;
    // the batchId-keyed codes_inc overwrite keeps the index exact
    val commit1 = new java.io.File(s"$chk/commits/1")
    assert(commit1.exists() && commit1.delete())
    new java.io.File(s"$chk/commits/.1.crc").delete()
    land(in, "part-00002.wet.gz",
      (24 to 27).map(i => rec(s"https://v.org/$i#v$i", goodText(i))))
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def rows(df: DataFrame) = df
      .select(col("query_id"), col("vec_id"), col("adc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val streamed = rows(IndexStore.load(spark, idxDir)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3))
    val indexedIds = (0 to 7) ++ (8 to 23) ++ (24 to 27)
    val oneShot = rows(IndexStore.build("ivfpq_residual",
        emb.filter(col("vec_id").isin(indexedIds.map(_.toLong): _*)),
        "vec_id", "embedding", cents, cb)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3))
    assert(streamed == oneShot,
      "crash-replayed streaming appends diverged from a one-shot build")
    assert(streamed.nonEmpty)
    // and the index carries no duplicate ids anywhere
    val codes = spark.read.parquet(s"$idxDir/codes")
      .select("vec_id")
      .unionByName(spark.read.parquet(s"$idxDir/codes_inc")
        .select("vec_id"))
    assert(codes.count() == codes.distinct().count(),
      "replay duplicated code rows")
  }
}
