package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{IndexStore, Pca, Similarity}

/** Save/load lifecycle of trained ANN indexes (VERDICT r18 item 4):
  * the contract is that a RELOADED index — reconstructed from parquet
  * alone, with no access to the raw corpus, the training sample, or any
  * in-session state — serves bit-identical results to the in-memory
  * build it was saved from, for every kind in the residual IVF-PQ
  * family, INCLUDING Lloyd-trained (float-sum, non-rederivable)
  * quantizers, which is exactly the state a production deployment
  * cannot afford to lose or retrain. */
class IndexStoreSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("adc"))
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"idxstore-$tag").toString

  test("ivfpq_residual round-trip: loaded search == in-memory search, " +
      "with Lloyd-TRAINED quantizers") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val cb = Similarity.pqCodebooksLloyd(
      Similarity.residualCorpus(emb, "vec_id", "embedding", cents),
      "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val mem = Similarity.ivfPqResidualTopK(emb, queries, "vec_id",
      "embedding", "query_id", k = 10, cents, nprobe = 3, cb)
    val dir = tmp("resid")
    IndexStore.save(
      IndexStore.build("ivfpq_residual", emb, "vec_id", "embedding",
        cents, cb), dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.kind == "ivfpq_residual")
    assert(loaded.cents == cents)         // doubles round-trip exactly
    assert(loaded.codebooks == cb)
    val got = loaded.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)
    assert(rows(got) == rows(mem))        // bit-identical ADC
    assert(rows(got).nonEmpty)
  }

  test("opq pre-transform round-trip: rotation persists, results match") {
    val rot = Similarity.opqEigenAllocation(emb, "embedding", m = 8)
    val rc = emb.select(col("vec_id"),
      Pca.project(col("embedding"), rot).as("embedding"))
    val cents = Similarity.initCentroids(rc, "vec_id", "embedding", 8)
    val cb = Similarity.pqCodebooksFixed(
      Similarity.residualCorpus(rc, "vec_id", "embedding", cents)
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    val mem = Similarity.opqIvfPqResidualTopK(emb, queries, "vec_id",
      "embedding", "query_id", k = 10, rot, cents, nprobe = 3, cb)
    val dir = tmp("opq")
    IndexStore.save(
      IndexStore.build("opq", emb, "vec_id", "embedding", cents, cb,
        Some(rot)), dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.rot.isDefined)
    val lr = loaded.rot.get
    assert(lr.n == rot.n && lr.totalVar == rot.totalVar)
    assert(lr.mean.toSeq == rot.mean.toSeq)
    assert(lr.components.map(_.toSeq).toSeq ==
      rot.components.map(_.toSeq).toSeq)
    assert(lr.eigenvalues.toSeq == rot.eigenvalues.toSeq)
    val got = loaded.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)
    assert(rows(got) == rows(mem))
    assert(rows(got).nonEmpty)
  }

  test("lopq global-R round-trip: residual rotation persists, results match") {
    val cents = Similarity.initCentroids(emb, "vec_id", "embedding", 8)
    val rot = Similarity.permutationRotation(
      (0 until 64).map(i => (i * 5) % 64))
    val resid = Similarity.residualCorpus(emb, "vec_id", "embedding", cents)
    val cb = Similarity.pqCodebooksFixed(
      resid.select(col("vec_id"),
          Pca.project(col("embedding"), rot).as("embedding"))
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    val mem = Similarity.ivfOpqResidualTopK(emb, queries, "vec_id",
      "embedding", "query_id", k = 10, cents, nprobe = 3, rot, cb)
    val dir = tmp("lopq")
    IndexStore.save(
      IndexStore.build("lopq", emb, "vec_id", "embedding", cents, cb,
        Some(rot)), dir)
    val got = IndexStore.load(spark, dir)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3)
    assert(rows(got) == rows(mem))
    assert(rows(got).nonEmpty)
  }

  test("incremental append: frozen-quantizer encode of new vectors, " +
      "search == one-shot build over the union") {
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val cents = Similarity.initCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.pqCodebooksFixed(
      Similarity.residualCorpus(emb, "vec_id", "embedding", cents)
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    val dir = tmp("append")
    IndexStore.save(
      IndexStore.build("ivfpq_residual", half1, "vec_id", "embedding",
        cents, cb), dir)
    val grown = IndexStore.append(IndexStore.load(spark, dir), dir,
      half2, "embedding")
    val got = grown.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)
    // one-shot build over the union with the SAME frozen quantizers
    val oneShot = IndexStore
      .build("ivfpq_residual", emb, "vec_id", "embedding", cents, cb)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3)
    assert(rows(got) == rows(oneShot))
    assert(rows(got).nonEmpty)
    // a cold reload also sees the appended codes
    val reloaded = IndexStore.load(spark, dir)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3)
    assert(rows(reloaded) == rows(oneShot))
  }

  private def fixedIndex(corpus: DataFrame, dir: String) = {
    val cents = Similarity.initCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.pqCodebooksFixed(
      Similarity.residualCorpus(emb, "vec_id", "embedding", cents)
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    IndexStore.save(
      IndexStore.build("ivfpq_residual", corpus, "vec_id", "embedding",
        cents, cb), dir)
    (cents, cb)
  }

  test("append refuses a dir that was never save()d") {
    val cents = Similarity.initCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.pqCodebooksFixed(
      Similarity.residualCorpus(emb, "vec_id", "embedding", cents)
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    val idx = IndexStore.build("ivfpq_residual", emb, "vec_id",
      "embedding", cents, cb)
    val err = intercept[IllegalArgumentException] {
      IndexStore.append(idx, tmp("nosave"), emb, "embedding")
    }
    assert(err.getMessage.contains("save()"))
  }

  test("tombstone delete: deleted ids absent, survivors == " +
      "rebuilt-without-them; compact applies and clears tombstones") {
    val dir = tmp("delete")
    val (cents, cb) = fixedIndex(emb, dir)
    val deleted = IndexStore.delete(IndexStore.load(spark, dir), dir,
      emb.filter(col("vec_id") % 7 === 3).select("vec_id"))
    val got = deleted.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)
    assert(got.filter(col("vec_id") % 7 === 3).isEmpty,
      "tombstoned ids leaked into search results")
    // the tombstone anti-join must not break serve-time dynamic
    // partition pruning: the cell column passes through it untouched
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l => l.contains("FileScan") &&
        l.contains("/codes") && l.contains("dynamicpruningexpression")),
      s"tombstone view lost DPP on the codes scan:\n$plan")
    val rebuilt = IndexStore
      .build("ivfpq_residual", emb.filter(col("vec_id") % 7 =!= 3),
        "vec_id", "embedding", cents, cb)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3)
    assert(rows(got) == rows(rebuilt))
    assert(rows(got).nonEmpty)
    // physical apply: compaction rewrites without the tombstoned rows,
    // clears the tombstone set, and serves identically
    val compacted = IndexStore.compact(deleted, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists(),
      "compaction must clear applied tombstones")
    assert(rows(compacted.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)) == rows(rebuilt))
    // a cold reload agrees (the deletion is durable, not view-state)
    assert(rows(IndexStore.load(spark, dir).search(queries, "query_id",
      "embedding", k = 10, nprobe = 3)) == rows(rebuilt))
  }

  test("compaction restores one-file-per-cell and changes nothing") {
    val dir = tmp("compact")
    fixedIndex(emb.filter(col("vec_id") % 2 === 0), dir)
    var idx = IndexStore.load(spark, dir)
    // three daily appends (disjoint odd slices) -> small files
    // accumulate per cell
    for (r <- 1 to 3)
      idx = IndexStore.append(idx, dir,
        emb.filter(col("vec_id") % 8 === 2 * r - 1), "embedding")
    val before = IndexStore.codesFileCount(spark, dir)
    val pre = rows(idx.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3))
    val compacted = IndexStore.compact(idx, dir)
    val after = IndexStore.codesFileCount(spark, dir)
    assert(after < before, s"file count did not drop: $before -> $after")
    val cells = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cells.forall(c =>
        c.listFiles().count(_.getName.startsWith("part-")) == 1),
      "compaction must leave exactly one part file per cell")
    assert(rows(compacted.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)) == pre)
    assert(pre.nonEmpty)
  }

  test("streaming appendBatch: batchId-keyed delta is idempotent under " +
      "replay (exactly-once), serve unions base + deltas, compact folds") {
    val dir = tmp("stream")
    val (cents, cb) = fixedIndex(emb.filter(col("vec_id") % 3 === 0), dir)
    val idx = IndexStore.load(spark, dir)
    val b0 = emb.filter(col("vec_id") % 3 === 1)
    val b1 = emb.filter(col("vec_id") % 3 === 2)
    IndexStore.appendBatch(idx, dir, b0, "embedding", 0L)
    IndexStore.appendBatch(idx, dir, b1, "embedding", 1L)
    // crash-replay: the stream re-executes batch 1 after a restart —
    // the batchId-keyed overwrite must leave the index unchanged
    IndexStore.appendBatch(idx, dir, b1, "embedding", 1L)
    val oneShot = rows(IndexStore
      .build("ivfpq_residual", emb, "vec_id", "embedding", cents, cb)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3))
    val streamed = rows(IndexStore.load(spark, dir)
      .search(queries, "query_id", "embedding", k = 10, nprobe = 3))
    assert(streamed == oneShot)
    assert(streamed.nonEmpty)
    // deltas landed under codes_inc, batch-then-cell partitioned
    assert(new java.io.File(s"$dir/codes_inc/batch=1").exists())
    // compaction folds the deltas into the base and removes them
    val compacted = IndexStore.compact(IndexStore.load(spark, dir), dir)
    assert(!new java.io.File(s"$dir/codes_inc").exists(),
      "compaction must fold and remove streaming deltas")
    assert(rows(compacted.search(queries, "query_id", "embedding",
      k = 10, nprobe = 3)) == oneShot)
  }

  test("load fails fast, with a named invariant, on a corrupted store") {
    val dir = tmp("corrupt")
    fixedIndex(emb, dir)
    // truncate the codebooks to half the subvectors: dim consistency
    // (subdim * m == dim) must fail at load, not inside pqAdcTable
    val cbs = spark.read.parquet(s"$dir/codebooks")
    cbs.filter(col("mi") < 4).write.mode("overwrite")
      .parquet(s"$dir/codebooks_tmp")
    spark.read.parquet(s"$dir/codebooks_tmp").write
      .mode("overwrite").parquet(s"$dir/codebooks")
    val err = intercept[IllegalArgumentException] {
      IndexStore.load(spark, dir)
    }
    assert(err.getMessage.contains("codebooks") ||
      err.getMessage.contains("dim"))
  }

  test("on-disk layout: codes are hive-partitioned by cell (the " +
      "inverted-list layout), scan reads codes only") {
    val cents = Similarity.initCentroids(emb, "vec_id", "embedding", 8)
    val cb = Similarity.pqCodebooksFixed(
      Similarity.residualCorpus(emb, "vec_id", "embedding", cents)
        .filter(col("vec_id").between(8, 23)),
      "vec_id", "embedding", m = 8, k = 16)
    val dir = tmp("layout")
    IndexStore.save(
      IndexStore.build("ivfpq_residual", emb, "vec_id", "embedding",
        cents, cb), dir)
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "codes/ must contain cell=<id> partitions")
    // the serve-time join itself must prune the codes scan to the
    // probed cells: the broadcast (cell) equi-join against a
    // hive-partitioned scan triggers DYNAMIC PARTITION PRUNING —
    // serve-time I/O is nprobe/nlist of the code column with zero
    // extra code, the Spark-native inverted-list read
    val loaded = IndexStore.load(spark, dir)
    val res = loaded.search(
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding")),
      "query_id", "embedding", k = 5, nprobe = 2)
    res.collect() // finalize the adaptive plan
    val plan = res.queryExecution.executedPlan.toString
    val codesScanFilters = plan.split("\n")
      .filter(l => l.contains("FileScan") && l.contains("/codes"))
    assert(codesScanFilters.nonEmpty, s"no codes scan in plan:\n$plan")
    assert(codesScanFilters.exists(l =>
        l.contains("dynamicpruningexpression")),
      s"codes scan is not dynamically partition-pruned:\n$plan")
    // static pruning works too (a serve path with driver-known probes)
    val pruned = loaded.codes.filter(col("cell").isin(0, 1))
    val staticPlan = pruned.queryExecution.executedPlan.toString
    assert(staticPlan.contains("PartitionFilters") &&
      staticPlan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cell"),
      s"static cell filter did not reach the parquet scan:\n$staticPlan")
  }
}
