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
