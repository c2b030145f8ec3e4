package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths, per the standard ANN playbook:
  *   - brute-force cosine top-k — the exact baseline; one scan of the
  *     corpus per query batch, no shuffle when queries are broadcast;
  *   - random-hyperplane LSH — the scale path: bucket on sign bits,
  *     equi-join query buckets to corpus buckets, exact-rescore only
  *     collisions.
  *
  * Math runs in double via codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDF in the hot path.
  */
object Similarity {

  /** Dot product of two array columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for one literal query vector — corpus scan,
    * local top-k per partition then global k (orderBy+limit lets Spark
    * run TakeOrdered, no full sort materialization). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    corpus.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Exact top-k per query row: broadcast the (small) query set against
    * the corpus, rank within each query. One corpus scan regardless of
    * query count. */
  def topKPerQuery(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int): DataFrame = {
    val scored = corpus.crossJoin(
        broadcast(queries.select(col(qidCol), col(vecCol).as("__qv"))))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Deterministic random hyperplanes: numBits x dim, seed-fixed. */
  private[llm] def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id (sign bits of hyperplane projections) for a vector. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (h, i) =>
      when(dot(vec, typedlit(h)) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN via hyperplane LSH: bucket corpus and queries, equi-join on
    * bucket, exact-rescore collisions, top-k per query. Probing variants
    * would OR in neighbor buckets; this is the single-probe core.
    * The bucket join is the only shuffle; no all-pairs stage.
    */
  def annTopKPerQuery(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, numBits: Int = 12,
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numBits, dim)
    val cb = corpus.withColumn("__bucket", lshBucket(col(vecCol), planes))
    val qb = queries.select(col(qidCol), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), planes).as("__bucket"))
    val cand = cb.join(broadcast(qb), "__bucket")
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** IVF-style coarse quantization: centroids = a deterministic sample of
    * the corpus (first `nlist` ids — a stand-in for k-means, which would
    * slot in here unchanged); every vector is assigned to its nearest
    * centroid (broadcast argmax — one corpus scan); queries search only
    * their `nprobe` nearest centroid lists (semi-join prune before the
    * exact rescore).
    */
  def ivfTopKPerQuery(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val centroids = corpus.orderBy(idCol).limit(nlist)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cv"))
    def assign(df: DataFrame, vcol: Column, n: Int) = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("__cd", cosine(vcol, col("__cv")))
      val w = Window.partitionBy(df.columns.head).orderBy(col("__cd").desc, col("__cid"))
      scored.withColumn("__crn", row_number().over(w)).filter(col("__crn") <= n)
        .drop("__cd", "__crn", "__cv")
    }
    val corpusAssigned = assign(corpus.select(col(idCol), col(vecCol)), col(vecCol), 1)
    val queryProbes = assign(queries.select(col(qidCol), col(vecCol).as("__qv")),
      col("__qv"), nprobe)
    val cand = corpusAssigned.join(broadcast(queryProbes), "__cid")
      .select(col(qidCol), col(idCol), cosine(col(vecCol), col("__qv")).as("cos"))
    val w = Window.partitionBy(qidCol).orderBy(col("cos").desc, col(idCol))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }
}
