package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** SemDeDup's skew story, pinned (VERDICT r18 item 6): the megabucket
  * guard covers MinHash, but the semantic path's defense against a
  * celebrity cluster is "one hot join key for AQE's skew split" — a
  * claim no test exercised. This spec builds a deliberately skewed
  * corpus (80% of vectors in ONE k-means cell), drops the AQE skew
  * thresholds to test scale, runs [[Dedup.semanticDupPairs]]'s
  * cluster-keyed self-join, and asserts from the FINAL adaptive plan
  * that OptimizeSkewedJoin actually split the hot partition
  * (`SortMergeJoin(skew=true)`). Also pins correctness under the
  * split: pair counts equal the closed form, split or no split. */
class SemDedupSkewSpec extends SparkTestBase {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val prior = kvs.map { case (k, _) =>
      // get can succeed with null (a conf whose default is unset) —
      // treat that as absent or the restore path would set(k, null)
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)
    }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // 4-dim corpus, 4 unit-basis centroids; ids with id % 5 != 0 (80%)
  // point at e0 (the hot cell), the rest spread over e1..e3. The
  // off-axis jitter is id-dependent noise so shuffle bytes don't
  // compress away beneath the skew threshold.
  private val dim = 4
  private val cents: Seq[Seq[Double]] =
    Seq.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
  private def corpus(n: Long) = {
    val hot = col("id") % 5 =!= 0
    val grp = (col("id") % 3 + 1).cast("int")
    val axis = when(hot, lit(0)).otherwise(grp)
    val vec = array((0 until dim).map { d =>
      when(lit(d) === axis, lit(1.0))
        .otherwise(pmod(col("id") * (d + 7), lit(997)).cast("double") / 10000.0)
    }: _*)
    spark.range(n).select(col("id"), vec.as("vec"))
      .repartition(8, col("id")) // spread input so assignment is parallel
  }

  test("AQE skew split fires on the hot SemDeDup cluster key, " +
      "and pair counts are exact under the split") {
    val n = 4000L
    val nHot = (0L until n).count(_ % 5 != 0) // 3200
    val rest = (1 to 3).map(g =>
      (0L until n).count(id => id % 5 == 0 && id % 3 + 1 == g))
    val expectedPairs =
      nHot * (nHot - 1) / 2 + rest.map(c => c * (c - 1) / 2).sum
    withConfs(
      // force the sort-merge path (skew split does not apply to
      // broadcast joins) and drop the skew thresholds to test scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4096",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      // threshold 2.0 keeps the OUTPUT empty (cosines < 1): the cost
      // under test is the in-cluster pair JOIN, not the result size.
      // collect() THIS frame so ITS AdaptiveSparkPlan finalizes —
      // count() would execute a separate QueryExecution and leave
      // pairs' own plan un-run (isFinalPlan=false, no skew marks).
      val pairs = Dedup.semanticDupPairs(corpus(n), "id", "vec",
        cents, threshold = 2.0)
      assert(pairs.collect().isEmpty)
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not split the hot cluster key:\n$plan")
      // correctness under the split: the all-pairs count (threshold
      // -2 passes every cosine) equals the closed form
      val all = Dedup.semanticDupPairs(corpus(n), "id", "vec",
        cents, threshold = -2.0)
      assert(all.count() == expectedPairs,
        s"pair count under skew split must equal the closed form")
    }
  }

  test("without AQE skew handling the same plan has no split " +
      "(the witness is the conf, not an accident of data)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false") {
      val pairs = Dedup.semanticDupPairs(corpus(1000), "id", "vec",
        cents, threshold = 2.0)
      pairs.collect() // finalize THIS frame's adaptive plan
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"plan not finalized:\n$plan")
      assert(!plan.contains("skew=true"))
    }
  }
}
