package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.llm.HeavyHitters

/** Misra-Gries sketch + two-pass exact heavy hitters. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // zipf-ish skew with cardinality far above k: item i of 5000 appears
  // ceil(5000/(i+1)) times -> ~45k rows, top items dominate
  private def zipf = spark.range(5000).select(
      col("id"), explode(sequence(lit(1), (lit(5000) / (col("id") + 1))
        .cast("int"))).as("rep"))
    .select(concat(lit("w"), col("id")).as("item"))
    .repartition(8) // force real partial-sketch merges across tasks

  test("two-pass heavy hitters == naive group-by at every phi") {
    val df = zipf.localCheckpoint(true)
    val n = df.count()
    for (phi <- Seq(0.001, 0.005, 0.02)) {
      val k = math.ceil(1.0 / phi).toInt // minimal legal k
      val got = HeavyHitters.heavyHitters(df, col("item"), k, phi)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1)))
      val want = df.groupBy("item").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > lit(n) * phi)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == want.toSeq, s"phi=$phi")
      assert(got.nonEmpty, s"vacuous fixture at phi=$phi")
    }
  }

  test("sketch bounds: lb <= true count, under-count <= N/(k+1), no miss") {
    val df = zipf.localCheckpoint(true)
    val n = df.count()
    val k = 64 // far below the 5000 distinct items: decrements guaranteed
    val sk = df.agg(GraftFunctions.misraGries(col("item"), k).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item").as("item"), col("e.lb").as("lb"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sk.size <= k)
    val truth = df.groupBy("item").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sk.foreach { case (item, lb) =>
      assert(lb >= 1 && lb <= truth(item), s"$item lb=$lb true=${truth(item)}")
      assert(truth(item) - lb <= n / (k + 1),
        s"$item under-counts by ${truth(item) - lb} > N/(k+1)=${n / (k + 1)}")
    }
    truth.filter(_._2 > n / (k + 1)).keys.foreach { hot =>
      assert(sk.contains(hot), s"guaranteed heavy item $hot missing")
    }
  }

  test("merge reduction keeps <= k and result is partitioning-invariant") {
    val df = zipf
    val candSets = Seq(1, 3, 16).map { p =>
      HeavyHitters.heavyHitters(df.repartition(p), col("item"), 200, 0.005)
        .orderBy("item").collect().toSeq
    }
    assert(candSets.distinct.size == 1,
      "exact output must not depend on partitioning")
  }

  test("grouped heavy hitters == per-group naive, thresholds per group") {
    // two groups with DIFFERENT totals: g0 is zipf (45k rows), g1 is a
    // small uniform group (500 rows) where far lower absolute counts
    // qualify — a global threshold would get both wrong
    val df = zipf.withColumn("g", lit("g0"))
      .unionByName(spark.range(500).select(
        concat(lit("u"), col("id") % 25).as("item"), lit("g1").as("g")))
      .localCheckpoint(true)
    val phi = 0.005
    val got = HeavyHitters.heavyHittersByGroup(df, col("g"), col("item"),
        k = 200, phi = phi)
      .orderBy("grp", "item").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totals = df.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g", "item").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (g, _, c) => c > totals(g) * phi }
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
    // both groups must contribute (g1's uniform 20-count items all
    // clear 500*0.005 = 2.5; none would clear g0's threshold)
    assert(got.count(_._1 == "g1") == 25)
    assert(got.exists(_._1 == "g0"))
  }

  test("nulls dropped; guard rejects phi below the sketch guarantee") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("item")
    val out = HeavyHitters.heavyHitters(df, col("item"), 4, 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 2L))) // N=3 (null dropped), 2 > 1.5
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, col("item"), 10, 0.01) // k+1 < 1/phi
    }
  }
}
