package graft

import org.apache.spark.sql.functions._

import graft.functions.WeightedMedian

/** The scalable weighted median must agree with the window-based
  * reference implementation on every input shape, and the injected
  * optimizer rule must fire. */
class ScalableWmSpec extends SparkTestBase {
  import spark.implicits._

  test("scalable == window weighted median on the reference fixtures") {
    val t1 = Seq((0.0, Some(325)), (1.0, Some(-100)), (5.0, Some(50)),
      (3.0, None), (2.7, Some(1153)), (2.0, Some(98))).toDF("k", "v")
    val t2 = Seq((0.0, 0), (1.0, 0), (5.0, 0), (3.0, 0), (2.7, 0), (2.0, 0))
      .toDF("k", "v")
    assert(WeightedMedian.weightedMedianScalable(t1, "k", "v", 3) ===
      WeightedMedian.weightedMedian(t1, "k", "v"))
    val a = WeightedMedian.weightedMedianScalable(t2, "k", "v", 3)
    val b = WeightedMedian.weightedMedian(t2, "k", "v")
    assert(a.isDefined && b.isDefined && math.abs(a.get - b.get) < 1e-9)
  }

  test("scalable == window on seeded random data across partition counts") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val n = 50 + rnd.nextInt(200)
      // integer-ish weights and distinct x keep both paths deterministic
      val rows = (1 to n).map(i => (rnd.shuffle((1 to 10000).toList).head.toDouble,
        rnd.nextInt(100).toDouble))
      val df = rows.toDF("x", "w")
      val expected = WeightedMedian.weightedMedian(df, "x", "w")
      Seq(1, 4, 13).foreach { p =>
        val got = WeightedMedian.weightedMedianScalable(df, "x", "w", p)
        assert(got.isDefined === expected.isDefined)
        if (expected.isDefined)
          assert(math.abs(got.get - expected.get) < 1e-6,
            s"parts=$p got=$got expected=$expected")
      }
    }
  }

  test("scalable handles empty input") {
    val empty = Seq.empty[(Double, Double)].toDF("x", "w")
    assert(WeightedMedian.weightedMedianScalable(empty, "x", "w", 4) === None)
  }

  test("optimizer rule eliminates reverse(reverse) and collapses array_distinct") {
    // parquet-backed so ConvertToLocalRelation can't fold the project away
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(split(col("p_type"), " ").as("a"))
    val p1 = df.select(reverse(reverse(col("a"))).as("r"))
      .queryExecution.optimizedPlan.toString
    assert(!p1.contains("reverse("), s"double reverse should cancel:\n$p1")
    val p2 = df.select(array_distinct(array_distinct(col("a"))).as("r"))
      .queryExecution.optimizedPlan.toString
    assert("array_distinct".r.findAllIn(p2).length === 1, p2)
  }
}
