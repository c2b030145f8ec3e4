package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-JIT attribution probe for q_t_quality_model (VERDICT r18 item
  * 5): the driver's cold sweep read 126.6 s vs 12.2 s steady, and the
  * suspicion was that the 24 gradient rounds generate fresh codegen
  * classes every round — checkpointed-leaf names poisoning the codegen
  * cache key — so a cluster would pay 24x compilation per executor JVM.
  *
  * Separates the two candidate costs with Spark's own CodegenMetrics
  * (compile COUNT + janino compile TIME are attributable; C2/JIT warmup
  * of the generated classes is the remainder):
  *
  *   - iteration scaling: fitLogistic at iters=4 vs iters=24 in one
  *     JVM — if per-round generated code were cache-missing, compile
  *     count would grow ~linearly with iters (+20 x ~6 stages);
  *   - run-over-run: the full q_t_quality_model three times in one
  *     JVM — compiles in runs 2-3 measure what a warm executor pays.
  *
  * Prints one JSON line. `runMain graft.tools.QualityModelJitProbe
  * [sfDir]`. */
object QualityModelJitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def compiles(): (Long, Long) = (
      CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      // CodeGenerator updates this histogram in MILLISECONDS (and the
      // snapshot is reservoir-sampled — treat as indicative, the count
      // is the exact signal)
      CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)

    def timed[A](body: => A): (Double, Long) = {
      val (c0, _) = compiles()
      val t0 = System.nanoTime()
      body
      val (c1, _) = compiles()
      ((System.nanoTime() - t0) / 1e9, c1 - c0)
    }

    def fitOnly(iters: Int): Unit = {
      // same frame as SparkEntry.spreadDocs (private there)
      val d = graft.Tables.documents(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
      val feats = graft.llm.Regression.hashedNgramFeatures(
        d, "doc_id", col("text"), dim = 1024, binary = true)
      val labels = d.select(col("doc_id"),
        array_contains(graft.llm.TextAnalysis.tokens(col("text")), "spark")
          .cast("int").as("y"))
      graft.llm.Regression.fitLogistic(feats, "doc_id", labels, "y",
        iters = iters, lr = 8.0).count()
      spark.catalog.clearCache()
    }
    def fullQuery(): Unit = {
      graft.SparkEntry.queries("q_t_quality_model")(spark, sfDir).collect()
      spark.catalog.clearCache()
    }

    val (fit4Sec, fit4Compiles) = timed(fitOnly(4))
    val (fit24Sec, fit24Compiles) = timed(fitOnly(24))
    val (run1Sec, run1Compiles) = timed(fullQuery())
    val (run2Sec, run2Compiles) = timed(fullQuery())
    val (run3Sec, run3Compiles) = timed(fullQuery())
    val (_, totalCompileMs) = compiles()

    println(
      s"""{"metric":"quality_model_jit_probe","sf_dir":"$sfDir",""" +
        f""""fit4_sec":$fit4Sec%.2f,"fit4_compiles":$fit4Compiles,""" +
        f""""fit24_sec":$fit24Sec%.2f,"fit24_compiles":$fit24Compiles,""" +
        f""""run1_sec":$run1Sec%.2f,"run1_compiles":$run1Compiles,""" +
        f""""run2_sec":$run2Sec%.2f,"run2_compiles":$run2Compiles,""" +
        f""""run3_sec":$run3Sec%.2f,"run3_compiles":$run3Compiles,""" +
        s""""total_compile_ms":$totalCompileMs}""")
    spark.stop()
  }
}
