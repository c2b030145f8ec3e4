package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Optimization-round plan snapshots: dumps the final (post-AQE)
  * `.explain("formatted")` of the named queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after evidence files
  * an optimization round commits next to its bench numbers.
  *
  *   runMain graft.tools.PlanSnap <tag> <suffix> <query...>
  *
  * e.g. `runMain graft.tools.PlanSnap r21 before q_t_quality_model`.
  * Same session config as [[graft.Bench]] so the dumped plan is the
  * plan the bench actually runs (PlanDump uses local[8]/sf0.001 for the
  * audit trail; this one defaults to the bench's SF and core count).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val lineCap = 800
    val outDir = Paths.get("plans").resolve(tag)
    Files.createDirectories(outDir)
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val capped = plan.split("\n", -1).map { l =>
        if (l.length > lineCap)
          l.substring(0, lineCap) +
            s" …[truncated, was ${l.length} chars]"
        else l
      }.mkString("\n")
      Files.writeString(outDir.resolve(s"${q}_$suffix.txt"),
        s"# $q ($suffix) — final physical plan at $sfDir\n\n$capped\n")
      println(s"[plansnap] wrote plans/$tag/${q}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
