package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc result dump: `runMain graft.tools.QueryShow <sfDir> <query...>`
  * — runs each named SparkEntry query and prints up to 100 rows. The
  * value-level twin of [[QueryBench]] (timing) and [[PlanDump]] (plans),
  * for eyeballing outputs while iterating on oracle SQL or stability
  * probes (run twice, diff).
  */
object QueryShow {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    names.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).show(100, truncate = false)
    }
    spark.stop()
  }
}
