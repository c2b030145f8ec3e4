package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only breakdown of simhashNearDups stage costs (temp). */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 300000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%5d " +
            f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%7.1f " +
            f"cpu=${m.executorCpuTime / 1e9}%8.1f run=${m.executorRunTime / 1e3}%8.1f " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
            f"spill=${m.diskBytesSpilled / 1e6}%8.1f MB  ${si.name.take(60)}")
        }
      })
    val docs = LlmScaleSmoke.corpus(spark, n)
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$r")
    }
    def gc(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream.mapToLong(_.getCollectionTime).sum
    var g = gc()
    (1 to 3).foreach { i =>
      t(s"neardups_$i")(
        graft.llm.Dedup.simhashNearDups(docs, "id", col("text")).count())
      val g2 = gc(); println(s"gc_ms run $i: ${g2 - g}"); g = g2
    }
    t("simhash_only")(graft.llm.Dedup.simhash(docs, "id", col("text")).count())
  }
}
