package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch sweep: IVF recall@5 per (nlist, nprobe, iters) on one sf dir. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    for (dir <- args) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val exact = graft.llm.Similarity.topKPerQuery(e, queries, "vec_id",
        "embedding", "query_id", k = 5)
      for ((nlist, nprobe, iters) <- Seq((16, 10, 3), (16, 12, 3), (16, 8, 5), (32, 12, 3), (16, 8, 8))) {
        val ann = graft.llm.Similarity.ivfTopKPerQuery(e, queries, "vec_id",
          "embedding", "query_id", k = 5, nlist = nlist, nprobe = nprobe,
          kmeansIters = iters)
        val r = graft.llm.Similarity.recallAtK(ann, exact, "query_id", "vec_id")
          .orderBy("query_id").collect()
          .map(x => x.getDouble(1)).mkString(",")
        println(s"PROBE dir=$dir nlist=$nlist nprobe=$nprobe iters=$iters -> $r")
      }
    }
    spark.stop()
  }
}
