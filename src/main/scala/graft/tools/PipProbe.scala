package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone pip (point-in-polygon containment join) probe — the exact
  * SCALESMOKE fixture (`ScaleSmoke.pip`), isolated for the r18 verdict's
  * A/B attribution ask: the SCALESMOKE_r18 reading (pip_sec_hi 18.9 s vs
  * 6.2 s r17 at IDENTICAL 7.74M pair counts, exponent 1.647, code
  * untouched since r15) was explained by host regime only by analogy;
  * this main gives the pip probe its own detached-checkout control via
  * `tools/ab_pip.sh`.
  *
  * Same lattice as ScaleSmoke: points on a 0.001-deg grid, 0.05-deg
  * square polygons tiled at constant density, cellDeg 0.01, so output
  * pairs are O(n) and a correctly bucketed join is linear in n.
  * Runs pip at n and 4n, `reps` times each (interleaved lo/hi so host
  * drift hits both sides equally), reports per-rep times, min, and the
  * min-based exponent in one JSON line.
  *
  * Usage: `runMain graft.tools.PipProbe [nMillions] [reps]`
  * (defaults 2 and 3 — the SCALESMOKE shape: lo=2M points, hi=8M).
  */
object PipProbe {
  def main(args: Array[String]): Unit = {
    val nM = if (args.nonEmpty) args(0).toDouble else 2.0
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): String =
      scala.util.Try(scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ").head).getOrElse("-1")

    def pip(n: Long): (Double, Long) = {
      val side = math.max(math.sqrt(n.toDouble).toLong, 1L)
      val pts = spark.range(n).select(col("id").as("pid"),
        struct(((col("id") % side).cast("double") * 0.001).as("lon"),
          ((col("id") / side).cast("double") * 0.001).as("lat")).as("p"))
      val m = (side * 0.001 / 0.05).toLong + 1
      val polys = spark.range(m * m).select(col("id").as("gid"),
        ((col("id") % m).cast("double") * 0.05).as("x0"),
        ((col("id") / m).cast("double") * 0.05).as("y0"))
        .select(col("gid"), array(
          struct((col("x0") + 0.0001).as("lon"), (col("y0") + 0.0001).as("lat")),
          struct((col("x0") + 0.0499).as("lon"), (col("y0") + 0.0001).as("lat")),
          struct((col("x0") + 0.0499).as("lon"), (col("y0") + 0.0499).as("lat")),
          struct((col("x0") + 0.0001).as("lon"), (col("y0") + 0.0499).as("lat")))
          .as("ring"))
      val t = System.nanoTime()
      val pairs = graft.functions.Geo.containsJoin(pts, "pid", col("p"),
        polys, "gid", col("ring"), cellDeg = 0.01).count()
      ((System.nanoTime() - t) / 1e9, pairs)
    }

    val nLo = (nM * 1e6).toLong
    val loadBefore = loadavg()
    pip(nLo / 10) // warm codegen, same as ScaleSmoke
    var pairsLo = -1L; var pairsHi = -1L
    val loTimes = Array.ofDim[Double](reps)
    val hiTimes = Array.ofDim[Double](reps)
    for (r <- 0 until reps) {
      val (tl, pl) = pip(nLo); loTimes(r) = tl; pairsLo = pl
      val (th, ph) = pip(nLo * 4); hiTimes(r) = th; pairsHi = ph
    }
    val loMin = loTimes.min
    val hiMin = hiTimes.min
    val exp = math.log(hiMin / loMin) / math.log(4.0)
    val loadAfter = loadavg()
    def arr(xs: Array[Double]) = xs.map(t => f"$t%.2f").mkString("[", ",", "]")
    println(
      s"""{"metric":"pip_probe","n_lo":$nLo,"n_hi":${nLo * 4},""" +
        s""""pairs_lo":$pairsLo,"pairs_hi":$pairsHi,""" +
        s""""lo_reps_sec":${arr(loTimes)},"hi_reps_sec":${arr(hiTimes)},""" +
        f""""lo_min_sec":$loMin%.2f,"hi_min_sec":$hiMin%.2f,""" +
        f""""exponent":$exp%.3f,""" +
        s""""loadavg_before":$loadBefore,"loadavg_after":$loadAfter}""")
    spark.stop()
  }
}
