package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multipolygon-assembly scale witness: synthesizes millions of
  * multipolygon relations straight from `spark.range` — every outer
  * ring split across three ways with the middle way drawn REVERSED
  * (the stitcher's hard case), every 10th relation carrying a hole —
  * then times `assembleRings` + `multipolygonAreas` at two scales.
  * Integer-grid coordinates make every shoelace term IEEE-exact, so
  * the witness asserts the EXACT total area (16·n − holes), total ring
  * counts, and that all rings close — correctness at scale, not just
  * wall-clock.
  *
  * Run: `sbt "runMain graft.tools.MpSmoke [relationsLo]"`.
  */
object MpSmoke {
  def main(args: Array[String]): Unit = {
    val nLo = if (args.nonEmpty) args(0).toLong else 500000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(x.cast("double").as("lon"), y.cast("double").as("lat"))

    def run(n: Long): (Double, Long, Long, Double) = {
      val rels = spark.range(n)
        .select(col("id").as("r"),
          ((col("id") % 1000L) * 10L).as("bx"),
          ((col("id") / 1000L) * 10L).as("by"))
      // outer square (bx,by)..(bx+4,by+4) as 3 ways, middle reversed;
      // hole (1x1) on every 10th relation
      val ways = rels.select(col("r"), explode(array(
          struct((col("r") * 4).as("id"),
            array(pt(col("bx"), col("by")), pt(col("bx") + 4, col("by")))
              .as("linestring")),
          struct((col("r") * 4 + 1).as("id"),
            array(pt(col("bx") + 4, col("by") + 4), pt(col("bx") + 4, col("by")))
              .as("linestring")),
          struct((col("r") * 4 + 2).as("id"),
            array(pt(col("bx") + 4, col("by") + 4), pt(col("bx"), col("by") + 4),
              pt(col("bx"), col("by"))).as("linestring")),
          struct((col("r") * 4 + 3).as("id"),
            when(col("r") % 10 === 0, array(
              pt(col("bx") + 1, col("by") + 1), pt(col("bx") + 2, col("by") + 1),
              pt(col("bx") + 2, col("by") + 2), pt(col("bx") + 1, col("by") + 2),
              pt(col("bx") + 1, col("by") + 1)))
              .otherwise(lit(null)).as("linestring"))
        )).as("w"))
        .select(col("r"), col("w.id").as("id"), col("w.linestring"))
        .filter(col("linestring").isNotNull)
      val members = ways.select(
        col("r").as("relation_id"), col("id").as("member_id"),
        lit("W").as("member_type"),
        when(col("id") % 4 === 3, "inner").otherwise("outer").as("member_role"),
        (col("id") % 4).cast("int").as("sequence_id"))
      val waysIn = ways.select(col("id"), col("linestring"))

      val t0 = System.nanoTime()
      val rings = graft.osm.Multipolygon.assembleRings(members, waysIn)
        .localCheckpoint(true)
      val stats = rings.agg(
        count(lit(1)).as("rings"),
        sum(when(col("closed"), 0L).otherwise(1L)).as("open")).head()
      val areas = graft.osm.Multipolygon.multipolygonAreas(members, waysIn)
        .agg(count(lit(1)).as("rels"), sum(col("area_deg2")).as("area")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      require(stats.getLong(1) == 0L, s"open rings: ${stats.getLong(1)}")
      val holes = (n + 9) / 10
      require(stats.getLong(0) == n + holes,
        s"ring count ${stats.getLong(0)} != ${n + holes}")
      require(areas.getLong(0) == n, s"relation count ${areas.getLong(0)}")
      val expect = 16.0 * n - 1.0 * holes
      require(math.abs(areas.getDouble(1) - expect) < 1e-6,
        s"total area ${areas.getDouble(1)} != $expect")
      (sec, stats.getLong(0), holes, areas.getDouble(1))
    }

    run(10000L) // JIT warmup
    val (secLo, ringsLo, _, _) = run(nLo)
    val (secHi, ringsHi, _, _) = run(nLo * 4)
    val exp = math.log(secHi / secLo) / math.log(4.0)
    println(s"""{"metric":"mp_smoke","relations_lo":$nLo,""" +
      s""""relations_hi":${nLo * 4},"rings_lo":$ringsLo,"rings_hi":$ringsHi,""" +
      f""""assemble_sec_lo":$secLo%.2f,"assemble_sec_hi":$secHi%.2f,""" +
      f""""exponent":$exp%.3f,"exact_area_checked":true}""")
    spark.stop()
  }
}
