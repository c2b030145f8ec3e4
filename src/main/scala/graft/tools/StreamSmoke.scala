package graft.tools

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Scale-headroom smoke for the stateful Structured Streaming operators
  * (`EventStream.dedupStream` / `intervalJoin`): feeds a synthetic,
  * closed-form event stream through real `MemoryStream` micro-batches at
  * a base scale and `factor` times it, self-asserts the EXACT emitted
  * row counts (so a degenerate run can't read as a fast one), and
  * reports the empirical time exponent log(t_hi/t_lo)/log(factor) per
  * probe. Three probes:
  *
  *   - `dedup` — cross-batch exact dedup with an effectively-unbounded
  *     watermark: batch 1 covers every fingerprint, batch 2 (plus a
  *     1000-row at-least-once replay slice) must emit NOTHING. State
  *     rows must equal the distinct-key count — state tracks KEYS, not
  *     events.
  *   - `window_dedup` — the production configuration: a 1-hour
  *     watermark over a multi-hour, chronologically-fed stream (8
  *     batches). Emitted count is still exactly distinct-keys (each
  *     key's duplicates arrive adjacently, inside the watermark), and
  *     the FINAL state row count must be a small fraction of the total
  *     key count: the witness that eviction keeps streaming state
  *     bounded by the window, not the corpus — the property that lets
  *     this run forever at 100 TB/day.
  *   - `interval_join` — stream-stream join where matches must form
  *     ACROSS batches out of retained state, with n-proportional
  *     unmatched left rows held in state (the realistic shape: most
  *     events never match). Output is exactly 3 per user by
  *     construction.
  *
  * Timing is min-of-2 per probe per scale (fresh query + checkpoint
  * each run; only code warmth carries over — same steady-state protocol
  * as [[LlmScaleSmoke]]). Prints one JSON line.
  * `runMain graft.tools.StreamSmoke [baseEventsK] [factor]`
  * (defaults 200 and 10).
  */
object StreamSmoke {

  /** Deterministic event layout, 100 ids per user occupying a 2-hour
    * block: offset 0 is a click at +0; offsets 1-3 are views at
    * +10/20/30 min (each matches the user's click within a 1 h
    * horizon); offsets >= 4 are noise in the block's SECOND hour, after
    * every view, so they can never match anything (r_ts >= l_ts fails
    * both ways) but still load the join state. */
  private def mkEvent(id: Long): Event = {
    val u = id / 100
    val o = (id % 100).toInt
    // wrap the per-user 2 h blocks so total event-time span stays
    // FIXED (~83 days) as n grows: the 365 d join watermark must keep
    // every batch-2 row on-time at any scale, or the engine correctly
    // drops them as late and the closed-form count breaks (observed at
    // 2M events: 20k users = 4.5 years of span, 78% of matches lost).
    // Users sharing a time window is irrelevant — the join is per-user.
    val base = 1700000000000L + (u % 1000L) * 7200000L
    val (tpe, ts) =
      if (o == 0) ("click", base)
      else if (o <= 3) ("view", base + o * 600000L)
      else ("other", base + 3600000L + o * 1000L)
    Event(id, new Timestamp(ts), u, tpe, (id % 1000).toDouble)
  }

  /** Chronology-preserving events for the dedup probes: ts advances
    * 100 ms per id, so `id div 10` keys are 1-second runs and an
    * 8-batch chronological feed spans hours of event time. */
  private def mkChronoEvent(id: Long): Event =
    Event(id, new Timestamp(1700000000000L + id * 100L), id / 100,
      "e" + (id % 5), (id % 1000).toDouble)

  private def runDedup(spark: SparkSession, events: IndexedSeq[Event],
      fingerprint: org.apache.spark.sql.Column, watermark: String,
      batches: Seq[IndexedSeq[Event]]): (Double, Long, Long) = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event]
    val emitted = new AtomicLong(0)
    val q = EventStream.dedupStream(stream.toDF(), fingerprint, watermark)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        emitted.addAndGet(df.count()); ()
      }
      .start()
    val t0 = System.nanoTime()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      val stateRows = q.recentProgress.reverse
        .find(_.stateOperators.nonEmpty)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      (sec, emitted.get(), stateRows)
    } finally q.stop()
  }

  private def runIntervalJoin(spark: SparkSession,
      lb: Seq[IndexedSeq[Event]], rb: Seq[IndexedSeq[Event]]): (Double, Long) = {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ls = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event]
    val rs = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Event]
    val emitted = new AtomicLong(0)
    val q = EventStream.intervalJoin(ls.toDF(), rs.toDF(), "user_id",
        horizon = "1 hour", watermark = "365 days")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        emitted.addAndGet(df.count()); ()
      }
      .start()
    val t0 = System.nanoTime()
    try {
      lb.zip(rb).foreach { case (l, r) =>
        ls.addData(l); rs.addData(r); q.processAllAvailable()
      }
      ((System.nanoTime() - t0) / 1e9, emitted.get())
    } finally q.stop()
  }

  private def exp(lo: Double, hi: Double, factor: Double): Double =
    math.log(hi / lo) / math.log(factor)

  def main(args: Array[String]): Unit = {
    val baseK = if (args.nonEmpty) args(0).toLong else 200L
    val factor = if (args.length > 1) args(1).toLong else 10L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      // state-partition count is the knob a cluster sizes to key
      // cardinality x throughput; fixed across both scales here so the
      // exponent isolates the per-event cost
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe(n: Long): (Double, Double, Double, Long) = {
      require(n % 200 == 0, "n must be a multiple of 200")
      // ---- dedup, unbounded watermark: key = id mod n/10; ids < n/2
      // already cover every key, so batch 2 + replay emit nothing
      val chrono = (0L until n).map(mkChronoEvent)
      val half = (n / 2).toInt
      val dedupBatches = Seq(chrono.slice(0, half),
        chrono.slice(half, n.toInt) ++ chrono.take(1000))
      def dedupOnce(): Double = {
        val (sec, emitted, stateRows) = runDedup(spark, chrono,
          (col("event_id") % (n / 10)).cast("string"), "365 days",
          dedupBatches)
        require(emitted == n / 10,
          s"dedup: emitted $emitted, expected ${n / 10}")
        require(stateRows == n / 10,
          s"dedup: state rows $stateRows != distinct keys ${n / 10}")
        sec
      }
      // ---- dedup, 1-hour watermark, 8 chronological batches; each
      // key's 10 duplicates are a 1-second run so dedup still exact
      val nb = 8
      val winBatches = (0 until nb).map { i =>
        chrono.slice(i * (n / nb).toInt, ((i + 1) * (n / nb)).toInt)
      }
      var winStateRows = -1L
      def winDedupOnce(): Double = {
        val (sec, emitted, stateRows) = runDedup(spark, chrono,
          expr("event_id div 10").cast("string"), "1 hour", winBatches)
        require(emitted == n / 10,
          s"window_dedup: emitted $emitted, expected ${n / 10}")
        // bound: keys of the final batch (watermark only advances at
        // batch boundaries) + an hour's worth of tail keys + slack
        val bound = n / (10 * nb) + 36000 / 10 + 2000
        require(stateRows >= 0 && stateRows <= bound,
          s"window_dedup: final state $stateRows exceeds bound $bound")
        winStateRows = stateRows
        sec
      }
      // ---- interval join: evens' left + odds' right first, then the
      // complement — every match crosses a batch boundary or state
      val ev = (0L until n).map(mkEvent)
      val left = ev.filter(e => e.event_type != "view")
      val right = ev.filter(e => e.event_type == "view")
      val lb = Seq(left.filter(_.user_id % 2 == 0),
        left.filter(_.user_id % 2 == 1))
      val rb = Seq(right.filter(_.user_id % 2 == 1),
        right.filter(_.user_id % 2 == 0))
      def ijOnce(): Double = {
        val (sec, emitted) = runIntervalJoin(spark, lb, rb)
        require(emitted == 3 * (n / 100),
          s"interval_join: emitted $emitted, expected ${3 * (n / 100)}")
        sec
      }
      // steady-state protocol: min-of-2, fresh query + checkpoint each
      val d = math.min(dedupOnce(), dedupOnce())
      val w = math.min(winDedupOnce(), winDedupOnce())
      val j = math.min(ijOnce(), ijOnce())
      (d, w, j, winStateRows)
    }

    val nLo = baseK * 1000
    val nHi = nLo * factor
    val (dLo, wLo, jLo, _) = probe(nLo)
    val (dHi, wHi, jHi, winStateHi) = probe(nHi)
    println(s"""{"metric":"stream_smoke","n_lo":$nLo,"n_hi":$nHi,""" +
      s""""dedup_lo_sec":$dLo,"dedup_hi_sec":$dHi,""" +
      s""""dedup_exp":${exp(dLo, dHi, factor.toDouble)},""" +
      s""""window_dedup_lo_sec":$wLo,"window_dedup_hi_sec":$wHi,""" +
      s""""window_dedup_exp":${exp(wLo, wHi, factor.toDouble)},""" +
      s""""window_state_rows_hi":$winStateHi,""" +
      s""""window_keys_hi":${nHi / 10},""" +
      s""""interval_join_lo_sec":$jLo,"interval_join_hi_sec":$jHi,""" +
      s""""interval_join_exp":${exp(jLo, jHi, factor.toDouble)}}""")
    spark.stop()
  }
}
