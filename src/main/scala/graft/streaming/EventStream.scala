package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming surface over the events schema (TESTDATA
  * events: event_id, ts, user_id, event_type, value, props): watermarked
  * event-time windows and custom sessionization state — the streaming
  * counterparts of the batch shapes in SparkEntry
  * (`q_e_tumbling_window`). SURVEY §2.11 notes the reference needs none
  * of this for parity; it's part of the engine's training-data-pipeline
  * surface (late-arriving event handling at 100 TB/day means watermarks,
  * not reprocessing).
  */
object EventStream {

  /** Tumbling event-time window aggregate with a watermark: counts and
    * mean value per (window, event_type); late events beyond the
    * watermark are dropped, state is bounded. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), avg(col("value")).as("avg_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("avg_value"))

  /** Streaming exact dedup (the training-feed version of
    * `llm.Dedup.exactDedup`): keeps the FIRST arrival of each payload
    * fingerprint and drops re-deliveries inside the watermark horizon.
    * Uses `dropDuplicatesWithinWatermark`, NOT plain `dropDuplicates`:
    * with plain dropDuplicates the event-time column must be among the
    * dedup keys for the watermark to evict state, and `__fp` alone would
    * accumulate one state row per distinct fingerprint forever. The
    * WithinWatermark variant expires each fingerprint's state once the
    * watermark passes its first-seen event time, so state is bounded to
    * the distinct fingerprints of one horizon. */
  def dedupStream(events: DataFrame, fingerprint: org.apache.spark.sql.Column,
      watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("__fp", fingerprint)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(count: Long, sum: Double, lastTs: Long)
  case class SessionOut(user_id: Long, events: Long, total: Double,
      closed: Boolean)

  /** Per-user sessionization via mapGroupsWithState: accumulates
    * per-user counts/sums, emits the running session. With `idleMs > 0`
    * a processing-time timeout closes idle sessions (production mode —
    * note the timeout makes the engine schedule wake-up batches, so
    * test harnesses relying on `processAllAvailable` should pass
    * `idleMs = 0` for the NoTimeout variant). The
    * KeyValueGroupedDataset state API is the engine's custom-state
    * extension point (X8's streaming sibling). */
  def sessionize(events: Dataset[Event], idleMs: Long = 0)
      (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val timeout =
      if (idleMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            SessionOut(user, s.count, s.sum, closed = true)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0, 0.0, 0L))
            val batch = it.toSeq
            val next = SessionState(
              prev.count + batch.size,
              prev.sum + batch.map(_.value).sum,
              batch.map(_.ts.getTime).foldLeft(prev.lastTs)(math.max))
            state.update(next)
            if (idleMs > 0) state.setTimeoutDuration(idleMs)
            SessionOut(user, next.count, next.sum, closed = false)
          }
      }
  }

  case class BandBucketState(firstId: Long, firstTsMs: Long)
  case class DupCandidate(id_a: Long, id_b: Long, band: Int)

  /** Streaming MinHash-LSH near-dup candidates: the streaming sibling
    * of `llm.Dedup.minhashNearDups`'s candidate stage. Signatures are
    * computed per row with array expressions (array_min over the
    * universal-hash family — no aggregate, so the plan stays a stateless
    * projection), then each document explodes to its `bands` band keys
    * and `flatMapGroupsWithState` keyed on (band, key) remembers the
    * FIRST document per bucket inside the watermark horizon. A later
    * document landing in an occupied bucket emits
    * `(id_a = first, id_b = later, band)` — the candidate pair, to be
    * exact-verified downstream exactly like the batch path. Event-time
    * timeout removes a bucket's state once the watermark passes its
    * first-seen time + horizon, so state is bounded to one horizon of
    * distinct band buckets (same bound as the batch band relation).
    *
    * The hash family is the SAME portable md5-derived one as the batch
    * operator, so streaming and batch candidates agree on identical
    * input. */
  def nearDupCandidates(docs: DataFrame, idCol: String,
      text: org.apache.spark.sql.Column, watermark: String = "1 hour",
      numPerm: Int = 16, bands: Int = 4, shingleK: Int = 5)
      (implicit spark: SparkSession): Dataset[DupCandidate] = {
    import graft.llm.Dedup
    import spark.implicits._
    require(numPerm % bands == 0, "numPerm must divide into bands")
    val rowsPerBand = numPerm / bands
    val horizonMs = parseDurationMs(watermark)
    val params = Dedup.minhashParams(numPerm)
    val sig = {
      val mins = params.map { case (a, b) =>
        array_min(transform(col("__hs"),
          h => pmod(h * lit(a) + lit(b), lit(2147483647L))))
      }
      array(mins: _*)
    }
    val bandKeys = (0 until bands).map(b =>
      concat_ws("|", slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand)))
    docs
      .withWatermark("ts", watermark)
      .select(col(idCol).as("id"), col("ts"),
        transform(Dedup.shingles(text, shingleK),
          s => Dedup.md5Hash31(s)).as("__hs"))
      .withColumn("__sig", sig)
      .select(col("id"), col("ts"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "key")))
      .as[(Long, Timestamp, Int, String)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BandBucketState, DupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, _), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // process in event-time order so "first" is deterministic
            val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._1))
            var first = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[DupCandidate]
            sorted.foreach { r =>
              first match {
                case None =>
                  first = Some(BandBucketState(r._1, r._2.getTime))
                case Some(f) if f.firstId != r._1 =>
                  out += DupCandidate(f.firstId, r._1, band)
                case _ => () // re-delivery of the first doc itself
              }
            }
            state.update(first.get)
            // must stay above the current watermark (a late first event
            // could otherwise schedule an already-passed timeout)
            state.setTimeoutTimestamp(math.max(
              first.get.firstTsMs + horizonMs,
              state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  private def parseDurationMs(s: String): Long = {
    val Array(n, unit) = s.trim.split("\\s+")
    val base = unit.toLowerCase match {
      case u if u.startsWith("second") => 1000L
      case u if u.startsWith("minute") => 60000L
      case u if u.startsWith("hour") => 3600000L
      case u if u.startsWith("day") => 86400000L
      case other => throw new IllegalArgumentException(s"unknown unit $other")
    }
    n.toLong * base
  }

  /** Stream-stream interval join: correlate two event feeds on a key
    * where the right event lands within `[left.ts, left.ts + horizon]`.
    * Both sides carry watermarks, and the time-range condition is what
    * BOUNDS the join state — without it Spark would buffer both streams
    * forever. This is the impressions-to-conversions shape of a
    * training-feed pipeline (label joins). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      horizon: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("__k"), col("ts").as("l_ts"),
        col("event_type").as("l_type"), col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("__k2"), col("ts").as("r_ts"),
        col("event_type").as("r_type"), col("value").as("r_value"))
    l.join(r,
      col("__k") === col("__k2") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
      .select(col("__k").as(key), col("l_ts"), col("l_type"),
        col("r_ts"), col("r_type"), col("r_value"))
  }

  /** Start a windowed-count stream into an in-memory sink (tests /
    * interactive inspection); production would writeStream to a real
    * sink with a checkpoint location. */
  def startToMemory(events: DataFrame, queryName: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedCounts(events)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(queryName)
      .start()
}
