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
