package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("watermarked windowed counts over micro-batches") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventStream.startToMemory(stream.toDF(), "wc_test")
    stream.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 3.0),
      Event(3, ts(20), 2, "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("wc_test").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows === Set(
      ("2026-01-01 10:00:00.0", "click", 2L, 2.0),
      ("2026-01-01 10:00:00.0", "view", 1L, 5.0)))
    q.stop()
  }

  test("streaming exact dedup keeps first arrival per fingerprint") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val deduped = EventStream.dedupStream(stream.toDF(),
      concat_ws("|", col("event_type"), col("value")))
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dd_test").start()
    stream.addData(
      Event(1, ts(1), 1, "click", 1.0),
      Event(2, ts(2), 2, "click", 1.0),  // same payload -> dropped
      Event(3, ts(3), 1, "view", 9.0))
    q.processAllAvailable()
    stream.addData(Event(4, ts(4), 3, "click", 1.0)) // re-delivery across batches -> dropped
    q.processAllAvailable()
    val ids = spark.table("dd_test").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L))
    q.stop()
  }

  test("dedup state is evicted once the watermark passes (bounded state)") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Event]
    val deduped = EventStream.dedupStream(stream.toDF(),
      col("event_type"), watermark = "10 minutes")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ddw_test").start()
    stream.addData(Event(1, ts(1), 1, "click", 1.0))
    q.processAllAvailable()
    // advance the watermark past 10:01 + 10min so fp state expires
    stream.addData(Event(2, ts(30), 2, "view", 2.0))
    q.processAllAvailable()
    // same fingerprint again AFTER expiry: re-emitted — proof the state
    // row was evicted rather than retained forever
    stream.addData(Event(3, ts(35), 3, "click", 3.0))
    q.processAllAvailable()
    val ids = spark.table("ddw_test").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L))
    q.stop()
  }

  test("stream-stream interval join correlates within the horizon only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val joined = graft.streaming.EventStream.intervalJoin(
      clicks.toDF(), buys.toDF(), "user_id", horizon = "10 minutes")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ij_test").start()
    clicks.addData(Event(1, ts(0), 1, "click", 1.0))
    clicks.addData(Event(2, ts(0), 2, "click", 1.0))
    buys.addData(
      Event(10, ts(5), 1, "buy", 9.0),   // within 10 min of user 1's click
      Event(11, ts(20), 2, "buy", 5.0))  // 20 min later: outside horizon
    q.processAllAvailable()
    val rows = spark.table("ij_test").collect()
      .map(r => (r.getLong(0), r.getString(4), r.getDouble(5)))
    assert(rows.toSet === Set((1L, "buy", 9.0)))
    q.stop()
  }

  test("streaming near-dup: band-bucket candidates, bounded by event-time timeout") {
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    // Event stands in for a doc feed: event_id = doc id, event_type = text
    val stream = MemoryStream[Event]
    val cands = EventStream.nearDupCandidates(stream.toDF(), "event_id",
      col("event_type"), watermark = "10 minutes", numPerm = 16, bands = 4)
    val q = cands.toDF().writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("nd_test").start()
    val text = "the quick brown fox jumps over the lazy dog again and again"
    stream.addData(Event(1, ts(1), 1, text, 0.0))
    q.processAllAvailable()
    // identical text -> collides in ALL 4 bands; unrelated text -> none
    stream.addData(Event(2, ts(2), 2, text, 0.0),
      Event(3, ts(2), 3, "completely different content xyz", 0.0))
    q.processAllAvailable()
    val pairs = spark.table("nd_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSet === (0 until 4).map(b => (1L, 2L, b)).toSet)
    // advance the watermark past first-seen + horizon: the no-data
    // timeout batch removes doc 1's bucket state, so a NEW identical
    // doc opens fresh buckets and pairs with nothing
    stream.addData(Event(9, ts(40), 9, "watermark advancer unrelated", 0.0))
    q.processAllAvailable()
    stream.addData(Event(4, ts(45), 4, text, 0.0))
    q.processAllAvailable()
    val after = spark.table("nd_test").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(!after.exists(_._2 == 4L),
      "doc 4 must open fresh buckets after state expiry")
    q.stop()
  }

  test("sessionization accumulates per-user state across micro-batches") {
    implicit val sq = spark.sqlContext
    implicit val sp = spark
    val stream = MemoryStream[Event]
    val q = EventStream.sessionize(stream.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("sess_test").start()
    stream.addData(Event(1, ts(1), 7, "click", 2.0))
    q.processAllAvailable()
    stream.addData(Event(2, ts(2), 7, "click", 3.0), Event(3, ts(2), 8, "view", 1.0))
    q.processAllAvailable()
    val byUser = spark.table("sess_test").as[EventStream.SessionOut]
      .collect().groupBy(_.user_id)
    // user 7's state carried across batches: second emission sees count 2
    assert(byUser(7L).map(_.events).max === 2L)
    assert(math.abs(byUser(7L).maxBy(_.events).total - 5.0) < 1e-9)
    assert(byUser(8L).map(_.events).max === 1L)
    q.stop()
  }
}
