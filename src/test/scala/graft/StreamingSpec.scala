package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming operators against a MemoryStream, checked for
  * agreement with their batch twins' semantics.
  */
class StreamingSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedCounts aggregates per tumbling hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 2, "click", 2.0),
      Event(3, ts(65), 1, "view", 3.0),
      Event(4, ts(70), 1, "click", 4.0)
    )
    val q = EventStreams
      .windowedCounts(input.toDF())
      .writeStream
      .format("memory")
      .queryName("win_out")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .table("win_out")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .toSet
      assert(
        rows == Set(
          ("2024-01-01 00:00:00.0", "click", 2L),
          ("2024-01-01 01:00:00.0", "view", 1L),
          ("2024-01-01 01:00:00.0", "click", 1L)
        )
      )
    } finally q.stop()
  }

  test("dedupStream drops repeats within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 1.0), // duplicate key within watermark
      Event(3, ts(10), 1, "click", 2.0), // different value -> kept
      Event(4, ts(15), 2, "click", 1.0) // different user -> kept
    )
    val q = EventStreams
      .dedupStream(input.toDF())
      .writeStream
      .format("memory")
      .queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 4L), ids.toString)
    } finally q.stop()
  }

  test("sessionize splits on >30min gaps like the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1: events at 0,10 (session 1), 50,55 (session 2 after 40min gap)
    // user 2: single event (stays open in state, emitted on watermark timeout)
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "view", 2.0),
      Event(3, ts(50), 1, "click", 3.0),
      Event(4, ts(55), 1, "view", 4.0),
      Event(5, ts(0), 2, "click", 5.0)
    )
    val q = EventStreams
      .sessionize(
        input.toDF().withWatermark("ts", "10 minutes").as[Event]
      )
      .writeStream
      .format("memory")
      .queryName("sess_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      // advance event time far enough that open sessions time out
      input.addData(Event(99, ts(600), 3, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(100, ts(1200), 3, "click", 0.0))
      q.processAllAvailable()
      val rows = spark
        .table("sess_out")
        .as[SessionOut]
        .collect()
        .map(s => (s.user_id, s.session_idx, s.n_events, s.sum_value))
        .toSet
      assert(rows.contains((1L, 1L, 2L, 3.0)), rows.toString)
      assert(rows.contains((1L, 2L, 2L, 7.0)), rows.toString)
      assert(rows.contains((2L, 1L, 1L, 5.0)), rows.toString)
    } finally q.stop()
  }

  test("intervalJoinStream matches the batch twin's half-open band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 7, "click", 0.0), // exactly 30 min before -> included
      Event(2, ts(15), 7, "click", 0.0), // 15 min before -> included
      Event(3, ts(30), 7, "purchase", 0.0),
      Event(4, ts(30), 7, "click", 0.0), // same instant -> excluded
      Event(5, ts(15), 8, "click", 0.0) // other user -> excluded
    )
    val df = input.toDF()
    val q = EventStreams
      .intervalJoinStream(df, df)
      .writeStream
      .format("memory")
      .queryName("ivj_out")
      .outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val rows = spark
        .table("ivj_out")
        .collect()
        .map(r =>
          (r.getAs[Long]("purchase_event_id"), r.getAs[Long]("click_event_id"),
            r.getAs[Long]("gap_us"))
        )
        .toSet
      assert(rows == Set((3L, 1L, 1800000000L), (3L, 2L, 900000000L)))
    } finally q.stop()
  }
}
