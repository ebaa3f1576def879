package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-built corpora for the event-sequence operators: funnel ordering
  * rules, cohort offsets, and the trailing range-frame tie semantics.
  */
class SequenceSpec extends SparkSuite {

  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*): DataFrame =
    rows.toSeq
      .map { case (id, user, us, typ, v) => (id, user, us, typ, v) }
      .toDF("event_id", "user_id", "us", "event_type", "value")

  test("funnel requires strictly-later stages in order") {
    val e = ev(
      (1, 1, 100, "signup", 0), (2, 1, 200, "click", 0), (3, 1, 300, "purchase", 0), // full
      (4, 2, 200, "click", 0), (5, 2, 300, "signup", 0), // click BEFORE signup → stage 1
      (6, 3, 100, "signup", 0), (7, 3, 100, "click", 0), // same instant → not later → stage 1
      (8, 4, 50, "view", 0) // never entered → stage 0
    )
    val got = operators.SequenceQueries
      .funnelOf(e)
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage"))
      .toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("retention offsets count each cohort day once per user") {
    val day = 86400000000L
    val e = ev(
      (1, 1, 0, "view", 0), (2, 1, day + 1, "view", 0), (3, 1, day + 2, "view", 0), // days 0,1
      (4, 2, day, "view", 0), (5, 2, 3 * day, "view", 0) // cohort day 1, active offset 0 and 2
    )
    val got = operators.SequenceQueries
      .retentionOf(e)
      .collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users"))
      .toMap
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("trailing window is half-open over an hour and includes order-key ties") {
    val h = 3600000000L
    val e = ev(
      (1, 1, 0, "view", 1.0),
      (2, 1, h - 1, "view", 2.0), // within (t-1h, t] of event 3
      (3, 1, h, "view", 4.0), // exactly 1h after event 1 → event 1 excluded
      (4, 1, h, "view", 8.0) // tied with event 3: range frame includes both ways
    )
    val got = operators.SequenceQueries
      .trailingOf(e)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> (r.getAs[Long]("n_1h"), r.getAs[Double]("sum_value_1h")))
      .toMap
    assert(got(1L) === ((1L, 1.0)))
    assert(got(2L) === ((2L, 3.0)))
    // Events 3 and 4 share us=h: the range frame gives both the SAME
    // window — events 2, 3, 4 (event 1 is exactly 1h earlier, excluded).
    assert(got(3L) === ((3L, 14.0)))
    assert(got(4L) === ((3L, 14.0)))
  }
}
