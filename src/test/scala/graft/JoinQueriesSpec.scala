package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic + plan-shape tests for the temporal join operators
  * (events_asof_join, events_interval_join) on a hand-built corpus whose
  * expected matches are computable by eye.
  */
class JoinQueriesSpec extends SparkSuite {

  import spark.implicits._

  /** Events at second offsets from a fixed origin; micros = offset * 1e6. */
  private def eventsAt(rows: (Long, Long, Long, String)*): DataFrame = {
    val origin = 1704067200L // 2024-01-01 00:00:00 UTC, epoch seconds
    rows.toSeq
      .map { case (id, user, offSec, typ) =>
        (id, new Timestamp((origin + offSec) * 1000L), user, typ, 0.0, "")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def runAsof(df: DataFrame): Map[Long, (Option[Long], Option[Long])] = {
    val dir = java.nio.file.Files.createTempDirectory("joinspec").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry
      .queries("events_asof_join")(spark, dir)
      .collect()
      .map { r =>
        r.getAs[Long]("event_id") ->
          (Option(r.getAs[java.lang.Long]("click_event_id")).map(_.longValue()),
           Option(r.getAs[java.lang.Long]("gap_us")).map(_.longValue()))
      }
      .toMap
  }

  private def runInterval(df: DataFrame): Set[(Long, Long, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("joinspec").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry
      .queries("events_interval_join")(spark, dir)
      .collect()
      .map(r =>
        (r.getAs[Long]("purchase_event_id"), r.getAs[Long]("click_event_id"),
          r.getAs[Long]("gap_us"))
      )
      .toSet
  }

  test("asof join picks the latest prior click per user") {
    val df = eventsAt(
      (1L, 7L, 10L, "click"),
      (2L, 7L, 20L, "click"),
      (3L, 7L, 30L, "purchase"), // → click 2, gap 10s
      (4L, 7L, 40L, "click"),
      (5L, 7L, 50L, "purchase"), // → click 4, gap 10s
      (6L, 8L, 45L, "purchase"), // other user, no click → null
      (7L, 9L, 60L, "view") // never matched, never output
    )
    val got = runAsof(df)
    assert(got.keySet === Set(3L, 5L, 6L))
    assert(got(3L) === ((Some(2L), Some(10000000L))))
    assert(got(5L) === ((Some(4L), Some(10000000L))))
    assert(got(6L) === ((None, None)))
  }

  test("asof join at an equal timestamp matches backward-inclusively by event_id order") {
    val df = eventsAt(
      (1L, 7L, 10L, "click"),
      (2L, 7L, 10L, "purchase"), // same ts, click id sorts first → matches, gap 0
      (3L, 7L, 10L, "click") // id sorts after the purchase → not visible to it
    )
    val got = runAsof(df)
    assert(got(2L) === ((Some(1L), Some(0L))))
  }

  test("interval join returns every click in the half-open 30-minute band") {
    val df = eventsAt(
      (1L, 7L, 0L, "click"), // exactly 30 min before → included (closed lower bound)
      (2L, 7L, 900L, "click"), // 15 min before → included
      (3L, 7L, 1800L, "purchase"),
      (4L, 7L, 1800L, "click"), // same instant → excluded (open upper bound)
      (5L, 7L, 1801L, "click"), // after → excluded
      (6L, 8L, 900L, "click") // other user → excluded
    )
    val got = runInterval(df)
    assert(
      got === Set(
        (3L, 1L, 1800000000L),
        (3L, 2L, 900000000L)
      )
    )
  }

  test("interval join crosses the bucket boundary") {
    // click at 29:59, purchase at 30:01 — different 30-min buckets; the
    // two-bucket explode must still find the pair.
    val df = eventsAt(
      (1L, 7L, 1799L, "click"),
      (2L, 7L, 1801L, "purchase")
    )
    assert(runInterval(df) === Set((2L, 1L, 2000000L)))
  }

  test("asof join keeps the de-skewed day-salted shape") {
    // r10: the carry window partitions on (user, day) — never the bare
    // user — so a hot user's history never sorts on one task. The only
    // join is the equi-join stitching the day-summary carry back (no
    // nested loop), and every event-sized window keys on (user, seg).
    val exec = SparkEntry
      .queries("events_asof_join")(spark, "/root/testdata/sf0.001")
      .queryExecution
      .executedPlan
    val inner = exec match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val plan = inner.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val windows = inner.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.nonEmpty, plan)
    // Every window over the EVENT-sized frame (the ones ordered by
    // (us, event_id)) must carry the day salt in its partition keys;
    // the day-summary window (ordered by seg alone) is bounded by
    // days-per-user and may partition on the bare user.
    windows.foreach { w =>
      val eventSized = w.orderSpec.size > 1
      if (eventSized)
        assert(w.partitionSpec.size >= 2, s"event-sized window missing the day salt: $w")
    }
  }

  test("interval join plans an equi-join, not a nested loop") {
    val plan = SparkEntry
      .queries("events_interval_join")(spark, "/root/testdata/sf0.001")
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
