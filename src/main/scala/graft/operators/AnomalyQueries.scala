package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Robust time-series anomaly detection over the event stream: flag days
  * whose event count deviates from the per-type median by more than
  * 3× the median absolute deviation (the Hampel / robust-z rule —
  * mean/stddev would let the anomaly inflate its own threshold).
  *
  * Integer discipline: medians of integer counts are half-integers, so
  * everything is carried in doubled units — `med2` = lower-mid +
  * upper-mid (= 2·median, exact for either parity), `dev2` = |2n −
  * med2| (= 2·|n − median|), `mad4` = the same doubling applied to the
  * deviations (= 4·MAD) — and the 3σ-analogue gate `|n−med| > 3·MAD`
  * becomes `2·dev2 > 3·mad4` with no fraction ever materialized.
  *
  * MAD-collapse guard: a near-constant series (the most common HEALTHY
  * shape) has MAD = 0, and the bare rule would then flag every day with
  * any deviation at all. The standard Hampel fallback is a minimum
  * scale: the effective threshold is `max(3·MAD, 5% of median)`, i.e.
  * `2·dev2 > greatest(3·mad4, med2 div 5)` in the doubled units
  * (med2 div 5 = 2·(median/10) → dev > median/10 when MAD collapses).
  *
  * Scale shape: the raw stream reduces to (type, day) counts in one
  * bounded-key aggregate with map-side combine; the median/MAD passes
  * sort a ≤days-sized collected array per type (bounded by the
  * monitoring window, never by event volume).
  */
object AnomalyQueries {

  /** The Hampel gate over a pre-counted (event_type, day, n) frame —
    * exposed so the MAD-collapse fallback is spec-testable on hand
    * series the corpus fixture doesn't produce.
    */
  def madFlags(daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val med = daily
        .groupBy("event_type")
        .agg(sort_array(collect_list(col("n"))).as("ms"))
        .select(
          col("event_type"),
          expr("element_at(ms, cast((size(ms) + 1) / 2 as int)) + element_at(ms, cast(size(ms) / 2 as int) + 1)")
            .as("med2")
        )
      val dev = daily
        .join(med, Seq("event_type"))
        .withColumn("dev2", abs(col("n") * 2 - col("med2")))
      val mad = dev
        .groupBy("event_type")
        .agg(sort_array(collect_list(col("dev2"))).as("ds"))
        .select(
          col("event_type"),
          expr("element_at(ds, cast((size(ds) + 1) / 2 as int)) + element_at(ds, cast(size(ds) / 2 as int) + 1)")
            .as("mad4")
        )
      dev
        .join(mad, Seq("event_type"))
        .select(
          col("event_type"),
          col("day"),
          col("n"),
          col("med2"),
          col("dev2"),
          col("mad4"),
          (col("dev2") * 2 > greatest(col("mad4") * 3, expr("med2 div 5"))).as("is_anomaly")
        )
  }

  private val anomalyMad = Q(
    "events_anomaly_mad",
    (s, d) =>
      madFlags(
        Tables
          .events(s, d)
          .groupBy(
            col("event_type"),
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day")
          )
          .agg(count(lit(1)).as("n"))
      ),
    Some(
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type,
        |    ms[(len(ms) + 1) // 2] + ms[len(ms) // 2 + 1] AS med2
        |  FROM (SELECT event_type, list_sort(list(n)) AS ms FROM daily GROUP BY 1) _m),
        |dev AS (
        |  SELECT daily.event_type, day, n, med2, abs(n * 2 - med2) AS dev2
        |  FROM daily JOIN med ON daily.event_type = med.event_type),
        |mad AS (
        |  SELECT event_type,
        |    ds[(len(ds) + 1) // 2] + ds[len(ds) // 2 + 1] AS mad4
        |  FROM (SELECT event_type, list_sort(list(dev2)) AS ds FROM dev GROUP BY 1) _d)
        |SELECT dev.event_type, day, cast(n as bigint) AS n,
        |  cast(med2 as bigint) AS med2, cast(dev2 as bigint) AS dev2,
        |  cast(mad4 as bigint) AS mad4,
        |  dev2 * 2 > greatest(mad4 * 3, med2 // 5) AS is_anomaly
        |FROM dev JOIN mad ON dev.event_type = mad.event_type""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(anomalyMad)
}
