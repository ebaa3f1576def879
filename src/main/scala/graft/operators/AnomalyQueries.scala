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

  /** One-sided CUSUM drift detection (Page 1954) — the sustained-level-
    * shift complement to the MAD rule's point anomalies: a 20% elevation
    * lasting a week never trips a 3·MAD gate but accumulates in the
    * CUSUM. The recursion S_t = max(0, S_{t-1} + x_t) looks
    * window-inexpressible, but the prefix-min identity
    * `S_t = P_t − min(0, min_{k≤t} P_k)` (P = running sum of slack-
    * adjusted deviations) turns it into two ordinary cumulative windows
    * — so the operator distributes exactly like any windowed aggregate,
    * ≤window-sized partitions per type. Units are the MAD rule's doubled
    * integers; the scale floor `eff4 = max(mad4, med2 div 10)` (5% of
    * the median) guards MAD collapse, slack is eff4/2 (half the robust
    * σ-analogue), and drift flags when S exceeds 2.5× the robust scale
    * (`2·S₂ > 5·eff4`).
    */
  def cusumDrift(daily: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = madFlags(daily).select(
      col("event_type"),
      col("day"),
      col("n"),
      col("med2"),
      greatest(col("mad4"), expr("med2 div 10")).as("eff4")
    )
    val x2 = col("n") * 2 - col("med2") - expr("eff4 div 2")
    val wCum = Window
      .partitionBy("event_type")
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withP = base.withColumn("p2", sum(x2).over(wCum))
    withP
      .withColumn("s2", col("p2") - least(lit(0L), min(col("p2")).over(wCum)))
      .select(
        col("event_type"),
        col("day"),
        col("n"),
        col("p2"),
        col("s2"),
        (col("s2") * 2 > col("eff4") * 5).as("drift_up")
      )
  }

  private val cusumQ = Q(
    "events_cusum_drift",
    (s, d) =>
      cusumDrift(
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
        |  FROM (SELECT event_type, list_sort(list(dev2)) AS ds FROM dev GROUP BY 1) _d),
        |base AS (
        |  SELECT dev.event_type, day, n, med2,
        |    greatest(mad4, med2 // 10) AS eff4
        |  FROM dev JOIN mad ON dev.event_type = mad.event_type),
        |p AS (
        |  SELECT *, sum(n * 2 - med2 - eff4 // 2) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p2
        |  FROM base),
        |sq AS (
        |  SELECT *, p2 - least(0, min(p2) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s2
        |  FROM p)
        |SELECT event_type, day, cast(n as bigint) AS n,
        |  cast(p2 as bigint) AS p2, cast(s2 as bigint) AS s2,
        |  s2 * 2 > eff4 * 5 AS drift_up
        |FROM sq""".stripMargin
    )
  )

  /** Per-user bot-likelihood features + a documented heuristic score —
    * the abuse-detection read that pairs with the de-skew work
    * elsewhere in the registry (the day-salted windows exist precisely
    * because bots happen): sustained rate (events per active day),
    * peak-day burst, and action-type concentration (bots hammer one
    * action; the transition matrix's degenerate-row signal as one
    * number). score_pm = min(10000, rate_c div 10 + concentration_pm
    * div 2 + burst_pm div 5) — an explicitly-arbitrary, DOCUMENTED
    * combination; the certified content is the exact integer features.
    *
    * Scale shape: two bounded aggregates — (user, day) and (user,
    * type) — then one per-user rollup; map-side combinable, no windows,
    * no corpus-keyed joins.
    */
  def botScoreOf(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byDay = events
      .groupBy(col("user_id"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(
        sum("n").as("n_events"),
        count(lit(1)).as("n_days"),
        max("n").as("max_day_events")
      )
    val byType = events
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_types"), max("n").as("max_type_events"))
    byDay
      .join(byType, Seq("user_id"))
      .select(
        col("user_id"),
        col("n_events"),
        col("n_days"),
        col("n_types"),
        expr("(n_events * 100) div n_days").as("rate_c"),
        expr("(max_day_events * 10000) div n_events").as("burst_pm"),
        expr("(max_type_events * 10000) div n_events").as("concentration_pm"),
        least(
          lit(10000L),
          expr("(n_events * 100) div n_days div 10") +
            expr("(max_type_events * 10000) div n_events div 2") +
            expr("(max_day_events * 10000) div n_events div 5")
        ).as("bot_score_pm")
      )
  }

  private val botScoreQ = Q(
    "events_bot_score",
    (s, d) => botScoreOf(Tables.events(s, d)),
    Some(
      """WITH byday AS (
        |  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |du AS (
        |  SELECT user_id, sum(n) AS n_events, count(*) AS n_days, max(n) AS max_day_events
        |  FROM byday GROUP BY 1),
        |bytype AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
        |tu AS (
        |  SELECT user_id, count(*) AS n_types, max(n) AS max_type_events
        |  FROM bytype GROUP BY 1)
        |SELECT du.user_id,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_days AS BIGINT) AS n_days,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  CAST((n_events * 100) // n_days AS BIGINT) AS rate_c,
        |  CAST((max_day_events * 10000) // n_events AS BIGINT) AS burst_pm,
        |  CAST((max_type_events * 10000) // n_events AS BIGINT) AS concentration_pm,
        |  CAST(least(10000,
        |    (n_events * 100) // n_days // 10 +
        |    (max_type_events * 10000) // n_events // 2 +
        |    (max_day_events * 10000) // n_events // 5) AS BIGINT) AS bot_score_pm
        |FROM du JOIN tu ON tu.user_id = du.user_id""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(anomalyMad, cusumQ, botScoreQ)
}
