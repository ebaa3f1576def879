package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Monotone-trend testing and value-distribution auditing over the
  * event stream — the two classic nonparametric checks an analytics
  * pipeline runs on every metric series:
  *
  *  - Mann-Kendall (Mann 1945, Kendall's τ-based trend test): is the
  *    daily event count drifting monotonically? Distribution-free — the
  *    right default when nothing is known about the series — and the
  *    complement of the registry's MAD point-anomaly and CUSUM
  *    level-shift detectors: a slow steady drift trips neither.
  *  - Benford first-significant-digit audit (Newcomb 1881 / Benford
  *    1938): organic multiplicative quantities follow
  *    P(d) = log10(1+1/d); fabricated or truncated values don't — the
  *    standard forensic data-quality scan.
  *
  * Scale shapes: both reduce the stream in ONE bounded-key map-side-
  * combined aggregate (days×types for MK; 9 digits for Benford). The
  * MK pairwise S statistic self-joins the DAILY table (≤ window days
  * per type — bounded by the monitoring window, never event volume).
  *
  * Engine determinism: S, the tie-corrected variance NUMERATOR, and
  * all counts are exact integers; the z-score is one fixed-shape
  * double expression over them, quantized 1e-4; Benford's expected
  * shares are INTEGER permyriad literals precomputed in Scala and
  * embedded into both plans, so no libm call crosses engines; the
  * first digit comes from integer-to-string of the milli-quantized
  * value (no float log10 at the digit boundary).
  */
object TrendQueries {

  private def daily(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables
      .events(s, d)
      .groupBy(
        col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day")
      )
      .agg(count(lit(1)).as("n"))

  /** Mann-Kendall over a (event_type, day, n) frame. */
  def mannKendallOf(dailyDf: DataFrame): DataFrame = {
    val d1 = dailyDf.select(col("event_type"), col("day").as("d1"), col("n").as("n1"))
    val d2 = dailyDf.select(col("event_type"), col("day").as("d2"), col("n").as("n2"))
    val s = d1
      .join(d2, Seq("event_type"))
      .filter(col("d1") < col("d2"))
      .groupBy("event_type")
      .agg(
        sum(
          when(col("n2") > col("n1"), 1L).when(col("n2") < col("n1"), -1L).otherwise(0L)
        ).as("s_stat")
      )
    val nd = dailyDf.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    // Tie correction: Σ_t t(t−1)(2t+5) over groups of equal n.
    val ties = dailyDf
      .groupBy("event_type", "n")
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_sum"))
    s.join(nd, "event_type")
      .join(ties, "event_type")
      .withColumn(
        "var_num",
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum")
      )
      .withColumn(
        "z_qm",
        when(
          col("var_num") > 0,
          round(
            (col("s_stat") - signum(col("s_stat"))).cast("double") /
              sqrt(col("var_num").cast("double") / 18.0) * 1e4
          ).cast("long")
        )
      )
      .withColumn(
        "trend",
        when(col("z_qm") > 19600, "increasing")
          .when(col("z_qm") < -19600, "decreasing")
          .otherwise("none")
      )
      .select("event_type", "n_days", "s_stat", "var_num", "z_qm", "trend")
  }

  private val mkQ = Q(
    "events_trend_mk",
    (s, d) => mannKendallOf(daily(s, d)),
    Some(
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT d1.event_type,
        |    CAST(sum(CASE WHEN d2.n > d1.n THEN 1 WHEN d2.n < d1.n THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily d1 JOIN daily d2
        |    ON d1.event_type = d2.event_type AND d1.day < d2.day
        |  GROUP BY 1),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
        |ties AS (
        |  SELECT event_type, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_sum
        |  FROM (SELECT event_type, n, count(*) AS t FROM daily GROUP BY 1, 2) _t
        |  GROUP BY 1),
        |m AS (
        |  SELECT s.event_type, s.s_stat, nd.n_days,
        |    n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum AS var_num
        |  FROM s JOIN nd ON nd.event_type = s.event_type
        |  JOIN ties ON ties.event_type = s.event_type)
        |SELECT event_type, n_days, s_stat, var_num,
        |  CASE WHEN var_num > 0 THEN CAST(round(
        |    CAST(s_stat - sign(s_stat) AS double) /
        |      sqrt(CAST(var_num AS double) / 18.0) * 1e4) AS BIGINT) END AS z_qm,
        |  CASE WHEN (CASE WHEN var_num > 0 THEN CAST(round(
        |         CAST(s_stat - sign(s_stat) AS double) /
        |           sqrt(CAST(var_num AS double) / 18.0) * 1e4) AS BIGINT) END) > 19600
        |       THEN 'increasing'
        |       WHEN (CASE WHEN var_num > 0 THEN CAST(round(
        |         CAST(s_stat - sign(s_stat) AS double) /
        |           sqrt(CAST(var_num AS double) / 18.0) * 1e4) AS BIGINT) END) < -19600
        |       THEN 'decreasing'
        |       ELSE 'none' END AS trend
        |FROM m""".stripMargin
    )
  )

  /** Benford expected shares in integer permyriad — precomputed HERE
    * and embedded as literals into both plans (no cross-engine log10).
    */
  private val BenfordPm: Map[Int, Long] =
    (1 to 9).map(d => d -> math.round(math.log10(1.0 + 1.0 / d) * 10000)).toMap

  private val benfordQ = Q(
    "events_benford",
    (s, d) => {
      val bexp = typedLit((1 to 9).map(d0 => BenfordPm(d0)))
      val ev = Tables
        .events(s, d)
        .select(round(col("value") * 1000).cast("long").as("mv"))
        .filter(col("mv") >= 1)
        .select(substring(col("mv").cast("string"), 1, 1).cast("int").as("digit"))
      val n = ev.agg(count(lit(1)).as("nt"))
      ev.groupBy("digit")
        .agg(count(lit(1)).as("n_obs"))
        .withColumn("j", (col("n_obs") - col("n_obs") + 1).cast("int"))
        .join(broadcast(n.select((col("nt") - col("nt") + 1).cast("int").as("j"), col("nt"))), Seq("j"))
        .select(
          col("digit").cast("long").as("digit"),
          col("n_obs"),
          expr("n_obs * 10000 div nt").as("share_pm"),
          element_at(bexp, col("digit")).as("benford_pm")
        )
        .withColumn("excess_pm", col("share_pm") - col("benford_pm"))
    },
    Some {
      val vals = (1 to 9).map(d0 => s"($d0, ${BenfordPm(d0)})").mkString(", ")
      s"""WITH ev AS (
         |  SELECT CAST(substr(CAST(mv AS VARCHAR), 1, 1) AS INT) AS digit
         |  FROM (SELECT CAST(round(value * 1000) AS BIGINT) AS mv FROM events) _m
         |  WHERE mv >= 1),
         |n AS (SELECT count(*) AS nt FROM ev),
         |b(digit, benford_pm) AS (VALUES $vals)
         |SELECT CAST(ev.digit AS BIGINT) AS digit,
         |  CAST(count(*) AS BIGINT) AS n_obs,
         |  count(*) * 10000 // (SELECT nt FROM n) AS share_pm,
         |  CAST(b.benford_pm AS BIGINT) AS benford_pm,
         |  count(*) * 10000 // (SELECT nt FROM n) - b.benford_pm AS excess_pm
         |FROM ev JOIN b ON b.digit = ev.digit
         |GROUP BY ev.digit, b.benford_pm""".stripMargin
    }
  )

  /** Day-of-week seasonality profile — the companion the MK trend test
    * needs before anyone believes it (weekly periodicity masquerades as
    * short-window trend): per event type, ISO weekday counts, share,
    * and integer lift vs the uniform 1/7 (10000 = flat). One ≤ 7·types
    * map-side-combined aggregate.
    */
  private val dowQ = Q(
    "events_dow_profile",
    (s, d) => {
      val byDow = Tables
        .events(s, d)
        // weekday(): 0=Monday … 6 → +1 matches DuckDB isodow (1=Monday).
        .groupBy(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("dow"))
        .agg(count(lit(1)).as("n"))
      val tot = byDow.groupBy("event_type").agg(sum("n").as("nt"))
      byDow
        .join(broadcast(tot), "event_type")
        .select(
          col("event_type"),
          col("dow"),
          col("n"),
          expr("(n * 10000) div nt").as("share_pm"),
          expr("(n * 7 * 10000) div nt").as("lift_pm")
        )
    },
    Some(
      """WITH byd AS (
        |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, sum(n) AS nt FROM byd GROUP BY 1)
        |SELECT b.event_type, b.dow, CAST(b.n AS BIGINT) AS n,
        |  CAST((b.n * 10000) // t.nt AS BIGINT) AS share_pm,
        |  CAST((b.n * 7 * 10000) // t.nt AS BIGINT) AS lift_pm
        |FROM byd b JOIN tot t ON t.event_type = b.event_type""".stripMargin
    )
  )

  /** User-concentration Gini coefficient (Gini 1912; the Lorenz-curve
    * summary every abuse/engagement dashboard carries: 0 = every user
    * equally active, →1 = a handful of users generate everything).
    *
    * Scale shape: computed WITHOUT ordering users — ranking 10⁹ users
    * by activity is the forbidden global sort. Instead the exact rank
    * sum S = Σᵢ i·cᵢ comes from the COUNT-OF-COUNTS histogram
    * (distinct per-user activity values — bounded by max activity, the
    * docs_ppl_buckets bounded-histogram discipline): a group of m users
    * at count c, preceded by r users, contributes c·(m·r + m(m+1)/2).
    * The cumulative window runs over the bounded histogram only. Gini
    * = (2S − (n+1)T) / (nT), evaluated as ONE fixed-shape double
    * expression over exact int64 components (headroom-free at any n).
    */
  private val giniQ = Q(
    "events_user_gini",
    (s, d) => {
      val cnts = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
      val hist = cnts.groupBy("c").agg(count(lit(1)).as("m"))
      val w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
      val s2 = hist
        .withColumn("r", coalesce(sum("m").over(w), lit(0L)))
        .agg(
          sum(col("c") * (col("m") * col("r") + expr("(m * (m + 1)) div 2"))).as("s2")
        )
      val tot = cnts.agg(count(lit(1)).as("n_users"), sum("c").as("total_events"))
      tot
        .withColumn("j", (col("n_users") - col("n_users") + 1).cast("int"))
        .join(
          broadcast(s2.select((col("s2") - col("s2") + 1).cast("int").as("j"), col("s2"))),
          Seq("j")
        )
        .select(
          col("n_users"),
          col("total_events"),
          round(
            lit(1e4) *
              (lit(2.0) * col("s2").cast("double") -
                (col("n_users") + 1).cast("double") * col("total_events").cast("double")) /
              (col("n_users").cast("double") * col("total_events").cast("double"))
          ).cast("long").as("gini_qm")
        )
    },
    Some(
      """WITH cnts AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
        |hist AS (SELECT c, count(*) AS m FROM cnts GROUP BY 1),
        |h2 AS (
        |  SELECT c, m,
        |    coalesce(sum(m) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
        |  FROM hist),
        |s2 AS (SELECT CAST(sum(c * (m * r + (m * (m + 1)) // 2)) AS BIGINT) AS s2 FROM h2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_users, CAST(sum(c) AS BIGINT) AS total_events FROM cnts)
        |SELECT n_users, total_events,
        |  CAST(round(10000.0 *
        |    (2.0 * CAST(s2 AS double) - CAST(n_users + 1 AS double) * CAST(total_events AS double)) /
        |    (CAST(n_users AS double) * CAST(total_events AS double))) AS BIGINT) AS gini_qm
        |FROM tot, s2""".stripMargin
    )
  )

  /** Exponentially-weighted moving level (Brown/Holt simple smoothing,
    * α = 0.3) over the per-type daily counts — the forecasting-side
    * complement of the detectors: CUSUM asks "did the level shift?",
    * the EWMA IS the level. The recursion runs as ONE in-row integer
    * fold over the bounded day series (milli-units, S ← (3·x·1000 +
    * 7·S) div 10 — exact in both engines; DuckDB replays with
    * list_reduce over the day-ordered list, seeded by the first
    * observation). Output: final level + the last-day residual the
    * alerting rule consumes.
    */
  private val ewmaQ = Q(
    "events_ewma_level",
    (s, d) => {
      val byDay = daily(s, d)
      byDay
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_days"),
          sort_array(collect_list(struct(col("day"), col("n")))).as("ds")
        )
        .withColumn("xs", transform(col("ds"), e => e.getField("n")))
        .select(
          col("event_type"),
          col("n_days"),
          element_at(col("xs"), -1).as("last_n"),
          // SQL-lambda form: the Column API has no integral division,
          // and `/` on longs would go double (inexact past 2^53).
          expr(
            "aggregate(slice(xs, 2, greatest(size(xs) - 1, 0)), " +
              "element_at(xs, 1) * 1000L, (s, x) -> (3L * x * 1000L + 7L * s) div 10)"
          ).as("level_milli")
        )
        .withColumn("resid_milli", col("last_n") * 1000 - col("level_milli"))
    },
    Some(
      """WITH daily AS (
        |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    list(CAST(n AS BIGINT) ORDER BY day) AS xs
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days,
        |  xs[len(xs)] AS last_n,
        |  list_reduce(list_prepend(xs[1] * 1000, xs[2:]),
        |    (s, x) -> (3 * x * 1000 + 7 * s) // 10) AS level_milli,
        |  xs[len(xs)] * 1000 - list_reduce(list_prepend(xs[1] * 1000, xs[2:]),
        |    (s, x) -> (3 * x * 1000 + 7 * s) // 10) AS resid_milli
        |FROM ser""".stripMargin
    )
  )

  /** Sample autocorrelation of the daily event-count series at lags
    * 1..7 (Box & Jenkins 1970 §2.1.4): r_L = Σ(c_t−m)(c_{t+L}−m) /
    * Σ(c_t−m)². The seasonality detector that pairs with the DOW
    * profile — a weekly cycle shows as an r_7 spike — and with
    * Mann-Kendall (trend inflates ALL lags; a lone lag-7 peak is pure
    * seasonality).
    *
    * The day axis is DENSIFIED (empty days count 0) so lags mean
    * calendar days, not observation ranks. Scale shape: one bounded
    * (type, day) aggregate, one date-sequence explode over the bounded
    * span, a 7-way lag explode joined back on the (type, day) key, and
    * a bounded final aggregate — no windows, every key space is
    * days×types. Exact integers throughout: multiplying through by n²,
    * num_L = n²·P_L − n·S·(A_L+B_L) + (n−L)·S² and den = n²·Q − n·S²
    * ride decimal(38,0); one double division quantized 1e-4 at the end
    * (the z_qm discipline).
    */
  def acfOf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val dailyD = events
      .groupBy(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val dense = dailyD
      .groupBy("event_type")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
      .join(dailyD, Seq("event_type", "day"), "left")
      .withColumn("c", coalesce(col("n"), lit(0L)))
      .select("event_type", "day", "c")
    val tot = dense
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("nd"),
        sum("c").as("s"),
        sum(expr("cast(c as decimal(38,0)) * c")).as("q")
      )
    val lagged = dense
      .select(
        col("event_type"),
        explode(expr(s"sequence(1, $maxLag)")).as("lag"),
        col("day"),
        col("c").as("c1")
      )
      .withColumn("day2", expr("date_add(day, cast(lag as int))"))
      .join(
        dense.select(col("event_type"), col("day").as("day2"), col("c").as("c2")),
        Seq("event_type", "day2")
      )
      .groupBy("event_type", "lag")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(expr("cast(c1 as decimal(38,0)) * c2")).as("p"),
        sum("c1").as("sa"),
        sum("c2").as("sb")
      )
    lagged
      .join(tot, Seq("event_type"))
      .withColumn(
        "num",
        expr(
          "cast(nd as decimal(38,0)) * nd * p - cast(nd as decimal(38,0)) * s * (sa + sb) + (nd - lag) * cast(s as decimal(38,0)) * s"
        )
      )
      .withColumn("den", expr("cast(nd as decimal(38,0)) * nd * q - cast(nd as decimal(38,0)) * s * s"))
      .select(
        col("event_type"),
        col("lag").cast("long").as("lag"),
        col("nd").as("n_days"),
        col("n_pairs"),
        when(
          col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double") * 1e4).cast("long")
        ).as("acf_qm")
      )
  }

  private val acfQ = Q(
    "events_acf",
    (s, d) => acfOf(Tables.events(s, d)),
    Some(
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |dense AS (
        |  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1) sp),
        |cnt AS (
        |  SELECT dense.event_type, dense.day, coalesce(daily.n, 0) AS c
        |  FROM dense LEFT JOIN daily USING (event_type, day)),
        |tot AS (
        |  SELECT event_type, count(*) AS nd, sum(c) AS s, sum(CAST(c AS HUGEINT) * c) AS q
        |  FROM cnt GROUP BY 1),
        |lagged AS (
        |  SELECT a.event_type, l.lag, count(*) AS n_pairs,
        |    sum(CAST(a.c AS HUGEINT) * b.c) AS p, sum(a.c) AS sa, sum(b.c) AS sb
        |  FROM cnt a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        |  JOIN cnt b ON b.event_type = a.event_type AND b.day = a.day + CAST(l.lag AS INTEGER)
        |  GROUP BY 1, 2)
        |SELECT g.event_type, CAST(g.lag AS BIGINT) AS lag,
        |  CAST(t.nd AS BIGINT) AS n_days, CAST(g.n_pairs AS BIGINT) AS n_pairs,
        |  CASE WHEN CAST(t.nd AS HUGEINT) * t.nd * t.q - CAST(t.nd AS HUGEINT) * t.s * t.s > 0
        |    THEN CAST(round(
        |      CAST(CAST(t.nd AS HUGEINT) * t.nd * g.p - CAST(t.nd AS HUGEINT) * t.s * (g.sa + g.sb)
        |           + (t.nd - g.lag) * CAST(t.s AS HUGEINT) * t.s AS DOUBLE) /
        |      CAST(CAST(t.nd AS HUGEINT) * t.nd * t.q - CAST(t.nd AS HUGEINT) * t.s * t.s AS DOUBLE)
        |      * 1e4) AS BIGINT)
        |  END AS acf_qm
        |FROM lagged g JOIN tot t USING (event_type)""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(mkQ, benfordQ, dowQ, giniQ, ewmaQ, acfQ)
}
