package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Incremental view maintenance: the daily-partial → running-total merge
  * every long-lived 100 TB deployment runs instead of re-scanning
  * history. The operator materializes per-(day, type) partial aggregate
  * STATES — additive counters, decimal sums, min/max, and KMV
  * distinct-user registers — then produces the all-time view by merging
  * states only: counters add, minima/maxima fold, registers take
  * per-shard minima. Yesterday's partials never touch the raw events
  * again; each day appends one bounded partial batch and re-merges a
  * days×types-sized table.
  *
  * The distinct-user count is the part plain SQL cannot maintain
  * incrementally (COUNT(DISTINCT) is not additive across days) — the KMV
  * register state (corpus_distinct_kmv's construction, 64 shards, k=16)
  * is, which is exactly why sketches belong in incremental pipelines.
  * All estimator arithmetic is integer (div), decimal sums cast to
  * double only at the output boundary — the engine-portability
  * discipline used across this repo.
  */
object IncrementalQueries {

  private val Shards = 64
  private val K = 16

  private val partialMerge = Q(
    "events_partial_merge",
    (s, d) => {
      val ev = Tables
        .events(s, d)
        .select(
          date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"),
          col("value"),
          SketchQueries.hash48(col("user_id").cast("string")).as("uh")
        )
      // Daily partial states (what a production job writes per partition).
      val scalarPartials = ev
        .groupBy("day", "event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sum_dec"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v")
        )
      val registerPartials = ev
        .groupBy(col("day"), col("event_type"), (col("uh") % Shards).as("shard"))
        .agg(min(col("uh")).as("minh"))
      // The merge: state-only arithmetic, no raw-event access.
      val scalars = scalarPartials
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_days"),
          sum(col("n")).as("n_events"),
          sum(col("sum_dec")).cast("double").as("sum_value"),
          min(col("min_v")).as("min_value"),
          max(col("max_v")).as("max_value")
        )
      val users = registerPartials
        .groupBy("event_type", "shard")
        .agg(min(col("minh")).as("minh"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_shards"), sort_array(collect_list(col("minh"))).as("ms"))
        .select(
          col("event_type"),
          SketchQueries.kmvEstimate("ms", col("n_shards"), K).as("est_users")
        )
      scalars.join(users, Seq("event_type"))
    },
    Some(
      s"""WITH ev AS (
         |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type, value,
         |    ('0x' || substr(md5(cast(user_id as varchar)), 1, 12))::bigint AS uh
         |  FROM events),
         |sp AS (
         |  SELECT day, event_type, count(*) AS n,
         |    sum(cast(value as decimal(18,2))) AS sum_dec,
         |    min(value) AS min_v, max(value) AS max_v
         |  FROM ev GROUP BY 1, 2),
         |rp AS (
         |  SELECT day, event_type, uh % $Shards AS shard, min(uh) AS minh
         |  FROM ev GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT event_type, cast(count(*) as bigint) AS n_days,
         |    cast(sum(n) as bigint) AS n_events,
         |    cast(sum(sum_dec) as double) AS sum_value,
         |    min(min_v) AS min_value, max(max_v) AS max_value
         |  FROM sp GROUP BY 1),
         |rm AS (
         |  SELECT event_type, shard, min(minh) AS minh FROM rp GROUP BY 1, 2),
         |us AS (
         |  SELECT event_type, count(*) AS n_shards, list_sort(list(minh)) AS ms
         |  FROM rm GROUP BY 1)
         |SELECT sc.event_type, n_days, n_events, sum_value, min_value, max_value,
         |  (CASE WHEN n_shards >= $K AND ms[$K] > 0
         |        THEN ${(K - 1).toLong * SketchQueries.Hash48Space} // ms[$K]
         |        ELSE cast(n_shards as bigint) END) AS est_users
         |FROM sc JOIN us ON sc.event_type = us.event_type""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(partialMerge)
}
