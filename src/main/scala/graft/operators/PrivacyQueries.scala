package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Release-safety auditing over the event stream: k-anonymity census
  * (Sweeney 2002) of the quasi-identifier cells an analyst could join
  * against side information. A cell — here (event type, day,
  * coarse value band) — occupied by fewer than K distinct users
  * re-identifies them; the audit reports, per event type, how much of
  * the table sits in such cells. The governance gate a pipeline runs
  * BEFORE exporting "anonymized" analytics extracts: aggregate counts
  * look safe until one Tuesday's refund band contains exactly one
  * user. Complements `docs_pii_scrub` (content-level PII) with the
  * structural re-identification axis.
  *
  * Scale shape: ONE bounded-key aggregate (types × days × bands) with
  * a two-level distinct — (cell, user) dedup then cell census — both
  * map-side combinable; the per-type rollup is a second bounded
  * aggregate. No windows, no corpus-keyed joins; exact integers
  * throughout.
  */
object PrivacyQueries {

  private val K = 5
  private val BandWidth = 50.0

  /** Per-event-type k-anonymity rollup of the (type, day, value-band)
    * quasi-identifier cells.
    */
  def kAnonymityOf(events: DataFrame, k: Int = K): DataFrame = {
    val cells = events
      .select(
        col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        floor(col("value") / BandWidth).cast("long").as("band"),
        col("user_id")
      )
      .groupBy("event_type", "day", "band")
      .agg(count_distinct(col("user_id")).as("u"), count(lit(1)).as("n"))
    val tot = cells
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_cells"),
        sum("n").as("n_events"),
        sum(when(col("u") < k, 1L).otherwise(0L)).as("risky_cells"),
        sum(when(col("u") < k, col("n")).otherwise(0L)).as("risky_events"),
        min("u").as("min_cell_users")
      )
    tot.select(
      col("event_type"),
      col("n_cells"),
      col("n_events"),
      col("risky_cells"),
      col("risky_events"),
      expr("(risky_events * 10000) div n_events").as("risky_share_pm"),
      col("min_cell_users")
    )
  }

  private val kAnonQ = Q(
    "events_k_anonymity",
    (s, d) => kAnonymityOf(Tables.events(s, d)),
    Some(
      s"""WITH cells AS (
         |  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         |    CAST(floor(value / $BandWidth) AS BIGINT) AS band,
         |    count(DISTINCT user_id) AS u, count(*) AS n
         |  FROM events GROUP BY 1, 2, 3)
         |SELECT event_type,
         |  CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(n) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN u < $K THEN 1 ELSE 0 END) AS BIGINT) AS risky_cells,
         |  CAST(sum(CASE WHEN u < $K THEN n ELSE 0 END) AS BIGINT) AS risky_events,
         |  CAST((sum(CASE WHEN u < $K THEN n ELSE 0 END) * 10000) // sum(n) AS BIGINT) AS risky_share_pm,
         |  CAST(min(u) AS BIGINT) AS min_cell_users
         |FROM cells GROUP BY 1""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(kAnonQ)
}
