package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Analytics + component-merge query registrations.
  *
  * Money aggregates cast to decimal BEFORE summing: decimal addition is
  * exact and associative, so the result is independent of Spark's partition
  * merge order (double sums are not, and would be nondeterministic under
  * the driver's hash compare as well as across cluster sizes).
  *
  * Output columns are final-cast to DOUBLE (never decimal) and timestamps
  * are formatted as strings: the driver's value hash canonicalizes arrow
  * decimal128/timestamp columns differently on the Spark-parquet and
  * DuckDB-oracle sides, so equal values still hash-mismatch. Double is safe
  * because both engines convert the same exact decimal to the same IEEE754
  * value. (Round-2 lesson: q1_agg/q3_join/merge_components/events_* all
  * failed the driver hash on decimal/timestamp outputs alone.)
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(
    Q(
      "q1_agg",
      (s, d) =>
        Tables
          .lineitem(s, d)
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order")
          ),
      Some(
        """SELECT l_returnflag, l_linestatus,
          |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
          |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
          |  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) AS sum_disc_price,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin
      ),
      bench = true
    ),
    Q(
      "q3_join",
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        // customer is the small side at any scale factor: broadcast it so
        // the orders/lineitem join is the only shuffle.
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)"))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items")
          )
      },
      Some(
        """SELECT o_orderkey, o_orderpriority,
          |  cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(18,4))) as double) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |GROUP BY o_orderkey, o_orderpriority""".stripMargin
      ),
      bench = true
    ),
    Q(
      // Host/component-part merge (reference: Record/AbstractRecord.php:238
      // and the componentParts merge in Solr/SolrUpdater.php): children are
      // folded into their host with deterministic ordering. orders=hosts,
      // lineitem=component parts; one hash shuffle on the host key.
      "merge_components",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.groupBy(col("l_orderkey").as("host_id"))
          .agg(
            count(lit(1)).as("n_components"),
            array_join(
              array_sort(
                collect_list(
                  concat(
                    lpad(col("l_linenumber").cast("string"), 2, "0"),
                    lit(":"),
                    col("l_partkey").cast("string")
                  )
                )
              ),
              ","
            ).as("merged_parts"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty")
          )
      },
      Some(
        """SELECT l_orderkey AS host_id, count(*) AS n_components,
          |  string_agg(lpad(cast(l_linenumber as varchar), 2, '0') || ':' || cast(l_partkey as varchar), ','
          |             ORDER BY lpad(cast(l_linenumber as varchar), 2, '0') || ':' || cast(l_partkey as varchar)) AS merged_parts,
          |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS total_qty
          |FROM lineitem GROUP BY l_orderkey""".stripMargin
      ),
      bench = true
    ),
    Q(
      // Batch twin of the Structured Streaming tumbling-window aggregation
      // in graft.streaming.EventStreams (same expressions run under
      // readStream + watermark there).
      "events_windowed",
      (s, d) =>
        Tables
          .events(s, d)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("event_type")
          )
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")
          ),
      Some(
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
          |  count(*) AS n_events,
          |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
          |FROM events GROUP BY 1, 2""".stripMargin
      )
    ),
    Q(
      // Sessionization: a new session starts after a >30 min gap per user.
      // Batch twin of EventStreams.sessionize (flatMapGroupsWithState).
      //
      // De-skew (r10, the last per-user-unbounded event window): the gap
      // window runs within (user, DAY) — a bot's full history never
      // sorts on one task — and sessions crossing midnight are stitched
      // on the per-user DAY-SUMMARY frame (≤ days-per-user rows): a
      // day's first LOCAL session merges into the previous populated
      // day's last session iff the boundary gap is ≤ 30 min, chains
      // included (a single-session merge day contributes zero new
      // sessions, so a multi-midnight session keeps one global index).
      // The global session_idx is reconstructed EXACTLY as the one-shot
      // cumulative count: idx = (new sessions on prior days) + local
      // index − merge flag; per-session aggregates fold from
      // local-session partials (decimal partials stay exact). Every
      // stage is bounded: event-sized windows carry the day salt,
      // summary windows see days, the final groupBy keys on (user, idx).
      "events_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val segUs = 86400000000L
        val e = Tables
          .events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("seg", expr(s"us div ${segUs}L"))
        val wd = Window.partitionBy("user_id", "seg").orderBy("ts", "event_id")
        val locals = e
          .withColumn("prev_us", lag(col("us"), 1).over(wd))
          .withColumn(
            "is_new",
            when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
              .otherwise(0)
          )
          .withColumn(
            "lsess",
            sum(col("is_new")).over(wd.rowsBetween(Window.unboundedPreceding, 0))
          )
          .groupBy("user_id", "seg", "lsess")
          .agg(
            count(lit(1)).as("n"),
            min(col("ts")).as("min_ts"),
            min(col("us")).as("first_us"),
            max(col("us")).as("last_us"),
            sum(col("value").cast("decimal(18,2)")).as("v")
          )
        // Fused day pass (r11): ONE (user, day) aggregate carries both
        // the boundary fields AND the local-session partials as a
        // bounded array (≤48 sessions/day by the 30-min gap law), so
        // the old dayFlags-join shuffle disappears; after the day
        // window the partials explode back out, and the final
        // (user, session_idx) groupBy is satisfied by the day frame's
        // user partitioning — event-sized data shuffles exactly once.
        val ws = Window.partitionBy("user_id").orderBy("seg")
        val days = locals
          .groupBy("user_id", "seg")
          .agg(
            collect_list(struct(col("lsess"), col("n"), col("min_ts"), col("v"))).as("ls"),
            min(col("first_us")).as("day_first_us"),
            max(col("last_us")).as("day_last_us"),
            max(col("lsess")).as("k")
          )
          .withColumn("prev_last", lag(col("day_last_us"), 1).over(ws))
          .withColumn(
            "mrg",
            when(
              col("prev_last").isNotNull &&
                col("day_first_us") - col("prev_last") <= 1800000000L,
              1L
            ).otherwise(0L)
          )
          .withColumn(
            "off",
            coalesce(
              sum(col("k") - col("mrg")).over(ws.rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)
            )
          )
        days
          .select(col("user_id"), col("off"), col("mrg"), explode(col("ls")).as("sx"))
          .withColumn("session_idx", col("off") + col("sx.lsess") - col("mrg"))
          .groupBy("user_id", "session_idx")
          .agg(
            sum(col("sx.n")).as("n_events"),
            date_format(min(col("sx.min_ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            sum(col("sx.v")).cast("double").as("sum_value")
          )
      },
      Some(
        """WITH g AS (
          |  SELECT user_id, event_id, ts, value,
          |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
          |              OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
          |         THEN 1 ELSE 0 END AS is_new
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |),
          |sess AS (
          |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                              ROWS UNBOUNDED PRECEDING) AS session_idx
          |  FROM g
          |)
          |SELECT user_id, cast(session_idx as bigint) AS session_idx, count(*) AS n_events,
          |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          |  cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
          |FROM sess GROUP BY user_id, session_idx""".stripMargin
      ),
      bench = true
    )
  )

  private def cast_decimal_sum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")
}
