package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators an analytics engine needs that Spark has no
  * built-in operator for: the as-of join (each fact row matched to the
  * latest earlier row of another stream) and the bounded interval join
  * (all pairs within a time band). Both are implemented as SHUFFLE-SAFE
  * compositions — no theta-join, no BroadcastNestedLoop, no per-key
  * collect — so the plan that runs here is the plan you'd run at 100 TB.
  *
  * As-of: the classic union-tag construction. Tag both sides, union,
  * ONE window over (key, time) carrying the last left-side value
  * forward with `last(..., ignoreNulls)` over an unbounded-preceding
  * frame, then keep the right-side rows. One shuffle on the key, one
  * per-partition sort, zero joins — at scale this beats a range join
  * because the window never materializes candidate pairs. Equivalent
  * semantics to DuckDB's ASOF JOIN (backward, inclusive) with a total
  * (ts, event_id) order making ties deterministic.
  *
  * Interval: band the time axis at the window width W. A probe row at
  * time t can only match build rows in bucket floor(t/W) or the one
  * before, so exploding the probe side to those two buckets turns the
  * inequality predicate into an EQUI-join on (key, bucket) + a residual
  * range filter. Each build row lives in exactly one bucket, so no
  * dedup pass is needed. The shuffle keys on (user, bucket) — bounded
  * fanout 2×, sort-merge-joinable, AQE-skew-splittable; a naive
  * `a.join(b, a("ts") between ...)` would plan BroadcastNestedLoop and
  * die at scale.
  */
object JoinQueries {

  private val SessionWindowUs = 1800000000L // 30 min in microseconds

  /** Events with an integer microsecond epoch + deterministic order key. */
  def evts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("us", unix_micros(col("ts")))

  /** Day bucket of the microsecond timestamp — the salt bounding any
    * per-user window task at one user-day (the TransitionQueries r10
    * de-skew, applied here too).
    */
  private val SegUs = 86400000000L

  /** As-of core over an events frame carrying (event_id, ts, user_id,
    * event_type, us). Union-tag: clicks carry their payload, purchases
    * carry null; an ordered window drags the latest click forward. The
    * current row is inside the frame but never matches itself (a
    * purchase's click-payload is null), giving backward-inclusive
    * as-of semantics under the total (ts, event_id) order.
    *
    * De-skew (r10): the carry window partitions on (user, DAY), so a
    * bot's multi-year history never sorts on one task. A purchase's
    * match is either same-day (the within-day window, order restricted
    * to one user-day) or the latest click of an EARLIER day — carried
    * in from a per-(user, day) last-click summary via a second window
    * over the per-user day summaries (≤ days-per-user rows, thousands
    * of times smaller than events). Within-day beats carry-in by
    * construction (it is later in the total order).
    */
  def asofOf(e: DataFrame): DataFrame = {
    val ec = e
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("seg", expr(s"us div ${SegUs}L"))
    val clickId = when(col("event_type") === "click", col("event_id"))
    val clickUs = when(col("event_type") === "click", col("us"))
    val wd = Window
      .partitionBy("user_id", "seg")
      .orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDay = ec
      .withColumn("cw_id", last(clickId, ignoreNulls = true).over(wd))
      .withColumn("cw_us", last(clickUs, ignoreNulls = true).over(wd))
    // Latest click struct of each user-day (max of a null-when-not-click
    // struct — map-side combinable, no sort), then the latest click of
    // any PRIOR day per (user, day) via the small summary window.
    val daySummaries = ec
      .groupBy("user_id", "seg")
      .agg(
        max(when(col("event_type") === "click", struct(col("us"), col("event_id"))))
          .as("dlc")
      )
    val ws = Window
      .partitionBy("user_id")
      .orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = daySummaries
      .withColumn("carry", last(col("dlc"), ignoreNulls = true).over(ws))
      .select(col("user_id"), col("seg"), col("carry"))
    withDay
      .join(carry, Seq("user_id", "seg"))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        coalesce(col("cw_id"), col("carry.event_id")).as("click_event_id"),
        (col("us") - coalesce(col("cw_us"), col("carry.us"))).as("gap_us")
      )
  }

  /** Interval core: every (purchase, click) pair of the same user with
    * the click in the half-open 30-minute band before the purchase.
    */
  def intervalOf(e: DataFrame): DataFrame = {
    val clicks = e
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_event_id"),
        col("us").as("click_us"),
        expr(s"us div ${SessionWindowUs}L").as("bucket")
      )
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_event_id"),
        col("us").as("purchase_us"),
        explode(
          array(
            expr(s"us div ${SessionWindowUs}L") - 1,
            expr(s"us div ${SessionWindowUs}L")
          )
        ).as("bucket")
      )
    purchases
      .join(clicks, Seq("user_id", "bucket"))
      .filter(
        col("click_us") >= col("purchase_us") - SessionWindowUs &&
          col("click_us") < col("purchase_us")
      )
      .select(
        col("user_id"),
        col("purchase_event_id"),
        col("click_event_id"),
        (col("purchase_us") - col("click_us")).as("gap_us")
      )
  }

  private val asof = Q(
    "events_asof_join",
    (s, d) => asofOf(evts(s, d)),
    Some(
      """WITH cp AS (
        |  SELECT event_id, user_id, ts, epoch_us(ts) AS us, event_type,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER w AS click_event_id,
        |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER w AS click_us
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase')
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  click_event_id, us - click_us AS gap_us
        |FROM cp WHERE event_type = 'purchase'""".stripMargin
    ),
    bench = false
  )

  /** The [[graft.streaming.AsofStream]] batch-boundary contract as a
    * hash-certified row: split the stream at the midpoint of its time
    * axis (the integer midpoint rides the computed-key broadcast — no
    * driver scalar), run the as-of core on batch 1, and on batch 2 run
    * it with batch 1's carried state PREPENDED — the per-user latest
    * click of batch 1 re-enters as a plain click row (original id/us),
    * exactly the flatMapGroupsWithState carry. The union equals the
    * one-shot join: a batch-2 purchase's latest prior click is either
    * in batch 2 or is batch 1's last click. Same oracle as
    * `events_asof_join`.
    */
  private val asofReplay = Q(
    "stream_asof_replay",
    (s, d) => {
      val e = evts(s, d).filter(col("event_type").isin("click", "purchase"))
      val mid = e.agg((min(col("us")) + max(col("us"))).as("mm"))
      val withMid = e
        .withColumn("j", (col("us") - col("us") + 1).cast("int"))
        .join(
          broadcast(
            mid.select((col("mm") - col("mm") + 1).cast("int").as("j"), expr("mm div 2").as("mid"))
          ),
          Seq("j")
        )
      val cols = Seq("event_id", "ts", "user_id", "event_type", "us")
      val b1 = withMid.filter(col("us") <= col("mid")).select(cols.map(col): _*)
      val b2 = withMid.filter(col("us") > col("mid")).select(cols.map(col): _*)
      // Carried state: batch 1's latest click per user, re-entering
      // batch 2 as an ordinary click row (struct max = total order).
      val carried = b1
        .filter(col("event_type") === "click")
        .groupBy("user_id")
        .agg(max(struct(col("us"), col("event_id"), col("ts"))).as("l"))
        .select(
          col("l.event_id").as("event_id"),
          col("l.ts").as("ts"),
          col("user_id"),
          lit("click").as("event_type"),
          col("l.us").as("us")
        )
      asofOf(b1).unionByName(asofOf(b2.unionByName(carried.select(b2.columns.map(col): _*))))
    },
    asof.oracle
  )

  private val interval = Q(
    "events_interval_join",
    (s, d) => intervalOf(evts(s, d)),
    Some(
      s"""SELECT p.user_id, p.event_id AS purchase_event_id,
         |  c.event_id AS click_event_id,
         |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         |FROM events p
         |JOIN events c ON c.user_id = p.user_id
         |  AND c.event_type = 'click' AND p.event_type = 'purchase'
         |  AND epoch_us(c.ts) >= epoch_us(p.ts) - $SessionWindowUs
         |  AND epoch_us(c.ts) < epoch_us(p.ts)""".stripMargin
    ),
    bench = false
  )

  private val intervalReplay = Q(
    // The stream-stream interval join's batch-equivalence certificate
    // (graft.streaming.EventStreams.intervalJoinStream): split BOTH
    // sides into two micro-batches and union the join over all four
    // batch pairs — joins are bilinear over union, and the 2×2 pair
    // cover is exactly what the streaming join's accumulated state
    // achieves (each arriving purchase joins clicks from every earlier
    // AND later batch the watermark admits). Each (click, purchase)
    // pair lands in exactly one (i, j) combo, so the union equals the
    // one-shot join — certified by the identical oracle.
    "stream_interval_replay",
    (s, d) => {
      val e = evts(s, d)
      val parts = for (i <- 0 to 1; j <- 0 to 1) yield intervalOf(
        e.filter(
          (col("event_type") === "click" && pmod(col("event_id"), lit(2)) === i) ||
            (col("event_type") === "purchase" && pmod(col("event_id"), lit(2)) === j)
        )
      )
      parts.reduce(_ unionByName _)
    },
    Some(
      s"""SELECT p.user_id, p.event_id AS purchase_event_id,
         |  c.event_id AS click_event_id,
         |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         |FROM events p
         |JOIN events c ON c.user_id = p.user_id
         |  AND c.event_type = 'click' AND p.event_type = 'purchase'
         |  AND epoch_us(c.ts) >= epoch_us(p.ts) - $SessionWindowUs
         |  AND epoch_us(c.ts) < epoch_us(p.ts)""".stripMargin
    ),
    bench = false
  )

  // -------------------------------------------------------------------
  // Property-corpus certification rows (round 9): JoinPropertySpec runs
  // 25 randomized corpora against in-process brute force; these rows
  // promote ONE seed of that family to a driver-hash-certified oracle
  // query, so the banding/window constructions are certified end to end
  // by an INDEPENDENT engine too (the spec's brute force shares the JVM;
  // DuckDB shares nothing). The corpus is generated by a fixed-constant
  // splitmix-style LCG — same distribution as the spec's Gen (few users,
  // timestamps clustered at 30-min bucket boundaries ± jitter, so
  // cross-bucket and tie cases occur constantly) — and embedded
  // VERBATIM in the oracle as a VALUES list built from the same Scala
  // function, so the two sides cannot drift.
  // -------------------------------------------------------------------

  /** Deterministic property corpus: n events of (event_id, user_id, us,
    * event_type). Knuth MMIX LCG constants; upper 31 bits used.
    */
  private[graft] def propertyCorpus(seed: Long, n: Int): Seq[(Long, Long, Long, String)] = {
    var x = seed
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      x >>> 33
    }
    val types = Vector("click", "purchase", "view")
    (1 to n).map { i =>
      val user = 1L + next() % 4
      val bucket = next() % 4
      val jitter = next() % 7 - 3
      val typ = types((next() % 3).toInt)
      (i.toLong, user, math.max(bucket * SessionWindowUs + jitter * 600000000L, 0L), typ)
    }
  }

  private def propertyValuesSql(seed: Long, n: Int): String =
    propertyCorpus(seed, n)
      .map { case (id, u, us, t) => s"($id, $u, $us, '$t')" }
      .mkString(", ")

  private def propertyDf(s: SparkSession, seed: Long, n: Int): DataFrame = {
    import s.implicits._
    propertyCorpus(seed, n).toDF("event_id", "user_id", "us", "event_type")
  }

  private val PropSeed = 1L
  private val PropN = 40

  private val intervalProperty = Q(
    "events_join_property",
    (s, _) => intervalOf(propertyDf(s, PropSeed, PropN)),
    Some(
      s"""WITH e(event_id, user_id, us, event_type) AS (
         |  VALUES ${propertyValuesSql(PropSeed, PropN)})
         |SELECT cast(p.user_id AS bigint) AS user_id,
         |  cast(p.event_id AS bigint) AS purchase_event_id,
         |  cast(c.event_id AS bigint) AS click_event_id,
         |  cast(p.us - c.us AS bigint) AS gap_us
         |FROM e p JOIN e c ON c.user_id = p.user_id
         |  AND p.event_type = 'purchase' AND c.event_type = 'click'
         |  AND c.us >= p.us - $SessionWindowUs AND c.us < p.us""".stripMargin
    ),
    bench = false
  )

  private val asofProperty = Q(
    "events_join_property_asof",
    (s, _) =>
      asofOf(propertyDf(s, PropSeed, PropN).withColumn("ts", timestamp_micros(col("us")))),
    Some(
      // Brute-force latest-prior under the total (us, event_id) order —
      // deliberately NOT the union-tag window construction the operator
      // uses, so the oracle certifies semantics, not implementation.
      s"""WITH e(event_id, user_id, us, event_type) AS (
         |  VALUES ${propertyValuesSql(PropSeed, PropN)}),
         |p AS (SELECT * FROM e WHERE event_type = 'purchase'),
         |c AS (SELECT * FROM e WHERE event_type = 'click'),
         |best AS (
         |  -- (us, id) totally ordered via us*64 + id: us < 2^34 and
         |  -- id <= 40 < 2^6 in this corpus, so the packing is exact.
         |  SELECT p.event_id, max_by(c.event_id, c.us * 64 + c.event_id) AS click_event_id,
         |    max_by(c.us, c.us * 64 + c.event_id) AS click_us
         |  FROM p JOIN c ON c.user_id = p.user_id
         |    AND (c.us < p.us OR (c.us = p.us AND c.event_id < p.event_id))
         |  GROUP BY 1)
         |SELECT cast(p.event_id AS bigint) AS event_id,
         |  cast(p.user_id AS bigint) AS user_id,
         |  strftime(make_timestamp(p.us), '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         |  cast(b.click_event_id AS bigint) AS click_event_id,
         |  cast(p.us - b.click_us AS bigint) AS gap_us
         |FROM p LEFT JOIN best b ON b.event_id = p.event_id""".stripMargin
    ),
    bench = false
  )

  /** Last-touch channel attribution: every purchase's value is credited
    * to the event TYPE of the user's latest prior non-purchase event
    * ('direct' when the purchase opens the history) — the classic
    * marketing-attribution fold of the as-of join, aggregated to one
    * row per channel with value shares. Prior purchases never reset the
    * carry (IGNORE NULLS skips them), so a view → purchase → purchase
    * run credits BOTH purchases to the view.
    *
    * Same de-skewed shape as [[asofOf]]: the carry window partitions on
    * (user, DAY); earlier-day touches arrive via the bounded per-user
    * day-summary window. Purchase values are quantized to integer cents
    * per row BEFORE the channel sums (long sums are partition-order-
    * independent; double sums are not).
    */
  def attributionOf(e: DataFrame): DataFrame =
    attributionRollup(creditedOf(e))

  /** Per-purchase credited rows (channel, value_c) — the pre-aggregate
    * form the streaming replay unions across micro-batches.
    */
  private[graft] def creditedOf(e: DataFrame): DataFrame = {
    val ec = e.withColumn("seg", expr(s"us div ${SegUs}L"))
    val touch = when(col("event_type") =!= "purchase", struct(col("us"), col("event_id"), col("event_type")))
    val wd = Window
      .partitionBy("user_id", "seg")
      .orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withDay = ec.withColumn("tw", last(touch, ignoreNulls = true).over(wd))
    val daySummaries = ec
      .groupBy("user_id", "seg")
      .agg(max(touch).as("dlt"))
    val ws = Window
      .partitionBy("user_id")
      .orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = daySummaries
      .withColumn("carry", last(col("dlt"), ignoreNulls = true).over(ws))
      .select(col("user_id"), col("seg"), col("carry"))
    withDay
      .join(carry, Seq("user_id", "seg"))
      .filter(col("event_type") === "purchase")
      .select(
        coalesce(col("tw.event_type"), col("carry.event_type"), lit("direct")).as("channel"),
        round(col("value") * 100).cast("long").as("value_c")
      )
  }

  private def attributionRollup(creditedRows: DataFrame): DataFrame = {
    val credited = creditedRows
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"), sum("value_c").as("value_c"))
    val tot = credited.agg(sum("value_c").as("tot"))
    credited
      .withColumn("j", (col("value_c") - col("value_c") + 1).cast("int"))
      .join(
        broadcast(tot.select((col("tot") - col("tot") + 1).cast("int").as("j"), col("tot"))),
        Seq("j")
      )
      .select(
        col("channel"),
        col("n_purchases"),
        col("value_c"),
        when(col("tot") > 0, expr("(value_c * 10000) div tot")).as("share_pm")
      )
  }

  private val attributionQ = Q(
    "events_attribution",
    (s, d) => attributionOf(evts(s, d)),
    Some(
      """WITH seq AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
        |  FROM events),
        |p AS (
        |  SELECT coalesce(ch, 'direct') AS channel, count(*) AS n_purchases,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS value_c
        |  FROM seq WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT sum(value_c) AS tot FROM p)
        |SELECT channel, CAST(n_purchases AS BIGINT) AS n_purchases,
        |  CAST(value_c AS BIGINT) AS value_c,
        |  CAST(CASE WHEN tot > 0 THEN (value_c * 10000) // tot END AS BIGINT) AS share_pm
        |FROM p, t""".stripMargin
    )
  )

  /** The attribution pipeline's batch-boundary contract as a
    * hash-certified row (the [[asofReplay]] pattern applied to the
    * aggregate): split the stream at the integer time midpoint, credit
    * batch 1's purchases one-shot, credit batch 2's with batch 1's
    * per-user LATEST TOUCH prepended as an ordinary touch row (the
    * carried flatMapGroupsWithState state — touches only, so the
    * prepended rows add no credited purchases of their own), and roll
    * up the UNION of credited rows. A batch-2 purchase's latest prior
    * touch is either in batch 2 or is batch 1's last touch, so the
    * union equals the one-shot credit assignment — same oracle as
    * `events_attribution`.
    */
  private val attributionReplayQ = Q(
    "stream_attribution_replay",
    (s, d) => {
      val e = evts(s, d)
      val mid = e.agg((min(col("us")) + max(col("us"))).as("mm"))
      val withMid = e
        .withColumn("j", (col("us") - col("us") + 1).cast("int"))
        .join(
          broadcast(
            mid.select((col("mm") - col("mm") + 1).cast("int").as("j"), expr("mm div 2").as("mid"))
          ),
          Seq("j")
        )
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "us")
      val b1 = withMid.filter(col("us") <= col("mid")).select(cols.map(col): _*)
      val b2 = withMid.filter(col("us") > col("mid")).select(cols.map(col): _*)
      val carried = b1
        .filter(col("event_type") =!= "purchase")
        .groupBy("user_id")
        .agg(max(struct(col("us"), col("event_id"), col("event_type"), col("ts"), col("value"))).as("l"))
        .select(
          col("l.event_id").as("event_id"),
          col("l.ts").as("ts"),
          col("user_id"),
          col("l.event_type").as("event_type"),
          col("l.value").as("value"),
          col("l.us").as("us")
        )
      attributionRollup(
        creditedOf(b1).unionByName(
          creditedOf(b2.unionByName(carried.select(b2.columns.map(col): _*)))
        )
      )
    },
    attributionQ.oracle
  )

  val all: Seq[Q] =
    Seq(asof, asofReplay, interval, intervalReplay, intervalProperty, asofProperty, attributionQ, attributionReplayQ)
}
