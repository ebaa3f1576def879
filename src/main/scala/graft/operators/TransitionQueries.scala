package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order event-type transition matrix (the empirical Markov
  * chain over per-user event sequences) — the behavioral-analytics
  * primitive under funnel mining, next-action prediction, and
  * bot-vs-human separation (bots have degenerate transition rows).
  * Complements the registry's ordered-funnel and sessionization
  * operators: the funnel checks ONE prescribed path; the transition
  * matrix reports every observed adjacency.
  *
  * Scale shape (r10 de-skew): the lag window partitions on (user_id,
  * DAY), never on the bare user — a bot with a year of history at
  * 100× scale sorts one day per task, not its whole timeline. The
  * within-day lag misses exactly the day-boundary transitions; those
  * are stitched back the way [[graft.streaming.TransitionStream]]
  * stitches micro-batch boundaries: per (user, day) keep the first/
  * last event (a map-side-combinable min/max of ONE struct — no sort),
  * then one lag window over the per-user DAY SUMMARIES (bounded by
  * days-per-user, thousands of times smaller than events-per-user)
  * yields last(prev day) → first(next day). The matrix itself is a
  * ≤ |types|² aggregate with map-side combine, and row-normalization
  * joins the ≤ |types| row totals back broadcast-side.
  */
object TransitionQueries {

  /** Day bucket of the microsecond timestamp — the salt that bounds a
    * window task at one user-day.
    */
  private val SegUs = 86400000000L

  /** Transition counts + row-normalized probabilities over an events
    * frame carrying (event_id, user_id, us, event_type).
    */
  def transitionsOf(e: DataFrame): DataFrame = {
    val steps = stepsOf(e)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("from_type").agg(sum("n").as("nt"))
    steps
      .join(broadcast(totals), "from_type")
      .select(
        col("from_type"),
        col("to_type"),
        col("n"),
        expr("(n * 10000) div nt").as("p_pm")
      )
  }

  /** Every adjacent (from_type, to_type) pair of the per-user event
    * sequences, extracted with the de-skewed day-salted shape (one row
    * per transition; the matrix is an aggregate over these).
    */
  private[graft] def stepsOf(e: DataFrame): DataFrame = {
    val seg = e.withColumn("seg", expr(s"us div ${SegUs}L"))
    // Within-day adjacencies: the (us, event_id) total order restricted
    // to one user-day. Ordering by seg then (us, event_id) equals the
    // global per-user order because seg is monotone in us.
    val w = Window.partitionBy("user_id", "seg").orderBy("us", "event_id")
    val within = seg
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("event_type").as("to_type"))
    // Day-boundary adjacencies: last event of a user's day → first
    // event of the user's NEXT POPULATED day. Struct min/max carry the
    // total order; the summary window sees ≤ days-per-user rows.
    val daySummaries = seg
      .groupBy("user_id", "seg")
      .agg(
        min(struct(col("us"), col("event_id"), col("event_type"))).as("f"),
        max(struct(col("us"), col("event_id"), col("event_type"))).as("l")
      )
    val ws = Window.partitionBy("user_id").orderBy("seg")
    daySummaries
      .withColumn("prev_l", lag(col("l"), 1).over(ws))
      .filter(col("prev_l").isNotNull)
      .select(col("prev_l.event_type").as("from_type"), col("f.event_type").as("to_type"))
      .unionByName(within)
  }

  private val transitionsQ = Q(
    "events_transitions",
    (s, d) => transitionsOf(JoinQueries.evts(s, d)),
    Some(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS from_type
        |  FROM events),
        |steps AS (
        |  SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n) AS nt FROM steps GROUP BY 1)
        |SELECT s.from_type, s.to_type, CAST(s.n AS BIGINT) AS n,
        |  CAST((s.n * 10000) // t.nt AS BIGINT) AS p_pm
        |FROM steps s JOIN tot t ON t.from_type = s.from_type""".stripMargin
    )
  )

  /** The TransitionStream batch-boundary contract as a hash-certified
    * row: split the stream at the midpoint of its time axis (the
    * integer midpoint rides the computed-key broadcast — no driver
    * scalar), compute each batch's WITHIN-batch transitions by the
    * ordinary lag window, add the BOUNDARY transition per user (batch
    * 1's last event → batch 2's first event — exactly the carried
    * flatMapGroupsWithState state), and aggregate. Equal to the
    * one-shot matrix — the same oracle as `events_transitions`.
    */
  private val transitionsReplayQ = Q(
    "stream_transitions_replay",
    (s, d) => {
      val e = JoinQueries.evts(s, d)
      val mid = e.agg((min(col("us")) + max(col("us"))).as("mm"))
      val withMid = e
        .withColumn("j", (col("us") - col("us") + 1).cast("int"))
        .join(
          broadcast(mid.select((col("mm") - col("mm") + 1).cast("int").as("j"), expr("mm div 2").as("mid"))),
          Seq("j")
        )
      val b1 = withMid.filter(col("us") <= col("mid"))
      val b2 = withMid.filter(col("us") > col("mid"))
      // Within-batch steps ride the same de-skewed day-salted extractor
      // as the one-shot matrix.
      def within(b: DataFrame): DataFrame =
        stepsOf(b.select("event_id", "user_id", "us", "event_type"))
      // Carried state: batch 1's last event per user; boundary step to
      // batch 2's first event per user. Struct min/max give the total
      // (us, event_id) order.
      val last1 = b1
        .groupBy("user_id")
        .agg(max(struct(col("us"), col("event_id"), col("event_type"))).as("l"))
        .select(col("user_id"), col("l.event_type").as("from_type"))
      val first2 = b2
        .groupBy("user_id")
        .agg(min(struct(col("us"), col("event_id"), col("event_type"))).as("f"))
        .select(col("user_id"), col("f.event_type").as("to_type"))
      val boundary = last1.join(first2, "user_id").select("from_type", "to_type")
      val steps = within(b1)
        .unionByName(boundary)
        .unionByName(within(b2))
        .groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
      val totals = steps.groupBy("from_type").agg(sum("n").as("nt"))
      steps
        .join(broadcast(totals), "from_type")
        .select(
          col("from_type"),
          col("to_type"),
          col("n"),
          expr("(n * 10000) div nt").as("p_pm")
        )
    },
    transitionsQ.oracle
  )

  val all: Seq[Q] = Seq(transitionsQ, transitionsReplayQ)
}
