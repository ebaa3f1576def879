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

  private val StatIters = 8

  /** Stationary distribution of the empirical event-type Markov chain
    * by fixed-iteration power method (the PageRank of the transition
    * matrix — where does a user's behavior settle if the observed
    * dynamics run forever). The long-run complement of the one-step
    * matrix: a state can be a rare DESTINATION yet absorb most long-run
    * mass if its self-loop dominates.
    *
    * Semantics: the chain is restricted to states with outgoing
    * transitions (from-types), transitions leading outside that set are
    * dropped and rows renormalize over what remains — a closed,
    * well-defined chain on both engines. π₀ is uniform mass 1e6 per
    * state; each step is π'(j) = Σ_i (π(i)·n(i,j)) div nt(i) — ALL
    * integer arithmetic ([[GraphQueries]]'s PageRank discipline: long
    * sums are partition-order-independent, floats are not), K = 8
    * fixed rounds unrolled identically in the oracle.
    *
    * Scale shape: the state space is |event types| — tiny by
    * construction — so each round is one broadcast-sized join + one
    * bounded aggregate; the only corpus-scale work is the one-pass
    * step extraction (day-salted, shared with `events_transitions`).
    */
  def stationaryOf(e: DataFrame, iters: Int = StatIters): DataFrame = {
    val steps = stepsOf(e).groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val states = steps.select(col("from_type").as("state")).distinct()
    val restricted = steps
      .join(states.select(col("state").as("to_type")), Seq("to_type"), "left_semi")
    val nt = restricted.groupBy("from_type").agg(sum("n").as("nt"))
    val edges = restricted
      .join(nt, Seq("from_type"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val r0 = states.withColumn("pi_mu", lit(1000000L))
    val fin = (1 to iters).foldLeft(r0) { (r, _) =>
      edges
        .join(broadcast(r.withColumnRenamed("state", "from_type")), Seq("from_type"))
        .select(col("to_type").as("state"), expr("(pi_mu * n) div nt").as("c"))
        .groupBy("state")
        .agg(sum("c").as("pi_mu"))
    }
    val withZeros = states
      .join(fin, Seq("state"), "left")
      .withColumn("pi_mu", coalesce(col("pi_mu"), lit(0L)))
    val tot = withZeros.agg(sum("pi_mu").as("tot"))
    withZeros
      .withColumn("j", (col("pi_mu") - col("pi_mu") + 1).cast("int"))
      .join(
        broadcast(tot.select((col("tot") - col("tot") + 1).cast("int").as("j"), col("tot"))),
        Seq("j")
      )
      .select(
        col("state"),
        col("pi_mu"),
        when(col("tot") > 0, expr("(pi_mu * 10000) div tot")).as("pi_pm")
      )
  }

  private val stationaryQ = Q(
    "events_stationary",
    (s, d) => stationaryOf(JoinQueries.evts(s, d)),
    Some {
      def round(k: Int): String =
        s"""r$k AS (
           |  SELECT e.to_type AS state, sum((r.pi_mu * e.n) // e.nt) AS pi_mu
           |  FROM e JOIN r${k - 1} r ON r.state = e.from_type
           |  GROUP BY 1)""".stripMargin
      s"""WITH seq AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS from_type
         |  FROM events),
         |steps AS (
         |  SELECT from_type, event_type AS to_type, count(*) AS n
         |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
         |st AS (SELECT DISTINCT from_type AS state FROM steps),
         |re AS (SELECT * FROM steps WHERE to_type IN (SELECT state FROM st)),
         |nt AS (SELECT from_type, sum(n) AS nt FROM re GROUP BY 1),
         |e AS (SELECT re.from_type, re.to_type, re.n, nt.nt FROM re JOIN nt USING (from_type)),
         |r0 AS (SELECT state, CAST(1000000 AS BIGINT) AS pi_mu FROM st),
         |${(1 to StatIters).map(round).mkString(",\n")},
         |fin AS (
         |  SELECT st.state, coalesce(r$StatIters.pi_mu, 0) AS pi_mu
         |  FROM st LEFT JOIN r$StatIters ON r$StatIters.state = st.state),
         |tot AS (SELECT sum(pi_mu) AS tot FROM fin)
         |SELECT state, CAST(pi_mu AS BIGINT) AS pi_mu,
         |  CAST(CASE WHEN tot > 0 THEN (pi_mu * 10000) // tot END AS BIGINT) AS pi_pm
         |FROM fin, tot""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(transitionsQ, transitionsReplayQ, stationaryQ)
}
