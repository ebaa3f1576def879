package graft.operators

import graft.{Lineage, Q}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-health metrics over the verified near-duplicate graph,
  * completing the registry's graph-analytics family (PageRank,
  * star-contraction components, triangle counting):
  *
  *  - Global clustering coefficient / transitivity (Watts & Strogatz
  *    1998; Newman 2003 §III): 3·triangles / wedges — ONE number that
  *    separates template families (clique-dense, C → 1) from revision
  *    chains (C → 0) corpus-wide, where the per-vertex triangle counts
  *    need interpretation.
  *  - k-core decomposition (Seidman 1983): iteratively peel vertices
  *    of degree < k; what survives is the graph's dense backbone — for
  *    dedup, the boilerplate/template core that component counts hide
  *    (a star of one million docs has a huge component but an EMPTY
  *    2-core).
  *
  * Scale shapes: transitivity reuses [[TriangleQueries.triangleCounts]]
  * (degree-oriented wedges, Σ outdeg² ≤ m^{3/2}) plus one bounded
  * degree aggregate — wedge counts come from degrees, never from
  * materializing wedges. Peeling runs a FIXED round count (both
  * engines run the same R rounds, so outputs agree even on a
  * pathological chain that hasn't converged): each round is one
  * semi-join + one degree aggregate — the iterative-graph shape of
  * [[ConnectedComponents]], with per-round lazy checkpoints keeping
  * the plan flat.
  */
object GraphMetrics {

  private val CoreK = 2
  private val PeelRounds = 12

  /** Canonical undirected edge set (u < v, distinct). */
  private def canonical(edges0: DataFrame): DataFrame =
    edges0
      .select(
        least(col("doc_a"), col("doc_b")).as("u"),
        greatest(col("doc_a"), col("doc_b")).as("v")
      )
      .filter(col("u") =!= col("v"))
      .distinct()

  /** One-row transitivity summary of an undirected edge list. */
  def transitivityOf(edges0: DataFrame): DataFrame = {
    // localCheckpoint, not persist: the canonical edge set is read by
    // three branches of ONE returned plan, so a synchronous unpersist
    // is impossible — checkpoint blocks are released by the context
    // cleaner once the frame is unreferenced, keeping a full registry
    // sweep's footprint bounded (persist entries would pin blocks in
    // the CacheManager until an explicit clearCache).
    val edges = canonical(edges0).localCheckpoint()
    val deg = edges
      .select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("dg"))
    val tri = TriangleQueries
      .triangleCounts(edges.select(col("u").as("doc_a"), col("v").as("doc_b")))
      .agg(coalesce(sum("n_tri"), lit(0L)).as("tri3"))
    val dsum = deg.agg(
      count(lit(1)).as("n_vertices"),
      sum(expr("dg * (dg - 1)")).as("wedges2")
    )
    val esum = edges.agg(count(lit(1)).as("n_edges"))
    dsum
      .withColumn("j", (col("n_vertices") - col("n_vertices") + 1).cast("int"))
      .join(
        broadcast(esum.select((col("n_edges") - col("n_edges") + 1).cast("int").as("j"), col("n_edges"))),
        Seq("j")
      )
      .join(
        broadcast(tri.select((col("tri3") - col("tri3") + 1).cast("int").as("j"), col("tri3"))),
        Seq("j")
      )
      .select(
        col("n_vertices"),
        col("n_edges"),
        expr("tri3 div 3").as("n_triangles"),
        expr("wedges2 div 2").as("n_wedges"),
        when(col("wedges2") > 0, expr("(tri3 * 10000) div (wedges2 div 2)")).as("transitivity_pm")
      )
  }

  /** Vertices surviving R peeling rounds at threshold k, with their
    * final within-core degree — plus convergence TELEMETRY: peeling is
    * monotone (degrees only shrink), so round r's degree table equals
    * round r−1's iff their (vertex count, degree sum) pair is equal;
    * `rounds_used` is the first such r (R if none) and `converged`
    * flags whether a fixpoint was reached within the budget. A graph
    * whose peeling cascade outruns R (a long chain) now SAYS so in the
    * output instead of silently reporting a superset core.
    *
    * The per-round summary is one (count, sum) aggregate over the
    * just-checkpointed degree table, itself checkpointed to one row —
    * so the big per-round tables can still be released as soon as the
    * next round materializes past them.
    */
  def kcoreOf(edges0: DataFrame, k: Int = CoreK, rounds: Int = PeelRounds): DataFrame = {
    val edges = canonical(edges0).localCheckpoint()
    def summaryOf(d: DataFrame, r: Int): DataFrame =
      d.agg(count(lit(1)).as("n"), coalesce(sum("dg"), lit(0L)).as("s"))
        .withColumn("r", lit(r))
        .localCheckpoint()
    var deg = edges
      .select(col("u").as("id"))
      .unionByName(edges.select(col("v").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("dg"))
    var summaries = Vector(summaryOf(deg, 0))
    var kept: Option[org.apache.spark.rdd.RDD[_]] = None
    for (r <- 1 to rounds) {
      val alive = deg.filter(col("dg") >= k).select("id")
      val e2 = edges
        .join(alive.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(alive.select(col("id").as("v")), Seq("v"), "left_semi")
      val next = e2
        .select(col("u").as("id"))
        .unionByName(e2.select(col("v").as("id")))
        .groupBy("id")
        .agg(count(lit(1)).as("dg"))
        .localCheckpoint()
      summaries :+= summaryOf(next, r)
      val prev = kept
      kept = Lineage.checkpointRdd(next, "kcore")
      deg = next
      prev.foreach(_.unpersist(false))
    }
    val smu = summaries.reduce(_ unionByName _)
    val nxt = smu.select(col("r").as("r2"), col("n").as("n2"), col("s").as("s2"))
    val tele = smu
      .join(
        nxt,
        col("r2") === col("r") + 1 && col("n2") === col("n") && col("s2") === col("s")
      )
      .agg(min(col("r2")).as("rmin"))
      .select(
        coalesce(col("rmin"), lit(rounds)).cast("long").as("rounds_used"),
        when(col("rmin").isNotNull, lit(1L)).otherwise(lit(0L)).as("converged")
      )
    deg
      .filter(col("dg") >= k)
      .select(col("id").as("doc_id"), col("dg").as("core_deg"))
      .withColumn("j", (col("core_deg") - col("core_deg") + 1).cast("int"))
      .join(
        broadcast(
          tele.withColumn("j", (col("converged") - col("converged") + 1).cast("int"))
        ),
        Seq("j")
      )
      .drop("j")
  }

  /** The peeling oracle: R unrolled (alive, edges, degree) CTE rounds
    * over the shared near-dup graph CTEs.
    */
  private def kcoreOracle: String = {
    def round(r: Int): String =
      // MATERIALIZED is load-bearing: al$r is referenced twice and dg$r
      // feeds the next round — inlined CTEs would re-expand the whole
      // prior chain per reference (2^R blowup).
      s"""al$r AS MATERIALIZED (SELECT id FROM dg${r - 1} WHERE dg >= $CoreK),
         |ed$r AS MATERIALIZED (
         |  SELECT e.u, e.v FROM ce e
         |  SEMI JOIN al$r a1 ON a1.id = e.u
         |  SEMI JOIN al$r a2 ON a2.id = e.v),
         |dg$r AS MATERIALIZED (
         |  SELECT id, count(*) AS dg
         |  FROM (SELECT u AS id FROM ed$r UNION ALL SELECT v FROM ed$r) _d GROUP BY id)""".stripMargin
    def summary(r: Int): String =
      s"sm$r AS (SELECT $r AS r, count(*) AS n, coalesce(sum(dg), 0) AS s FROM dg$r)"
    s"""WITH ${TriangleQueries.neardupGraphCtesSql},
       |ce AS MATERIALIZED (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM vp WHERE u != v),
       |dg0 AS MATERIALIZED (
       |  SELECT id, count(*) AS dg
       |  FROM (SELECT u AS id FROM ce UNION ALL SELECT v FROM ce) _d GROUP BY id),
       |${(1 to PeelRounds).map(round).mkString(",\n")},
       |${(0 to PeelRounds).map(summary).mkString(",\n")},
       |smu AS (${(0 to PeelRounds).map(r => s"SELECT * FROM sm$r").mkString(" UNION ALL ")}),
       |tele AS (
       |  SELECT CAST(coalesce(min(b.r), $PeelRounds) AS BIGINT) AS rounds_used,
       |    CAST(CASE WHEN min(b.r) IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS converged
       |  FROM smu a JOIN smu b ON b.r = a.r + 1 AND a.n = b.n AND a.s = b.s)
       |SELECT id AS doc_id, CAST(dg AS BIGINT) AS core_deg, rounds_used, converged
       |FROM dg$PeelRounds, tele WHERE dg >= $CoreK""".stripMargin
  }

  private val transitivityQ = Q(
    "graph_transitivity",
    (s, d) =>
      transitivityOf(
        LlmQueries8.verifiedNeardupEdges(TriangleQueries.triCorpus(s, d), 0.5)
      ),
    Some {
      s"""WITH ${TriangleQueries.neardupGraphCtesSql},
         |ce AS MATERIALIZED (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM vp WHERE u != v),
         |dg AS (
         |  SELECT id, count(*) AS dg
         |  FROM (SELECT u AS id FROM ce UNION ALL SELECT v FROM ce) _d GROUP BY id),
         |t3 AS (
         |  SELECT CAST(3 * count(*) AS BIGINT) AS tri3 FROM tri),
         |ds AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_vertices,
         |    CAST(sum(dg * (dg - 1)) AS BIGINT) AS wedges2
         |  FROM dg),
         |es AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ce)
         |SELECT n_vertices, n_edges,
         |  tri3 // 3 AS n_triangles,
         |  wedges2 // 2 AS n_wedges,
         |  CASE WHEN wedges2 > 0 THEN (tri3 * 10000) // (wedges2 // 2) END AS transitivity_pm
         |FROM ds, es, t3""".stripMargin
    }
  )

  private val kcoreQ = Q(
    "graph_kcore",
    (s, d) =>
      kcoreOf(LlmQueries8.verifiedNeardupEdges(TriangleQueries.triCorpus(s, d), 0.5)),
    Some(kcoreOracle),
    bench2 = true
  )

  val all: Seq[Q] = Seq(transitivityQ, kcoreQ)
}
