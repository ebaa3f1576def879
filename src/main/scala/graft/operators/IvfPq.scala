package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end IVF-PQ approximate-nearest-neighbor SEARCH — the composed
  * pipeline all the certified index pieces build toward (the standard
  * billion-vector ANN layout: coarse inverted-file routing + product-
  * quantized codes + asymmetric-distance shortlist + exact rerank):
  *
  *  1. coarse assignment: every vector routes to one of `Cells` IVF
  *     cells ([[LlmQueries2.ivfCell]]);
  *  2. nprobe: each query probes its `NProbe` best cells (not just its
  *     own — the standard recall lever);
  *  3. ADC shortlist: candidates in probed cells are scored ONLY from
  *     their 8-nibble PQ codes against the query's precomputed
  *     per-subspace lookup tables (integer micro-units, broadcast —
  *     candidates never ship vectors);
  *  4. exact rerank: the top-`Rerank` shortlist joins back to full
  *     vectors for true cosine, and the final top-`TopK` emerges.
  *
  * Scale shape: the only shuffle of corpus-sized data is the groupBy
  * that sums 8 lookup values per (query, candidate) — over codes 32×
  * smaller than the vectors; the rerank touches `Rerank` rows per query.
  * The trained-centroid variant (KMeans Lloyd loop feeding the same
  * pipeline) is certified by IvfPqSpec with a planted-neighbor recall
  * floor; this registered query uses the deterministic md5 codebooks so
  * the DuckDB oracle can mirror every stage bit for bit.
  */
object IvfPq {

  private val Cells = 8
  private val NProbe = 2
  private val RerankN = 20
  private val TopK = 5

  /** The full search over any (vec_id, embedding) frame with the
    * deterministic centroids; `queryPred` selects the query rows.
    */
  def searchDeterministic(emb: DataFrame, rerankN: Int = RerankN): DataFrame = {
    val assigned = emb
      .select(col("vec_id"), LlmQueries2.ivfCell(col("embedding"), Cells).as("cell"))
    val cscores = transform(
      sequence(lit(0), lit(Cells - 1)),
      c => LlmQueries2.centroidDot(col("embedding"), c)
    )
    val qbase = emb
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), cscores.as("cs"))
      .persist()
    // Top-NProbe cells: argmax, then argmax excluding the first (the
    // md5-derived scores are continuous, so ties are measure-zero).
    val c1 = array_position(col("cs"), array_max(col("cs")))
    val c2 = array_position(
      col("cs"),
      array_max(filter(col("cs"), (_, i) => (i + 1).cast("long") =!= c1))
    )
    val probes = qbase.select(col("query_id"), explode(array(c1, c2)).as("cell"))
    // Per-(query, subspace) ADC lookup tables in integer micro-units.
    val lookup = qbase
      .select(
        col("query_id"),
        explode(sequence(lit(0), lit(LlmQueries2.PqSubspaces - 1))).as("m"),
        col("qv")
      )
      .select(
        col("query_id"),
        col("m").cast("long").as("sub"),
        transform(
          sequence(lit(0), lit(LlmQueries2.PqCodebook - 1)),
          c => round(LlmQueries2.pqSubScore(col("qv"), col("m"), c) * 1e6).cast("long")
        ).as("tvals")
      )
    adcRerank(emb, qbase.select(col("query_id"), col("qv")), lookup, assigned, probes, rerankN)
  }

  /** Stages 3-4 (ADC shortlist + exact rerank), shared by the
    * deterministic registered query and the KMeans-trained spec variant.
    */
  private[operators] def adcRerank(
      emb: DataFrame,
      qvecs: DataFrame,
      lookup: DataFrame,
      assigned: DataFrame,
      probes: DataFrame,
      rerankN: Int = RerankN
  ): DataFrame =
    adcRerankCodes(emb, qvecs, lookup, assigned, probes, LlmQueries2.pqCodesOf(emb), rerankN)

  /** The same stages with an EXPLICIT (vec_id, sub, code) frame — the
    * entry point for trained codebooks, where `code` is the 1-based
    * position in the same per-subspace codeword array the lookup tables
    * were built from.
    */
  private[operators] def adcRerankCodes(
      emb: DataFrame,
      qvecs: DataFrame,
      lookup: DataFrame,
      assigned: DataFrame,
      probes: DataFrame,
      codesOf: DataFrame,
      rerankN: Int = RerankN
  ): DataFrame = {
    val cand = codesOf
      .join(assigned, Seq("vec_id"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val adc = cand
      .join(broadcast(lookup), Seq("query_id", "sub"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        expr("element_at(tvals, cast(code as int))").as("t_micro")
      )
      .groupBy("query_id", "neighbor_id")
      .agg(sum("t_micro").as("adc_micro"))
    val wAdc = Window.partitionBy("query_id").orderBy(col("adc_micro").desc, col("neighbor_id"))
    val shortlist = adc
      .withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= rerankN)
      .select("query_id", "neighbor_id")
    val reranked = shortlist
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")), Seq("neighbor_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(cosine(col("qv"), col("embedding")), 6).as("score")
      )
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    reranked.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= TopK)
  }

  /** Trained-centroid variant: the SAME pipeline with IVF routing from a
    * KMeans-trained (cell, cv) centroid table — assignment via the
    * native argmin kernel, probes = the `NProbe` nearest centroids by
    * squared L2. Spec-certified (IvfPqSpec) with a planted-neighbor
    * recall floor against brute-force cosine.
    */
  def searchTrained(emb: DataFrame, cents: DataFrame): DataFrame = {
    val withCents = emb
      .withColumn("j", (size(col("embedding")) * 0 + 1).cast("int"))
      .join(broadcast(KMeans.centroidsRow(cents)), Seq("j"))
    val assigned = withCents.select(
      col("vec_id"),
      KMeans.nearestCell(col("embedding"), col("cents")).as("cell")
    )
    val nearestCells = slice(
      transform(
        array_sort(
          transform(
            col("cents"),
            c => struct(
              KMeans.l2sq(col("embedding"), c.getField("cv")).as("dist"),
              c.getField("cell").as("cell")
            )
          )
        ),
        s => s.getField("cell")
      ),
      1,
      NProbe
    )
    val qbase = withCents
      .filter(col("vec_id") < 5)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        nearestCells.as("probe_cells")
      )
      .persist()
    val probes = qbase.select(col("query_id"), explode(col("probe_cells")).as("cell"))
    val lookup = qbase
      .select(
        col("query_id"),
        explode(sequence(lit(0), lit(LlmQueries2.PqSubspaces - 1))).as("m"),
        col("qv")
      )
      .select(
        col("query_id"),
        col("m").cast("long").as("sub"),
        transform(
          sequence(lit(0), lit(LlmQueries2.PqCodebook - 1)),
          c => round(LlmQueries2.pqSubScore(col("qv"), col("m"), c) * 1e6).cast("long")
        ).as("tvals")
      )
    adcRerank(emb, qbase.select(col("query_id"), col("qv")), lookup, assigned, probes)
  }

  /** FULLY-trained variant: KMeans-trained coarse routing AND
    * PqTrain-trained fine codebooks — the end-to-end production IVF-PQ
    * shape. Certified twice: IvfPqSpec's planted-neighbor recall floor
    * (arbitrary trained inputs), and the registered
    * `embed_ivfpq_search_trained` / `ann_recall_ivfpq_trained` rows
    * whose oracle replays the full Lloyd + PQ training and every search
    * stage ([[TrainedSearchOracleSql]]).
    *
    * `pqStats` is [[PqTrain.trainOf]] output; codewords quantize to
    * exact integer micro-units (s_mu div n), vectors and queries
    * likewise, so code assignment (packed argmin over the per-subspace
    * codeword ARRAY position — robust to dropped empty cells) and the
    * ADC lookup dots are pure int64.
    */
  /** Per-subspace trained codeword arrays from [[PqTrain.trainOf]]
    * statistics (codeword micro-units = s_mu div n, array position =
    * code).
    */
  private[operators] def pqBooks(pqStats: DataFrame): DataFrame =
    pqStats
      .groupBy("sub", "code")
      .agg(
        transform(
          array_sort(collect_list(struct(col("dim"), expr("s_mu div n").as("c")))),
          _.getField("c")
        ).as("cw")
      )
      .groupBy("sub")
      .agg(sort_array(collect_list(struct(col("code"), col("cw")))).as("cents"))

  /** (vec_id, sub, sv): integer micro-unit sub-vectors. */
  private[operators] def subvecsMu(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("m"), col("embedding"))
      .select(
        col("vec_id"),
        col("m").cast("long").as("sub"),
        expr(
          "transform(slice(embedding, cast(m * 8 + 1 as int), 8), x -> cast(round(cast(x as double) * 1e6) as bigint))"
        ).as("sv")
      )

  /** Packed-argmin code assignment over a (vec_id, sub, sv, cents)
    * frame (sv micro-units, cents the [[pqBooks]] codeword arrays).
    */
  private def codesOfWithBooks(withBooks: DataFrame): DataFrame =
    withBooks
      .withColumn(
        "k",
        expr(
          """aggregate(sequence(1, size(cents)), 9223372036854775807L,
            |  (acc, i) -> least(acc,
            |    aggregate(sequence(0, 7), 0L,
            |      (a, d) -> a + (sv[d] - cents[i-1].cw[d]) * (sv[d] - cents[i-1].cw[d])) * 64 + i))""".stripMargin
        )
      )
      .select(col("vec_id"), col("sub"), pmod(col("k"), lit(64L)).cast("long").as("code"))

  /** PQ-encode a (vec_id, embedding) frame under trained codebooks —
    * (vec_id, sub, code), the encode half a vector store runs on every
    * ingest batch.
    */
  private[operators] def pqCodesTrained(emb: DataFrame, pqStats: DataFrame): DataFrame =
    codesOfWithBooks(subvecsMu(emb).join(broadcast(pqBooks(pqStats)), Seq("sub")))

  /** Coarse-assign a (vec_id, embedding) frame under trained centroids
    * — (vec_id, cell).
    */
  private[operators] def assignCellsTrained(emb: DataFrame, cents: DataFrame): DataFrame =
    emb
      .withColumn("j", (size(col("embedding")) * 0 + 1).cast("int"))
      .join(broadcast(KMeans.centroidsRow(cents)), Seq("j"))
      .select(
        col("vec_id"),
        KMeans.nearestCell(col("embedding"), col("cents")).as("cell")
      )

  def searchFullyTrained(emb: DataFrame, cents: DataFrame, pqStats: DataFrame): DataFrame = {
    val books = pqBooks(pqStats)
    val sub = subvecsMu(emb)
    val withBooks = sub.join(broadcast(books), Seq("sub"))
    val codes = codesOfWithBooks(withBooks)
    val lookup = withBooks
      .filter(col("vec_id") < 5)
      .select(
        col("vec_id").as("query_id"),
        col("sub"),
        expr(
          "transform(cents, c -> aggregate(sequence(0, 7), 0L, (a, d) -> a + sv[d] * c.cw[d]))"
        ).as("tvals")
      )
    // Coarse routing: identical to searchTrained.
    val withCents = emb
      .withColumn("j", (size(col("embedding")) * 0 + 1).cast("int"))
      .join(broadcast(KMeans.centroidsRow(cents)), Seq("j"))
    val assigned = assignCellsTrained(emb, cents)
    val nearestCells = slice(
      transform(
        array_sort(
          transform(
            col("cents"),
            c => struct(
              KMeans.l2sq(col("embedding"), c.getField("cv")).as("dist"),
              c.getField("cell").as("cell")
            )
          )
        ),
        s => s.getField("cell")
      ),
      1,
      NProbe
    )
    val qbase = withCents
      .filter(col("vec_id") < 5)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        nearestCells.as("probe_cells")
      )
    val probes = qbase.select(col("query_id"), explode(col("probe_cells")).as("cell"))
    adcRerankCodes(emb, qbase.select(col("query_id"), col("qv")), lookup, assigned, probes, codes)
  }

  /** The full deterministic-codebook search as one oracle SELECT —
    * shared by `embed_ivfpq_search` and the recall eval below.
    */
  private[operators] val SearchOracleSql: String = searchOracleSqlAt(RerankN)

  /** The deterministic search oracle at an explicit rerank budget —
    * the `ann_recall_rerank` curve embeds one per grid arm.
    */
  private[operators] def searchOracleSqlAt(rerankN: Int): String = {
        val ivfWeight =
          "(strpos('0123456789abcdef', substr(md5('ivf' || cast(c as varchar) || ':' || cast(dd - 1 as varchar)), 1, 1)) - 1 - 7.5)"
        val cellScores =
          s"list_transform(range(0, $Cells), c -> list_sum(list_transform(range(1, len(v) + 1), dd -> v[dd] * $ivfWeight)))"
        val pqWeight =
          "(strpos('0123456789abcdef', substr(md5('pq' || cast(m as varchar) || ':' || cast(c as varchar) || ':' || cast(dd as varchar)), 1, 1)) - 1 - 7.5)"
        val codeScores =
          s"list_transform(range(0, 16), c -> list_sum(list_transform(range(0, 8), dd -> v[m*8 + dd + 1] * $pqWeight)))"
        val tEntry =
          s"list_sum(list_transform(range(0, 8), dd -> v[m*8 + dd + 1] * $pqWeight))"
        val cos =
          "round(list_dot_product(q.qv, x.v) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 6)"
        s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
           |cs AS (SELECT vec_id, v, $cellScores AS sc FROM e),
           |b AS (SELECT vec_id, list_position(sc, list_max(sc)) AS cell FROM cs),
           |qp AS (SELECT vec_id AS query_id, v AS qv,
           |  list_position(sc, list_max(sc)) AS c1,
           |  list_position(sc, list_max(list_filter(sc, (x, i) -> i != list_position(sc, list_max(sc))))) AS c2
           |  FROM cs WHERE vec_id < 5),
           |probes AS (SELECT query_id, unnest([c1, c2]) AS cell FROM qp),
           |se AS (SELECT vec_id, unnest(range(0, 8)) AS m, v FROM e),
           |codes AS (SELECT vec_id, m AS sub, list_position(sc2, list_max(sc2)) AS code
           |  FROM (SELECT vec_id, m, $codeScores AS sc2 FROM se) _x),
           |t AS (SELECT query_id, m AS sub, c, cast(round($tEntry * 1e6) as bigint) AS t_micro
           |  FROM (SELECT query_id, qv AS v FROM qp) q, range(0, 8) _m(m), range(0, 16) _c(c)),
           |cand AS (SELECT p.query_id, codes.vec_id, codes.sub, codes.code
           |  FROM codes JOIN b ON b.vec_id = codes.vec_id
           |  JOIN probes p ON b.cell = p.cell
           |  WHERE codes.vec_id != p.query_id),
           |adc AS (SELECT cand.query_id, cand.vec_id AS neighbor_id, sum(t.t_micro) AS adc_micro
           |  FROM cand JOIN t ON t.query_id = cand.query_id AND t.sub = cand.sub AND t.c = cand.code - 1
           |  GROUP BY 1, 2),
           |short AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_micro DESC, neighbor_id) AS r FROM adc),
           |rr AS (SELECT s.query_id, s.neighbor_id, $cos AS score
           |  FROM short s JOIN e x ON x.vec_id = s.neighbor_id
           |  JOIN qp q ON q.query_id = s.query_id
           |  WHERE s.r <= $rerankN),
           |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM rr)
           |SELECT query_id, neighbor_id, score, cast(rank as bigint) AS rank
           |FROM ranked WHERE rank <= $TopK""".stripMargin
  }

  private val searchQ = Q(
    "embed_ivfpq_search",
    (s, d) => searchDeterministic(Tables.embeddings(s, d).select("vec_id", "embedding")),
    Some(SearchOracleSql)
  )

  /** Recall@TopK of the END-TO-END IVF-PQ search against brute-force
    * cosine ground truth — closing the recall-eval family (sign-LSH,
    * multi-probe, hybrid-RRF, dimension-ablated) over the one ANN path
    * that had no measured loss number: nprobe coarse routing,
    * 4-bit PQ quantization, and the bounded rerank compound in ways no single
    * stage's eval predicts, and a 100-TB deployment tunes exactly these
    * three knobs against this one curve. Same eval chassis as
    * `ann_recall_eval` ([[AnnEval]]): deliberately small query sample,
    * per-query exact integer per-mille recall.
    */
  private val recallQ = Q(
    "ann_recall_ivfpq",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val truth = AnnEval.truthTopK(emb, 5, TopK)
      val approx = searchDeterministic(emb)
        .select(col("query_id"), col("neighbor_id").as("approx_id"))
      AnnEval.recallOf(truth, approx)
    },
    Some {
      s"""WITH approx AS (SELECT query_id, neighbor_id FROM ($SearchOracleSql) _a),
         |v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.vec, e.vec) /
         |              (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < 5 AND e.vec_id != q.vec_id) _t
         |  WHERE rank <= $TopK)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_overlap,
         |  CAST((count(a.neighbor_id) * 1000) // count(*) AS BIGINT) AS recall_permille
         |FROM truth t LEFT JOIN approx a
         |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |GROUP BY 1""".stripMargin
    }
  )

  /** The registered FULLY-trained composition: two Lloyd rounds of
    * coarse training from the first-8 seeds ([[KMeans.step]] /
    * [[KMeans.centroids]], the certified `embed_kmeans_step`
    * arithmetic) plus the [[PqTrain.trainOf]] fine codebooks, feeding
    * [[searchFullyTrained]]. This closes the round-10 gap where the
    * trained search was spec-only: BOTH quantizer training paths are
    * now end-to-end oracle-certified.
    */
  def searchFullyTrainedOf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    searchFullyTrained(emb, trainedCentsOf(emb), PqTrain.trainOf(emb))
  }

  private[operators] val KmSeeds = 8
  private[operators] val KmIters = 2

  /** The registered Lloyd coarse-training recipe (KmIters rounds from
    * the first-KmSeeds seeds) over any (vec_id, embedding) frame.
    */
  private[graft] def trainedCentsOf(emb: DataFrame): DataFrame = {
    val embIdVec = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    var cents = emb
      .filter(col("vec_id") < KmSeeds)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    for (_ <- 1 to KmIters)
      cents = KMeans.centroids(KMeans.step(embIdVec, cents))
    cents
  }

  /** Persisted-model twin of [[searchFullyTrainedOf]]: BOTH trained
    * quantizers (the Lloyd coarse centroids and the PQ sufficient
    * statistics) round-trip through parquet model tables before the
    * search reads them — the train-once / load-forever production
    * shape. Hash-equal to `embed_ivfpq_search_trained` by construction;
    * registered via [[ModelStore]].
    */
  def searchStoredOf(s: SparkSession, d: String, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val cents = trainedCentsOf(emb)
    cents.write.mode("overwrite").parquet(s"$dir/ivf_centroids")
    PqTrain.trainOf(emb).write.mode("overwrite").parquet(s"$dir/pq_codebooks")
    searchFullyTrained(
      emb,
      s.read.parquet(s"$dir/ivf_centroids"),
      s.read.parquet(s"$dir/pq_codebooks")
    )
  }

  /** The fully-trained search as one oracle SELECT: the PqTrain CTE
    * chain (verbatim, via [[PqTrain.trainCtesSql]]) + a two-round
    * unrolled Lloyd replay of the coarse quantizer + integer-exact code
    * assignment/ADC + the shared rerank tail. Spark's `s_mu div n`
    * truncates toward zero, so the codeword micro-units replay as
    * trunc(s_mu / n) — NOT DuckDB's flooring `//`.
    */
  /** One Lloyd-replay round over `$src(vec_id, v)`. */
  private def kmRoundSql(r: Int, src: String): String =
    s"""kd$r AS (
       |  SELECT e.vec_id, c.cell,
       |    list_sum(list_transform(range(1, len(e.v) + 1),
       |      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
       |  FROM $src e CROSS JOIN kc${r - 1} c),
       |ka$r AS (SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |  FROM kd$r),
       |kx$r AS (SELECT a.cell, unnest(range(1, len(e.v) + 1)) AS dim, unnest(e.v) AS x
       |  FROM (SELECT vec_id, cell FROM ka$r WHERE rn = 1) a JOIN $src e USING (vec_id)),
       |kst$r AS MATERIALIZED (
       |  SELECT cell, dim, count(*) AS n, sum(cast(round(x * 1e6) as bigint)) AS s_mu
       |  FROM kx$r GROUP BY 1, 2),
       |kc$r AS (SELECT cell, list(s_mu / (n * 1e6) ORDER BY dim) AS cv FROM kst$r GROUP BY cell)""".stripMargin

  /** The coarse-quantizer oracle chain: Lloyd rounds trained on
    * `$trainSrc`, final assignment `kasn(vec_id, cell)` over
    * `$assignSrc`. Ends with `kc$KmIters` (the trained centroids) and
    * `kasn` in scope.
    */
  private[operators] def lloydCtesSql(trainSrc: String, assignSrc: String): String =
    s"""kc0 AS (SELECT vec_id AS cell, v AS cv FROM $trainSrc WHERE vec_id < $KmSeeds),
       |${(1 to KmIters).map(kmRoundSql(_, trainSrc)).mkString(",\n")},
       |kasn AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        list_sum(list_transform(range(1, len(e.v) + 1),
       |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), c.cell) AS rn
       |    FROM $assignSrc e CROSS JOIN kc$KmIters c) _a WHERE rn = 1)""".stripMargin

  /** Trained-codebook integer arrays from the PqTrain chain's final
    * `st2` statistics (Spark's `s_mu div n` truncates toward zero, so
    * codeword micro-units replay as trunc — NOT DuckDB's flooring `//`).
    * Ends with `cgi(m, cents)` in scope.
    */
  private[operators] val cgiCtesSql: String =
    """cwl AS (SELECT m, cell,
      |    list(CAST(trunc(CAST(s_mu AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS cwi
      |  FROM st2 GROUP BY m, cell),
      |cgi AS (SELECT m, list(cwi ORDER BY cell) AS cents FROM cwl GROUP BY m)""".stripMargin

  /** Integer micro-unit sub-vectors of `$src(vec_id, v)` as `$name`. */
  private[operators] def subvecsMuSql(name: String, src: String): String =
    s"""$name AS (SELECT vec_id, m,
       |    list_transform(range(1, 9), i -> cast(round(v[cast(m * 8 + i AS BIGINT)] * 1e6) as bigint)) AS svi
       |  FROM (SELECT vec_id, v, unnest(range(0, 8)) AS m FROM $src) _s$name)""".stripMargin

  /** Code assignment of a `(vec_id, m, svi)` frame against `cgi` —
    * yields `codes(vec_id, sub, code)` (code = 1-based array position,
    * the Spark packed-argmin law).
    */
  private[operators] def pqCodesCtesSql(sviSrc: String): String =
    s"""cd AS (SELECT s.vec_id, s.m, ii.i,
       |    list_sum(list_transform(range(1, 9),
       |      d -> (s.svi[d] - g.cents[ii.i][d]) * (s.svi[d] - g.cents[ii.i][d]))) AS dist
       |  FROM $sviSrc s JOIN cgi g ON g.m = s.m,
       |    (SELECT unnest(range(1, 17)) AS i) ii
       |  WHERE ii.i <= len(g.cents)),
       |codes AS (SELECT vec_id, m AS sub, i AS code FROM (
       |    SELECT vec_id, m, i,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, i) AS rn
       |    FROM cd) _c WHERE rn = 1)""".stripMargin

  private[operators] val TrainedSearchOracleSql: String = {
    val cos =
      "round(list_dot_product(q.qv, x.v) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 6)"
    s"""${PqTrain.trainCtesSql},
       |$cgiCtesSql,
       |${lloydCtesSql("e", "e")},
       |qp AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_sum(list_transform(range(1, len(q.qv) + 1),
       |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), c.cell) AS rn
       |    FROM qp q CROSS JOIN kc$KmIters c) _p WHERE rn <= $NProbe),
       |${subvecsMuSql("svi", "e")},
       |${pqCodesCtesSql("svi")},
       |tq AS (SELECT s.vec_id AS query_id, s.m AS sub, ii.i AS c,
       |    list_sum(list_transform(range(1, 9), d -> s.svi[d] * g.cents[ii.i][d])) AS t_micro
       |  FROM svi s JOIN cgi g ON g.m = s.m,
       |    (SELECT unnest(range(1, 17)) AS i) ii
       |  WHERE s.vec_id < 5 AND ii.i <= len(g.cents)),
       |cand AS (SELECT p.query_id, codes.vec_id, codes.sub, codes.code
       |  FROM codes JOIN kasn ON kasn.vec_id = codes.vec_id
       |  JOIN probes p ON kasn.cell = p.cell
       |  WHERE codes.vec_id != p.query_id),
       |adc AS (SELECT cand.query_id, cand.vec_id AS neighbor_id, sum(t.t_micro) AS adc_micro
       |  FROM cand JOIN tq t ON t.query_id = cand.query_id AND t.sub = cand.sub AND t.c = cand.code
       |  GROUP BY 1, 2),
       |short AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_micro DESC, neighbor_id) AS r FROM adc),
       |rr AS (SELECT s.query_id, s.neighbor_id, $cos AS score
       |  FROM short s JOIN e x ON x.vec_id = s.neighbor_id
       |  JOIN qp q ON q.query_id = s.query_id
       |  WHERE s.r <= $RerankN),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM rr)
       |SELECT query_id, neighbor_id, score, cast(rank as bigint) AS rank
       |FROM ranked WHERE rank <= $TopK""".stripMargin
  }

  private val searchTrainedQ = Q(
    "embed_ivfpq_search_trained",
    (s, d) => searchFullyTrainedOf(s, d),
    Some(TrainedSearchOracleSql)
  )

  /** Recall@TopK of the FULLY-trained search against brute-force truth
    * — the trained twin of `ann_recall_ivfpq`, so a deployment can read
    * what training the quantizers buys over the deterministic
    * codebooks at the same (nprobe, rerank) budget.
    */
  private val recallTrainedQ = Q(
    "ann_recall_ivfpq_trained",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val truth = AnnEval.truthTopK(emb, 5, TopK)
      val approx = searchFullyTrainedOf(s, d)
        .select(col("query_id"), col("neighbor_id").as("approx_id"))
      AnnEval.recallOf(truth, approx)
    },
    Some {
      s"""WITH approx AS (SELECT query_id, neighbor_id FROM ($TrainedSearchOracleSql) _a),
         |v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.vec, e.vec) /
         |              (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < 5 AND e.vec_id != q.vec_id) _t
         |  WHERE rank <= $TopK)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_overlap,
         |  CAST((count(a.neighbor_id) * 1000) // count(*) AS BIGINT) AS recall_permille
         |FROM truth t LEFT JOIN approx a
         |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |GROUP BY 1""".stripMargin
    }
  )

  private val RerankGrid = Seq(5, 10, 20)

  /** Recall-vs-rerank tuning curve (r11): recall@5 of the deterministic
    * IVF-PQ search at rerank budgets 5 / 10 / 20 — the THIRD of the
    * three knobs a deployment tunes (`ann_recall_nprobe` reads the
    * probe axis, `embed_pq_distortion` the code size; this reads what
    * each extra exact-rerank candidate buys, and the rerank budget is
    * the per-query cost of shipping full vectors at serve time). A
    * rerank of TopK means "trust ADC order entirely"; the gap between
    * that arm and rerank 20 is exactly the damage 4-bit quantization
    * does to the head of the ranking.
    */
  private val recallRerankQ = Q(
    "ann_recall_rerank",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val truth = AnnEval.truthTopK(emb, 5, TopK)
      RerankGrid
        .map { r =>
          val approx = searchDeterministic(emb, r)
            .select(col("query_id"), col("neighbor_id").as("approx_id"))
          AnnEval
            .recallOf(truth, approx)
            .select(
              lit(r.toLong).as("rerank_n"),
              col("query_id"),
              col("k"),
              col("n_overlap"),
              col("recall_permille")
            )
        }
        .reduce(_.unionByName(_))
    },
    Some {
      def arm(r: Int): String =
        s"""SELECT CAST($r AS BIGINT) AS rerank_n, t.query_id,
           |  CAST(count(*) AS BIGINT) AS k,
           |  CAST(count(a.neighbor_id) AS BIGINT) AS n_overlap,
           |  CAST((count(a.neighbor_id) * 1000) // count(*) AS BIGINT) AS recall_permille
           |FROM truth t LEFT JOIN
           |  (SELECT query_id, neighbor_id FROM (${searchOracleSqlAt(r)}) _s$r) a
           |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
           |GROUP BY 2""".stripMargin
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.vec, e.vec) /
         |              (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < 5 AND e.vec_id != q.vec_id) _t
         |  WHERE rank <= $TopK)
         |${RerankGrid.map(arm).mkString("\nUNION ALL\n")}""".stripMargin
    }
  )

  // ---------------------------------------------------------------
  // Incremental index maintenance (r12).
  // ---------------------------------------------------------------

  /** One index batch under explicit trained quantizers: per vector its
    * coarse cell and the 8 PQ codes packed as a string — the row a
    * vector store persists per ingested vector.
    */
  private[graft] def incrementalIndexOf(
      part: DataFrame,
      cents: DataFrame,
      pqStats: DataFrame
  ): DataFrame =
    assignCellsTrained(part, cents)
      .join(
        pqCodesTrained(part, pqStats)
          .groupBy("vec_id")
          .agg(
            array_join(
              transform(
                array_sort(collect_list(struct(col("sub"), col("code")))),
                x => x.getField("code").cast("string")
              ),
              ","
            ).as("codes")
          ),
        Seq("vec_id")
      )
      .select(col("vec_id"), col("cell").cast("long").as("cell"), col("codes"))

  /** Incremental ANN assignment — the production shape every 100-TB
    * vector store runs daily: quantizers train ONCE on the base corpus
    * and persist ([[ModelStore]]); the base index is encoded once and
    * STORED; each daily delta routes through the LOADED quantizers and
    * APPENDS — history is never re-encoded and never reshuffled (the
    * stored index streams through scan → union with zero exchange,
    * asserted by RoundTwelveOpsSpec like BucketingSpec's dedup layout).
    * Because encoding is a pure function of (vector, stored models),
    * base ∪ delta is row-identical to a one-shot encode of everything
    * under the same models — exactly what the oracle replays (it
    * encodes all vectors through base-trained quantizers), so the hash
    * gate certifies the two-batch ≡ one-shot law; the spec asserts the
    * same identity in-plan.
    *
    * The delta is `vec_id % 10 = 9` — a held-out tenth the quantizers
    * never saw. The equivalence certified is that BOTH engines (and the
    * spec's one-shot encode) train on the identical base split; the
    * base-trained seed set is NOT claimed equal to a whole-corpus
    * training (vec_id 9 is a seed candidate there but sits in the
    * delta here).
    */
  def ivfpqIncrementalOf(s: SparkSession, d: String, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 9)
    val cents = trainedCentsOf(base)
    val pqStats = PqTrain.trainOf(base)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/incr_ivf_centroids")
    pqStats.coalesce(1).write.mode("overwrite").parquet(s"$dir/incr_pq_codebooks")
    incrementalIndexOf(base, cents, pqStats).write
      .mode("overwrite")
      .parquet(s"$dir/incr_index_base")
    val loadedCents = s.read.parquet(s"$dir/incr_ivf_centroids")
    val loadedPq = s.read.parquet(s"$dir/incr_pq_codebooks")
    s.read
      .parquet(s"$dir/incr_index_base")
      .withColumn("batch", lit("base"))
      .unionByName(
        incrementalIndexOf(delta, loadedCents, loadedPq).withColumn("batch", lit("delta"))
      )
      .select(col("vec_id"), col("batch"), col("cell"), col("codes"))
  }

  /** Incremental-index oracle: train both quantizers on the base only,
    * then encode ALL vectors through them (encode is batch-invariant,
    * so this IS base ∪ delta).
    */
  private[operators] val IncrementalOracleSql: String =
    s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |eb AS (SELECT * FROM e WHERE vec_id % 10 != 9),
       |${PqTrain.trainChainSql("eb")},
       |$cgiCtesSql,
       |${lloydCtesSql("eb", "e")},
       |${subvecsMuSql("sva", "e")},
       |${pqCodesCtesSql("sva")},
       |cstr AS (SELECT vec_id,
       |    array_to_string(list(cast(code AS varchar) ORDER BY sub), ',') AS codes
       |  FROM codes GROUP BY vec_id)
       |SELECT e.vec_id,
       |  CASE WHEN e.vec_id % 10 = 9 THEN 'delta' ELSE 'base' END AS batch,
       |  CAST(k.cell AS BIGINT) AS cell, c.codes
       |FROM e JOIN kasn k USING (vec_id) JOIN cstr c USING (vec_id)""".stripMargin

  // ---------------------------------------------------------------
  // Residual (IVFADC) search + recall (r12).
  // ---------------------------------------------------------------

  /** Fully-trained RESIDUAL search — the FAISS-standard IVFADC
    * formulation: PQ codes encode r = v − coarse_centroid(cell)
    * ([[PqTrain.residualsOf]]); at serve time the inner-product score
    * decomposes as dot(q, v̂) = dot(q, centroid) + dot(q, r̂), so the
    * ADC sum gains one per-(query, cell) bias term alongside the same
    * broadcast lookup tables (the bias is Cells × queries numbers —
    * broadcast, never a shuffle).
    */
  def searchResidual(emb: DataFrame, cents: DataFrame, pqStats: DataFrame): DataFrame = {
    val codes = pqCodesTrained(PqTrain.residualsOf(emb, cents), pqStats)
    val assigned = assignCellsTrained(emb, cents)
    val withCents = emb
      .withColumn("j", (size(col("embedding")) * 0 + 1).cast("int"))
      .join(broadcast(KMeans.centroidsRow(cents)), Seq("j"))
    val nearestCells = slice(
      transform(
        array_sort(
          transform(
            col("cents"),
            c => struct(
              KMeans.l2sq(col("embedding"), c.getField("cv")).as("dist"),
              c.getField("cell").as("cell")
            )
          )
        ),
        s => s.getField("cell")
      ),
      1,
      NProbe
    )
    val qbase = withCents
      .filter(col("vec_id") < 5)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        col("cents"),
        nearestCells.as("probe_cells")
      )
    val probes = qbase.select(col("query_id"), explode(col("probe_cells")).as("cell"))
    // dot(q, centroid) per (query, cell) in µ² units (micro-q times the
    // 1e6-scaled double dot, rounded once — the round(x*1e6) discipline
    // squared).
    val qCellBias = qbase
      .select(col("query_id"), col("qv"), explode(col("cents")).as("c"))
      .select(
        col("query_id"),
        col("c.cell").as("cell"),
        expr(
          "cast(round(aggregate(zip_with(qv, c.cv, (a, b) -> cast(a as double) * b), 0D, (acc, x) -> acc + x) * 1e12) as bigint)"
        ).as("bias_micro")
      )
    val lookup = subvecsMu(emb)
      .filter(col("vec_id") < 5)
      .join(broadcast(pqBooks(pqStats)), Seq("sub"))
      .select(
        col("vec_id").as("query_id"),
        col("sub"),
        expr(
          "transform(cents, c -> aggregate(sequence(0, 7), 0L, (a, d) -> a + sv[d] * c.cw[d]))"
        ).as("tvals")
      )
    val cand = codes
      .join(assigned, Seq("vec_id"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val adc = cand
      .join(broadcast(lookup), Seq("query_id", "sub"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        col("cell"),
        expr("element_at(tvals, cast(code as int))").as("t_micro")
      )
      .groupBy("query_id", "neighbor_id", "cell")
      .agg(sum("t_micro").as("r_micro"))
      .join(broadcast(qCellBias), Seq("query_id", "cell"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        (col("r_micro") + col("bias_micro")).as("adc_micro")
      )
    val wAdc = Window.partitionBy("query_id").orderBy(col("adc_micro").desc, col("neighbor_id"))
    val shortlist = adc
      .withColumn("r", row_number().over(wAdc))
      .filter(col("r") <= RerankN)
      .select("query_id", "neighbor_id")
    val reranked = shortlist
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")), Seq("neighbor_id"))
      .join(broadcast(qbase.select(col("query_id"), col("qv"))), Seq("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        round(graft.functions.VectorFunctions.cosine(col("qv"), col("embedding")), 6).as("score")
      )
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    reranked.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= TopK)
  }

  /** The residual search's registered composition: coarse Lloyd on the
    * corpus, PQ trained on the RESIDUALS under those centroids.
    */
  def searchResidualOf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val cents = trainedCentsOf(emb)
    searchResidual(emb, cents, PqTrain.trainOf(PqTrain.residualsOf(emb, cents)))
  }

  /** Residual-search oracle: Lloyd chain + residual frame + the PQ
    * chain over residuals + residual codes + biased ADC + shared
    * rerank tail.
    */
  private[operators] val ResidualSearchOracleSql: String = {
    val cos =
      "round(list_dot_product(q.qv, x.v) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.v, x.v))), 6)"
    s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |${lloydCtesSql("e", "e")},
       |re AS (SELECT e.vec_id,
       |    list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS v
       |  FROM e JOIN kasn a USING (vec_id) JOIN kc$KmIters c ON c.cell = a.cell),
       |${PqTrain.trainChainSql("re")},
       |$cgiCtesSql,
       |${subvecsMuSql("svr", "re")},
       |${pqCodesCtesSql("svr")},
       |qp AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
       |probes AS (SELECT query_id, cell FROM (
       |    SELECT q.query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.query_id ORDER BY
       |        list_sum(list_transform(range(1, len(q.qv) + 1),
       |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), c.cell) AS rn
       |    FROM qp q CROSS JOIN kc$KmIters c) _p WHERE rn <= $NProbe),
       |qb AS (SELECT q.query_id, c.cell,
       |    cast(round(list_sum(list_transform(range(1, len(q.qv) + 1),
       |      i -> q.qv[i] * c.cv[i])) * 1e12) as bigint) AS bias_micro
       |  FROM qp q CROSS JOIN kc$KmIters c),
       |${subvecsMuSql("svq", "e")},
       |tq AS (SELECT s.vec_id AS query_id, s.m AS sub, ii.i AS c,
       |    list_sum(list_transform(range(1, 9), d -> s.svi[d] * g.cents[ii.i][d])) AS t_micro
       |  FROM svq s JOIN cgi g ON g.m = s.m,
       |    (SELECT unnest(range(1, 17)) AS i) ii
       |  WHERE s.vec_id < 5 AND ii.i <= len(g.cents)),
       |cand AS (SELECT p.query_id, codes.vec_id, kasn.cell, codes.sub, codes.code
       |  FROM codes JOIN kasn ON kasn.vec_id = codes.vec_id
       |  JOIN probes p ON kasn.cell = p.cell
       |  WHERE codes.vec_id != p.query_id),
       |adc AS (SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |    sum(t.t_micro) + any_value(qb.bias_micro) AS adc_micro
       |  FROM cand
       |  JOIN tq t ON t.query_id = cand.query_id AND t.sub = cand.sub AND t.c = cand.code
       |  JOIN qb ON qb.query_id = cand.query_id AND qb.cell = cand.cell
       |  GROUP BY 1, 2),
       |short AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_micro DESC, neighbor_id) AS r FROM adc),
       |rr AS (SELECT s.query_id, s.neighbor_id, $cos AS score
       |  FROM short s JOIN e x ON x.vec_id = s.neighbor_id
       |  JOIN qp q ON q.query_id = s.query_id
       |  WHERE s.r <= $RerankN),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM rr)
       |SELECT query_id, neighbor_id, score, cast(rank as bigint) AS rank
       |FROM ranked WHERE rank <= $TopK""".stripMargin
  }

  /** Recall@TopK of the residual search vs brute-force truth — the
    * residual point beside `ann_recall_ivfpq_trained`: same corpus,
    * same (nprobe, rerank, code) budget, residual-encoded codes. What
    * the FAISS formulation buys is this row minus that one.
    */
  private val recallResidualQ = Q(
    "ann_recall_residual",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val truth = AnnEval.truthTopK(emb, 5, TopK)
      val approx = searchResidualOf(s, d)
        .select(col("query_id"), col("neighbor_id").as("approx_id"))
      AnnEval.recallOf(truth, approx)
    },
    Some {
      s"""WITH approx AS (SELECT query_id, neighbor_id FROM ($ResidualSearchOracleSql) _a),
         |v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.vec, e.vec) /
         |              (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < 5 AND e.vec_id != q.vec_id) _t
         |  WHERE rank <= $TopK)
         |SELECT t.query_id, CAST(count(*) AS BIGINT) AS k,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS n_overlap,
         |  CAST((count(a.neighbor_id) * 1000) // count(*) AS BIGINT) AS recall_permille
         |FROM truth t LEFT JOIN approx a
         |  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
         |GROUP BY 1""".stripMargin
    }
  )

  val all: Seq[Q] =
    Seq(searchQ, recallQ, searchTrainedQ, recallTrainedQ, recallRerankQ, recallResidualQ)
}
