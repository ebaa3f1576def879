package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch-based approximate analytics — the bounded-state substitutes for
  * the exact aggregations that stop scaling at 100 TB:
  *
  *   - `corpus_distinct_kmv`: sharded K-minimum-values distinct-count
  *     sketch (Bar-Yossef et al. 2002, "Counting Distinct Elements in a
  *     Data Stream"). Exact `COUNT(DISTINCT text)` shuffles every
  *     distinct value; the sketch reduces each (source, shard) to one
  *     long via a map-side-combined min and estimates cardinality from
  *     the k-th smallest shard minimum with pure integer arithmetic.
  *   - `docs_ngram_cms`: count-min sketch (Cormode & Muthukrishnan 2005)
  *     frequency estimates. Exact n-gram counting keys the shuffle by the
  *     unbounded gram vocabulary; the sketch is a fixed depth×width
  *     counter table (4×1024 here) that is mergeable, broadcastable, and
  *     answers point queries by a min over `depth` buckets.
  *   - `docs_length_histogram`: fixed-bucket token-length histogram with
  *     quantiles read off the cumulative counts — the bounded-state
  *     replacement for exact `percentile()` (which buffers every value
  *     per group and cannot scale).
  *   - `corpus_stats_cube`: multi-granularity corpus statistics in ONE
  *     aggregation pass via `CUBE(source, lang)` — at 100 TB each extra
  *     grouping pass is a full scan, so the cube's single shuffle
  *     replaces four.
  *   - `ann_recall_eval`: retrieval-quality evaluation — recall@k of the
  *     sign-LSH ANN path against the brute-force cosine ground truth on
  *     a deterministic query sample. The eval every ANN deployment needs
  *     before trusting the approximate path.
  *
  * All hash arithmetic derives from md5 hex prefixes (48-bit integers)
  * and all derived statistics stay in exact integer arithmetic (integer
  * division, per-mille units), so every output is bit-reproducible in
  * any engine — no float estimator crosses the oracle boundary.
  */
object SketchQueries {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  /** 48-bit uniform hash of a string column: md5 hex prefix as a long. */
  private[graft] def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  private[graft] val Hash48Space = 281474976710656L // 2^48

  /** KMV cardinality estimate from a sorted register array column named
    * `msName` (the name is embedded in a SQL `div` expression — Column
    * API has no integer division): `(k−1)·2^48 div ms[k]` when ≥k
    * registers exist and the k-th is positive, else the register count
    * itself. Shared by corpus_distinct_kmv and events_partial_merge so
    * the estimator branch lives in exactly one place.
    */
  private[graft] def kmvEstimate(msName: String, nShards: Column, k: Int): Column = {
    val kth = when(nShards >= k, element_at(col(msName), k))
    when(
      kth > 0,
      expr(s"${(k - 1).toLong * Hash48Space}L div element_at($msName, $k)")
    ).otherwise(nShards.cast("long"))
  }

  // ---------------------------------------------------------------------
  // KMV distinct sketch
  // ---------------------------------------------------------------------

  private[graft] val KmvShards = 256
  private val KmvK = 64

  /** Sharded KMV: stage 1 reduces each (source, shard) to its minimum
    * hash — a bounded-key aggregate (sources × 256 rows) with map-side
    * partial mins, so the corpus itself never shuffles. Stage 2 sorts the
    * ≤256 shard minima per source inside one collected array (bounded,
    * not corpus-sized) and reads the k-th smallest. The estimator
    * `(k−1)·2^48 div h_k` is the classic KMV unbiased form, computed with
    * integer division so both engines produce the identical long.
    *
    * Deviation from textbook KMV, documented: the k smallest *shard
    * minima* can miss a global bottom-k value when two of the true
    * bottom-k collide in a shard (probability ≈ k²/2·shards ≈ 0.8% per
    * pair here). The estimator stays consistent — both engines compute
    * the same statistic — and the shard pass is what makes the shuffle
    * bounded at 100 TB.
    *
    * The `##all` row demonstrates the sketch's mergeability — the
    * whole-corpus registers are the per-shard min over the per-source
    * registers, no second corpus pass — and (with 20 sources × 256
    * shards of data behind it) exercises the k-th-min estimator branch
    * the small per-source groups don't reach.
    */
  private val distinctKmv = Q(
    "corpus_distinct_kmv",
    (s, d) => {
      val h = hash48(coalesce(col("text"), lit("")))
      val stage1 = docs(s, d)
        .select(col("source"), h.as("h"), (h % KmvShards).as("shard"))
        .groupBy("source", "shard")
        .agg(min(col("h")).as("minh"), count(lit(1)).as("n"))
      val merged = stage1
        .groupBy("shard")
        .agg(min(col("minh")).as("minh"), sum(col("n")).as("n"))
        .select(lit("##all").as("source"), col("shard"), col("minh"), col("n"))
      stage1
        .unionByName(merged)
        .groupBy("source")
        .agg(
          sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_shards"),
          sort_array(collect_list(col("minh"))).as("ms")
        )
        .select(
          col("source"),
          col("n_rows"),
          col("n_shards").cast("long").as("n_shards"),
          when(col("n_shards") >= KmvK, element_at(col("ms"), KmvK)).as("kth_min"),
          kmvEstimate("ms", col("n_shards"), KmvK).as("est_distinct")
        )
    },
    Some(
      s"""WITH h AS (
         |  SELECT source,
         |    ('0x' || substr(md5(coalesce(text, '')), 1, 12))::bigint AS h
         |  FROM documents),
         |s1s AS (
         |  SELECT source, h % $KmvShards AS shard, min(h) AS minh, count(*) AS n
         |  FROM h GROUP BY 1, 2),
         |s1 AS (
         |  SELECT * FROM s1s
         |  UNION ALL
         |  SELECT '##all' AS source, shard, min(minh) AS minh, sum(n) AS n
         |  FROM s1s GROUP BY 2),
         |s2 AS (
         |  SELECT source, sum(n) AS n_rows, count(*) AS n_shards,
         |    list_sort(list(minh)) AS ms
         |  FROM s1 GROUP BY 1)
         |SELECT source, cast(n_rows as bigint) AS n_rows,
         |  cast(n_shards as bigint) AS n_shards,
         |  (CASE WHEN n_shards >= $KmvK THEN ms[$KmvK] ELSE NULL END) AS kth_min,
         |  (CASE WHEN n_shards >= $KmvK AND ms[$KmvK] > 0
         |        THEN ${(KmvK - 1).toLong * Hash48Space} // ms[$KmvK]
         |        ELSE cast(n_shards as bigint) END) AS est_distinct
         |FROM s2""".stripMargin
    )
  )

  // ---------------------------------------------------------------------
  // Count-min sketch
  // ---------------------------------------------------------------------

  private[graft] val CmsDepth = 4
  private[graft] val CmsWidth = 1024

  /** Word 3-grams of the document text (the docs_ngram_freq vocabulary). */
  private[graft] def gramsOf(text: Column): Column =
    // bindOnce: each per-position slice would otherwise inline (and
    // re-evaluate) the split — O(n²) per row.
    graft.functions.MetadataFunctions.bindOnce(split(coalesce(text, lit("")), " ")) { tokens =>
      transform(
        sequence(lit(0), greatest(size(tokens) - 3, lit(0))),
        i => array_join(slice(tokens, i + 1, lit(3)), " ")
      )
    }

  /** CMS row-r bucket of a gram: an independent hash per row via the
    * `r:` prefix, reduced mod the sketch width.
    */
  private[graft] def cmsBucket(r: Column, gram: Column): Column =
    hash48(concat(r.cast("string"), lit(":"), gram)) % CmsWidth

  /** Count-min sketch build + point queries. The sketch build explodes
    * each gram occurrence to `depth` (row, bucket) pairs and aggregates
    * into at most depth×width = 4096 cells — a bounded-key shuffle with
    * map-side combine regardless of corpus size, where exact counting
    * keys by the unbounded vocabulary. The probe side (a deterministic
    * doc sample's distinct grams) joins each candidate's `depth` buckets
    * against the broadcast sketch and takes the min — the CMS
    * upper-bound estimate. `exact_n` is joined in HERE so the test
    * corpus exposes the overestimate structure (est ≥ exact always); a
    * production run reads the sketch alone and skips that exact pass.
    */
  private val ngramCms = Q(
    "docs_ngram_cms",
    (s, d) => {
      // Three consumers (sketch cells, probe set, exact counts) read the
      // exploded gram corpus; persist it or each re-runs the scan+explode
      // (Spark deduplicates exchanges, not common subplans).
      val corpus = docs(s, d)
        .select(col("doc_id"), explode(gramsOf(col("text"))).as("gram"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cells = corpus
        .select(
          explode(
            array((0 until CmsDepth).map { r =>
              struct(lit(r).as("r"), cmsBucket(lit(r), col("gram")).as("bucket"))
            }: _*)
          ).as("cell")
        )
        .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
        .agg(count(lit(1)).as("n"))
      val probes = corpus
        .filter(col("doc_id") % 97 === 0)
        .select(col("gram"))
        .distinct()
      val probeCells = probes
        .select(
          col("gram"),
          explode(
            array((0 until CmsDepth).map { r =>
              struct(lit(r).as("r"), cmsBucket(lit(r), col("gram")).as("bucket"))
            }: _*)
          ).as("cell")
        )
        .select(col("gram"), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      val est = probeCells
        .join(broadcast(cells), Seq("r", "bucket"))
        .groupBy("gram")
        .agg(min(col("n")).as("est_n"))
      val exact = corpus.groupBy("gram").agg(count(lit(1)).as("exact_n"))
      est.join(exact, Seq("gram"))
    },
    Some(
      s"""WITH tk AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tokens FROM documents),
         |ex AS (SELECT doc_id, tokens, unnest(range(0, greatest(len(tokens) - 3, 0) + 1)) AS i FROM tk),
         |corpus AS (SELECT doc_id, array_to_string(tokens[i+1 : i+3], ' ') AS gram FROM ex),
         |cells AS (
         |  SELECT r, ('0x' || substr(md5(cast(r as varchar) || ':' || gram), 1, 12))::bigint % $CmsWidth AS bucket,
         |    count(*) AS n
         |  FROM corpus, (SELECT unnest(range(0, $CmsDepth)) AS r)
         |  GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT gram FROM corpus WHERE doc_id % 97 = 0),
         |pc AS (
         |  SELECT gram, r, ('0x' || substr(md5(cast(r as varchar) || ':' || gram), 1, 12))::bigint % $CmsWidth AS bucket
         |  FROM probes, (SELECT unnest(range(0, $CmsDepth)) AS r)),
         |est AS (
         |  SELECT pc.gram, min(cells.n) AS est_n
         |  FROM pc JOIN cells ON pc.r = cells.r AND pc.bucket = cells.bucket
         |  GROUP BY 1),
         |exact AS (SELECT gram, count(*) AS exact_n FROM corpus GROUP BY 1)
         |SELECT est.gram, cast(est_n as bigint) AS est_n, cast(exact_n as bigint) AS exact_n
         |FROM est JOIN exact ON est.gram = exact.gram""".stripMargin
    )
  )

  // ---------------------------------------------------------------------
  // Histogram quantiles
  // ---------------------------------------------------------------------

  private val HistBucketWidth = 16
  private val HistBuckets = 64

  /** Token-length distribution per language from a fixed 64-bucket
    * histogram: one bounded-key aggregate (langs × 64), then quantiles
    * read from the cumulative counts with integer comparisons
    * (`unit·cum ≥ q·total` — no float quantile maths). The reported
    * quantile is the bucket's exclusive upper edge: the standard
    * equi-width-histogram answer, within one bucket width of exact. At
    * 100 TB this replaces `percentile()` whose per-group buffer is
    * corpus-sized; the histogram's state is 64 longs per language.
    */
  private val lengthHistogram = Q(
    "docs_length_histogram",
    (s, d) => {
      val tokens = size(split(coalesce(col("text"), lit("")), " "))
      val bucket = least(lit(HistBuckets - 1), (tokens.cast("long") / HistBucketWidth).cast("long")).as("bucket")
      val hist = docs(s, d)
        .select(col("lang"), bucket)
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("lang").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("n")).over(w))
        .withColumn("total", sum(col("n")).over(Window.partitionBy("lang")))
      def qEdge(num: Int, den: Int): Column =
        min(when(col("cum") * den >= col("total") * num, (col("bucket") + 1) * HistBucketWidth))
      cum
        .groupBy("lang")
        .agg(
          max(col("total")).as("n_docs"),
          qEdge(1, 2).as("p50_hi"),
          qEdge(9, 10).as("p90_hi"),
          qEdge(99, 100).as("p99_hi")
        )
    },
    Some(
      s"""WITH t AS (
         |  SELECT lang,
         |    least(${HistBuckets - 1}, len(string_split(coalesce(text, ''), ' ')) // $HistBucketWidth) AS bucket
         |  FROM documents),
         |hist AS (SELECT lang, bucket, count(*) AS n FROM t GROUP BY 1, 2),
         |c AS (
         |  SELECT lang, bucket, n,
         |    sum(n) OVER (PARTITION BY lang ORDER BY bucket
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    sum(n) OVER (PARTITION BY lang) AS total
         |  FROM hist)
         |SELECT lang, cast(max(total) as bigint) AS n_docs,
         |  min(CASE WHEN cum * 2 >= total * 1 THEN (bucket + 1) * $HistBucketWidth END) AS p50_hi,
         |  min(CASE WHEN cum * 10 >= total * 9 THEN (bucket + 1) * $HistBucketWidth END) AS p90_hi,
         |  min(CASE WHEN cum * 100 >= total * 99 THEN (bucket + 1) * $HistBucketWidth END) AS p99_hi
         |FROM c GROUP BY 1""".stripMargin
    )
  )

  // ---------------------------------------------------------------------
  // Cube statistics
  // ---------------------------------------------------------------------

  /** Corpus statistics at every (source, lang) granularity — per cell,
    * per source, per lang, and grand total — in ONE shuffle via
    * `CUBE`. The grouping level is derived from the coalesced sentinel
    * (the testdata columns are non-null, asserted upstream by
    * corpus_stats) rather than engine-specific `GROUPING_ID()` bit
    * orders, so both engines label levels identically.
    */
  private val statsCube = Q(
    "corpus_stats_cube",
    (s, d) => {
      val tokens = size(split(coalesce(col("text"), lit("")), " ")).cast("long")
      docs(s, d)
        .select(col("source"), col("lang"), tokens.as("tk"), col("n_chars"))
        .cube(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("tk")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars")
        )
        .select(
          coalesce(col("source"), lit("##all")).as("source"),
          coalesce(col("lang"), lit("##all")).as("lang"),
          (when(col("source").isNull, 2).otherwise(0) +
            when(col("lang").isNull, 1).otherwise(0)).cast("int").as("level"),
          col("n_docs"),
          col("n_tokens"),
          col("n_chars")
        )
    },
    Some(
      """SELECT coalesce(source, '##all') AS source,
        |  coalesce(lang, '##all') AS lang,
        |  cast((CASE WHEN source IS NULL THEN 2 ELSE 0 END) +
        |       (CASE WHEN lang IS NULL THEN 1 ELSE 0 END) as int) AS level,
        |  cast(count(*) as bigint) AS n_docs,
        |  cast(sum(len(string_split(coalesce(text, ''), ' '))) as bigint) AS n_tokens,
        |  cast(sum(n_chars) as bigint) AS n_chars
        |FROM documents
        |GROUP BY CUBE(source, lang)""".stripMargin
    )
  )

  // ---------------------------------------------------------------------
  // ANN recall evaluation
  // ---------------------------------------------------------------------

  private val RecallK = 5
  private val RecallPlaneSweep = Seq(4, 8)
  private val RecallQueries = 10

  /** Recall@k of the sign-LSH ANN path (the ann_lsh operator's bucketing)
    * against brute-force cosine ground truth, swept over the plane-count
    * knob — the eval every ANN deployment runs before trusting the
    * approximate path, and the one that picks the recall/candidate-cost
    * operating point (more planes → smaller buckets → cheaper candidate
    * join, lower recall). Ground truth is exact top-k over the full
    * corpus (affordable for the deliberately small eval sample; the
    * corpus side of the approximate path stays a bucketed equi-join);
    * the score joins the two top-k lists per query and reports the
    * overlap in exact per-mille units. Ranking ties break on neighbor id
    * after a 6-decimal score round on both engines — the same
    * determinism discipline as knn_cosine.
    */
  private val annRecallEval = Q(
    "ann_recall_eval",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val truth = AnnEval.truthTopK(emb, RecallQueries, RecallK)
      def evalPlanes(planes: Int): DataFrame = {
        val base = emb.select(
          col("vec_id"),
          col("embedding"),
          signLshBucket(col("embedding"), planes).as("bucket")
        )
        val queries = base
          .filter(col("vec_id") < RecallQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"), col("bucket").as("qbucket"))
        val approx = AnnEval
          .topK(
            base
              .join(queries, col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
              .select(
                col("query_id"),
                col("vec_id").as("neighbor_id"),
                round(cosine(col("qvec"), col("embedding")), 6).as("score")
              ),
            RecallK
          )
          .select(col("query_id"), col("neighbor_id").as("approx_id"))
        AnnEval
          .recallOf(truth, approx)
          .select(lit(planes).as("planes"), col("query_id"), col("k"), col("n_overlap"), col("recall_permille"))
      }
      RecallPlaneSweep.map(evalPlanes).reduce(_ unionByName _)
    },
    Some {
      def bucket(planes: Int) = AnnEval.duckBucket(planes)
      val perPlanes = RecallPlaneSweep
        .map { planes =>
          s"""(SELECT $planes AS planes, t.query_id, cast(count(*) as bigint) AS k,
             |  cast(count(a.approx_id) as bigint) AS n_overlap,
             |  cast(count(a.approx_id) * 1000 // count(*) as bigint) AS recall_permille
             |FROM truth t LEFT JOIN (
             |  SELECT query_id, neighbor_id AS approx_id FROM (
             |    SELECT q.query_id, e.vec_id AS neighbor_id,
             |      row_number() OVER (PARTITION BY q.query_id ORDER BY
             |        round(list_dot_product(q.qvec, e.vec) /
             |              (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
             |        e.vec_id) AS rank
             |    FROM b$planes e JOIN q$planes q ON e.bucket = q.bucket AND e.vec_id != q.query_id)
             |  WHERE rank <= $RecallK) a
             |  ON t.query_id = a.query_id AND t.neighbor_id = a.approx_id
             |GROUP BY 2)""".stripMargin
        }
        .mkString("\n|UNION ALL\n|".stripMargin)
      val buckets = RecallPlaneSweep
        .map { planes =>
          s"""b$planes AS (SELECT vec_id, cast(embedding as double[]) AS vec, ${bucket(planes)} AS bucket FROM embeddings),
             |q$planes AS (SELECT vec_id AS query_id, vec AS qvec, bucket FROM b$planes WHERE vec_id < $RecallQueries)""".stripMargin
        }
        .mkString(",\n")
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |$buckets,
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.vec, e.vec) /
         |              (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < $RecallQueries AND e.vec_id != q.vec_id)
         |  WHERE rank <= $RecallK)
         |$perPlanes""".stripMargin
    }
  )

  // ---------------------------------------------------------------------
  // HyperLogLog distinct sketch
  // ---------------------------------------------------------------------

  private[graft] val HllRegisters = 256 // p = 8 high bits of the 48-bit hash
  private val HllRestSpace = 1099511627776L // 2^40 (the remaining 40 bits)

  /** HLL register table over any (source, text) frame: register index
    * from the hash's top 8 bits, rank = leading zeros of the remaining
    * 40 bits + 1, register value = max rank (Flajolet et al. 2007,
    * "HyperLogLog: the analysis of a near-optimal cardinality
    * estimation algorithm"). Rank uses `41 - length(bin(rest))` — an
    * INTEGER bit-length, identical in Spark and DuckDB, so no float
    * log2 can disagree at exact powers of two. Bounded state: sources ×
    * 256 keys with map-side max combine; registers merge by elementwise
    * MAX (monotone — the same streaming law as the KMV minima).
    */
  private[graft] def hllRegisters(docsFrame: DataFrame): DataFrame =
    docsFrame
      .select(col("source"), hash48(coalesce(col("text"), lit(""))).as("h"))
      .select(
        col("source"),
        expr(s"h div ${HllRestSpace}L").as("reg"),
        (col("h") % HllRestSpace).as("rest")
      )
      .withColumn(
        "rank",
        when(col("rest") === 0, lit(41)).otherwise(lit(41) - length(bin(col("rest"))))
      )
      .groupBy("source", "reg")
      .agg(max(col("rank")).as("m"))

  /** Raw-HLL estimate in PURE INTEGER arithmetic, identical on both
    * engines: `alpha·m²/Z` with `Z = Σ 2^-Mj` over all m registers
    * (absent = rank 0). Scaling by 2^41 makes every term an exact long
    * — `Z·2^41 = Σ_occupied 2^(41-Mj) + zeroRegs·2^41` — so no float
    * summation order can disagree; alpha_256 ≈ 0.71828 enters as the
    * fixed rational 71828/100000 AFTER the division. Raw estimator only
    * (no linear-counting small-range branch) — documented deviation:
    * determinism across engines is the certified property, accuracy is
    * spec-asserted against the exact count. Headroom: the first
    * quotient is ≤ m²·2^41/denom; overflow would need nearly every
    * register at rank > 24 (cardinality ≳ 2^46) — beyond the 48-bit
    * hash's own collision range.
    */
  private val distinctHll = Q(
    // Per-source HLL cardinality + the ##all row built by MERGING the
    // per-source registers (elementwise max — no second corpus pass),
    // the same mergeability demonstration as corpus_distinct_kmv.
    "corpus_distinct_hll",
    (s, d) => {
      val stage1 = hllRegisters(docs(s, d).select(col("source"), col("text")))
      val merged = stage1
        .groupBy("reg")
        .agg(max(col("m")).as("m"))
        .select(lit("##all").as("source"), col("reg"), col("m"))
      val m = HllRegisters
      stage1
        .unionByName(merged)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_regs"),
          sum(expr("shiftleft(1L, 41 - m)")).as("z_occ")
        )
        .select(
          col("source"),
          col("n_regs").cast("long").as("n_regs"),
          expr(
            s"((${m.toLong * m}L * 2199023255552L) div " +
              s"(z_occ + (${m}L - n_regs) * 2199023255552L)) * 71828L div 100000L"
          ).as("est_distinct")
        )
    },
    Some {
      val m = HllRegisters
      s"""WITH h AS (
         |  SELECT source,
         |    ('0x' || substr(md5(coalesce(text, '')), 1, 12))::bigint AS h
         |  FROM documents),
         |r AS (
         |  SELECT source, h // $HllRestSpace AS reg, h % $HllRestSpace AS rest FROM h),
         |rk AS (
         |  SELECT source, reg,
         |    (CASE WHEN rest = 0 THEN 41 ELSE 41 - length(bin(rest)) END) AS rank
         |  FROM r),
         |s1s AS (SELECT source, reg, max(rank) AS m FROM rk GROUP BY 1, 2),
         |s1 AS (
         |  SELECT * FROM s1s
         |  UNION ALL
         |  SELECT '##all' AS source, reg, max(m) AS m FROM s1s GROUP BY 2),
         |s2 AS (
         |  SELECT source, count(*) AS n_regs,
         |    sum(cast(1 as bigint) << (41 - m)) AS z_occ
         |  FROM s1 GROUP BY 1)
         |SELECT source, cast(n_regs as bigint) AS n_regs,
         |  cast(((${m.toLong * m} * 2199023255552) //
         |        (z_occ + ($m - n_regs) * 2199023255552)) * 71828 // 100000 as bigint) AS est_distinct
         |FROM s2""".stripMargin
    }
  )

  /** Windowed distinct-user counting via mergeable HLL registers — the
    * "daily active users, rolled up without recount" shape every event
    * pipeline needs. Exact per-window `COUNT(DISTINCT user)` shuffles
    * every id per window; the sketch keys a bounded aggregation by
    * (event_type, day, register) — types × days × 256 rows — and the
    * all-time row per type is an ELEMENTWISE MAX merge of the daily
    * registers, no second pass over the stream (exactly how a
    * streaming job maintains DAU/WAU/MAU from one register store).
    * Same raw integer estimator as `corpus_distinct_hll`.
    */
  private val eventsDistinctHll = Q(
    "events_distinct_users_hll",
    (s, d) => {
      val frame = Tables
        .events(s, d)
        .select(
          concat(
            col("event_type"),
            lit("|"),
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          ).as("source"),
          col("user_id").cast("string").as("text")
        )
      val stage1 = hllRegisters(frame)
      val merged = stage1
        .withColumn("et", element_at(split(col("source"), "\\|"), 1))
        .groupBy("et", "reg")
        .agg(max(col("m")).as("m"))
        .select(concat(col("et"), lit("|##all")).as("source"), col("reg"), col("m"))
      val m = HllRegisters
      stage1
        .unionByName(merged)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_regs"),
          sum(expr("shiftleft(1L, 41 - m)")).as("z_occ")
        )
        .select(
          element_at(split(col("source"), "\\|"), 1).as("event_type"),
          element_at(split(col("source"), "\\|"), 2).as("day"),
          col("n_regs").cast("long").as("n_regs"),
          expr(
            s"((${m.toLong * m}L * 2199023255552L) div " +
              s"(z_occ + (${m}L - n_regs) * 2199023255552L)) * 71828L div 100000L"
          ).as("est_distinct")
        )
    },
    Some {
      val m = HllRegisters
      s"""WITH h AS (
         |  SELECT event_type || '|' || strftime(date_trunc('day', ts), '%Y-%m-%d') AS source,
         |    ('0x' || substr(md5(cast(user_id as varchar)), 1, 12))::bigint AS h
         |  FROM events),
         |r AS (
         |  SELECT source, h // $HllRestSpace AS reg, h % $HllRestSpace AS rest FROM h),
         |rk AS (
         |  SELECT source, reg,
         |    (CASE WHEN rest = 0 THEN 41 ELSE 41 - length(bin(rest)) END) AS rank
         |  FROM r),
         |s1s AS (SELECT source, reg, max(rank) AS m FROM rk GROUP BY 1, 2),
         |s1 AS (
         |  SELECT * FROM s1s
         |  UNION ALL
         |  SELECT et || '|##all' AS source, reg, m FROM (
         |    SELECT string_split(source, '|')[1] AS et, reg, max(m) AS m
         |    FROM s1s GROUP BY 1, 2) _mg),
         |s2 AS (
         |  SELECT source, count(*) AS n_regs,
         |    sum(cast(1 as bigint) << (41 - m)) AS z_occ
         |  FROM s1 GROUP BY 1)
         |SELECT string_split(source, '|')[1] AS event_type,
         |  string_split(source, '|')[2] AS day,
         |  cast(n_regs as bigint) AS n_regs,
         |  cast(((${m.toLong * m} * 2199023255552) //
         |        (z_occ + ($m - n_regs) * 2199023255552)) * 71828 // 100000 as bigint) AS est_distinct
         |FROM s2""".stripMargin
    }
  )

  val all: Seq[Q] =
    Seq(distinctKmv, distinctHll, ngramCms, lengthHistogram, statsCube, annRecallEval, eventsDistinctHll)
}
