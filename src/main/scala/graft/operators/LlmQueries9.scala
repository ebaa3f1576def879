package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model quality scoring — the perplexity-proxy
  * filter (CCNet / Gopher style) that ranks documents by how "ordinary"
  * their word sequences are under a model trained on the corpus itself.
  * No counterpart in the reference (RecordManager has no free-text
  * corpus modeling); this is part of the LLM-pipeline surface the north
  * star requires.
  *
  * Model: corpus-wide unigram counts c(w) and bigram counts c(w1 w2)
  * over the shared `words` tokenization, vocabulary size V, Laplace
  * bigram probability P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Per
  * document: avg log P over its bigrams (higher = more typical text),
  * its bigram count, and the fraction of tokens whose corpus frequency
  * is 1 (hapax/rare ratio — a cheap OOV stand-in). A real pipeline
  * thresholds on these columns (or buckets them for stratified
  * sampling); the score columns are rounded to 4 decimals so the DuckDB
  * oracle compares exactly.
  *
  * Scale shape: two word-count aggregations (unigram, bigram) — the
  * canonical map-side-combined shuffles — then fact-to-dimension
  * equi-joins from the exploded bigrams/tokens to those count tables and
  * one per-doc aggregate. V is a 1-row aggregate broadcast by crossJoin.
  * Nothing is ever all-pairs and no key exceeds corpus-distinct-token
  * cardinality, so the plan survives 100 TB; hot heads (stopword
  * bigrams) are N:1 join keys, which Spark handles without skew blowup
  * because the dimension side is unique per key. In a production run the
  * count tables are the trained model: persist (or write) `uni` and the
  * bigram counts once and reuse them across scoring passes — the
  * single-expression form here recomputes them per branch so the oracle
  * stays a pure function of the input.
  */
object LlmQueries9 {

  /** PMI collocation mining (Church & Hanks 1990): pointwise mutual
    * information ln(P(w1,w2) / (P(w1)·P(w2))) over the corpus bigram
    * table, thresholded on count (noise floor — PMI is notoriously
    * unstable below ~5 observations) and on PMI itself, so the output
    * is the collocation lexicon, not the bigram table. Scale shape:
    * the same two map-side-combined count aggregations as the LM
    * scorer, two word-keyed equi-joins (w1, w2) into the bigram facts,
    * a broadcast 1-row totals join, then a MAP-ONLY formula + filter —
    * no window, no corpus re-shuffle. The log argument is assembled in
    * one fixed-order double expression so both engines evaluate
    * bit-identically before the 4-dp round.
    */
  private val pmiQ = Q(
    "docs_pmi_collocations",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), words(col("text")).as("ws"))
      val uni = toks
        .select(explode(col("ws")).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("cu"))
      val totals = uni.agg(sum(col("cu")).as("t"))
      val bg = toks
        .filter(size(col("ws")) >= 2)
        .select(
          explode(
            zip_with(
              slice(col("ws"), lit(1), size(col("ws")) - 1),
              slice(col("ws"), lit(2), size(col("ws")) - 1),
              (a, b) => concat(a, lit(" "), b)
            )
          ).as("bg")
        )
      // One bigram aggregation serves both: the total comes from the
      // count table (a second `bg.agg` would re-tokenize the corpus).
      val bcAll = bg.groupBy("bg").agg(count(lit(1)).as("cb"))
      val bgCounts = bcAll.filter(col("cb") >= 5)
      val btot = bcAll.agg(sum(col("cb")).as("b"))
      bgCounts
        .withColumn("w1", element_at(split(col("bg"), " "), 1))
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
        .join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"))
        .withColumn("j", (col("cb") - col("cb") + 1).cast("int"))
        // The two 1-row totals combine through the same non-foldable
        // hash key (a bare crossJoin would plan the one
        // BroadcastNestedLoopJoin the plan suite reserves for knn).
        .join(
          broadcast(
            totals
              .select((col("t") - col("t") + 1).cast("int").as("j"), col("t"))
              .join(
                btot.select((col("b") - col("b") + 1).cast("int").as("j"), col("b")),
                Seq("j")
              )
          ),
          Seq("j")
        )
        .select(
          col("w1"),
          col("w2"),
          col("cb").as("n"),
          round(
            log(
              col("cb").cast("double") * col("t") * col("t") /
                (col("b").cast("double") * col("cu1") * col("cu2"))
            ),
            4
          ).as("pmi")
        )
        .filter(col("pmi") >= 0.1)
    },
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |u AS (SELECT w, count(*) AS cu FROM (SELECT unnest(ws) AS w FROM toks) _t GROUP BY w),
         |t AS (SELECT sum(cu) AS t FROM u),
         |bgl AS (
         |  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
         |  FROM toks WHERE len(ws) >= 2),
         |btot AS (SELECT count(*) AS b FROM bgl),
         |bc AS (SELECT bg, count(*) AS cb FROM bgl GROUP BY bg HAVING count(*) >= 5),
         |p AS (
         |  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2, cb,
         |    round(ln(cast(cb AS double) * t.t * t.t /
         |      (cast(btot.b AS double) * u1.cu * u2.cu)), 4) AS pmi
         |  FROM bc
         |  JOIN u u1 ON string_split(bc.bg, ' ')[1] = u1.w
         |  JOIN u u2 ON string_split(bc.bg, ' ')[2] = u2.w
         |  CROSS JOIN t CROSS JOIN btot)
         |SELECT w1, w2, cb AS n, pmi FROM p WHERE pmi >= 0.1""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(
    pmiQ,
    Q(
      "docs_lm_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = docs.select(col("doc_id"), words(col("text")).as("ws"))

        val uni = toks
          .select(explode(col("ws")).as("w"))
          .groupBy("w")
          .agg(count(lit(1)).as("cu"))
        val vocab = uni.agg(count(lit(1)).as("v"))

        val bg = toks
          .filter(size(col("ws")) >= 2)
          .select(
            col("doc_id"),
            explode(
              zip_with(
                slice(col("ws"), lit(1), size(col("ws")) - 1),
                slice(col("ws"), lit(2), size(col("ws")) - 1),
                (a, b) => concat(a, lit(" "), b)
              )
            ).as("bg")
          )
        val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("cb"))

        val scored = bg
          .join(bgCounts, Seq("bg"))
          .withColumn("w1", element_at(split(col("bg"), " "), 1))
          .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
          // 1-row dimension via a broadcast HASH join on a computed key (a
          // literal key folds away and a bare crossJoin plans the
          // BroadcastNestedLoopJoin the plan suite reserves for the knn
          // baseline; `x - x + 1` stays non-foldable).
          .withColumn("j", (col("cu") - col("cu") + 1).cast("int"))
          .join(
            broadcast(vocab.select((col("v") - col("v") + 1).cast("int").as("j"), col("v"))),
            Seq("j")
          )
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            round(avg(log((col("cb") + lit(1.0)) / (col("cu") + col("v")))), 4)
              .as("avg_logprob")
          )

        val rare = toks
          .select(col("doc_id"), explode(col("ws")).as("w"))
          .join(uni, Seq("w"))
          .groupBy("doc_id")
          .agg(
            round(avg(when(col("cu") <= 1, 1.0).otherwise(0.0)), 4).as("rare_ratio")
          )

        docs
          .select("doc_id")
          .join(scored, Seq("doc_id"), "left")
          .join(rare, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("avg_logprob"), lit(0.0)).as("avg_logprob"),
            coalesce(col("rare_ratio"), lit(0.0)).as("rare_ratio")
          )
      },
      Some {
        val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        s"""WITH toks AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
           |u AS (SELECT w, count(*) AS cu FROM (SELECT unnest(ws) AS w FROM toks) _t GROUP BY w),
           |v AS (SELECT count(*) AS v FROM u),
           |bgl AS (
           |  SELECT doc_id,
           |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
           |  FROM toks WHERE len(ws) >= 2),
           |b AS (SELECT bg, count(*) AS cb FROM bgl GROUP BY bg),
           |scored AS (
           |  SELECT doc_id, count(*) AS n_bigrams,
           |    round(avg(ln((cb + 1.0) / (cu + v.v))) , 4) AS avg_logprob
           |  FROM bgl
           |  JOIN b USING (bg)
           |  JOIN u ON string_split(bgl.bg, ' ')[1] = u.w
           |  CROSS JOIN v
           |  GROUP BY doc_id),
           |rare AS (
           |  SELECT doc_id,
           |    round(avg(CASE WHEN cu <= 1 THEN 1.0 ELSE 0.0 END), 4) AS rare_ratio
           |  FROM (SELECT doc_id, unnest(ws) AS w FROM toks) _w
           |  JOIN u USING (w)
           |  GROUP BY doc_id)
           |SELECT d.doc_id,
           |  coalesce(scored.n_bigrams, 0) AS n_bigrams,
           |  coalesce(scored.avg_logprob, 0.0) AS avg_logprob,
           |  coalesce(rare.rare_ratio, 0.0) AS rare_ratio
           |FROM documents d
           |LEFT JOIN scored ON d.doc_id = scored.doc_id
           |LEFT JOIN rare ON d.doc_id = rare.doc_id""".stripMargin
      }
    ),
    // BPE merge-pair counting — the inner kernel of tokenizer training
    // (one merge iteration = "count adjacent symbol pairs over the corpus,
    // weighted by word frequency; merge the argmax"). Distributed shape:
    // word-frequency aggregation (map-side-combined shuffle on a
    // vocabulary-bounded key) → per-DISTINCT-word pair explosion (pair
    // work is O(vocab), not O(corpus) — the crucial trick at 100 TB) →
    // pair aggregation on a tiny key space (≤ alphabet² for the first
    // iteration). Driving the full merge loop re-runs this plan with the
    // merge table applied; the counting kernel is the expensive part.
    Q(
      "docs_bpe_pairs",
      (s, d) => {
        val wf = Tables
          .documents(s, d)
          .select(explode(words(col("text"))).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy("w")
          .agg(count(lit(1)).as("f"))
        wf.select(
            col("w"),
            col("f"),
            explode(
              transform(sequence(lit(1), length(col("w")) - 1), i => col("w").substr(i, lit(2)))
            ).as("pair")
          )
          .groupBy("pair")
          .agg(sum("f").as("n_occ"), countDistinct("w").as("n_words"))
          .filter(col("n_occ") >= 5)
          .select(col("pair"), col("n_occ"), col("n_words").cast("long").as("n_words"))
      },
      Some {
        val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
        s"""WITH toks AS (SELECT string_split($norm, ' ') AS ws FROM documents),
           |wf AS (
           |  SELECT w, count(*) AS f
           |  FROM (SELECT unnest(ws) AS w FROM toks) _t
           |  WHERE length(w) >= 2 GROUP BY w),
           |p AS (
           |  SELECT w, f, unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
           |  FROM wf)
           |SELECT pair, cast(sum(f) as bigint) AS n_occ, cast(count(distinct w) as bigint) AS n_words
           |FROM p GROUP BY pair HAVING sum(f) >= 5""".stripMargin
      }
    ),
    // k-means Lloyd iteration over the embedding corpus — the training
    // kernel behind a real IVF index (ann_ivf routes by fixed hash
    // projections; production IVF routes by trained centroids, and this
    // is the step that trains them). Shape: K seed centroids collected
    // into one broadcast row (constant-key hash join — never a
    // nested-loop), per-row argmin over the K centroids (sequential
    // double math, deterministic), then posexplode + groupBy(cell, dim)
    // — a K×D-key aggregate (256 keys here) that is ~pure map-side
    // combine at any corpus size. The output carries exact integer
    // micro-unit sums and counts per (cell, dim): new centroid =
    // s_micro/(1e6*n), computed by the caller so the loop can also
    // weight or damp updates; re-running the plan with the output as
    // seeds is the full Lloyd loop.
    Q(
      "embed_kmeans_step",
      (s, d) => {
        val emb = Tables
          .embeddings(s, d)
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        // Seed centroids: the first K vectors (deterministic, like the
        // oracle); a production run seeds from a sample or a prior model.
        val seeds = emb.filter(col("id") < 4).select(col("id").as("cell"), col("vec").as("cv"))
        KMeans.step(emb, seeds)
      },
      Some {
        s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
           |c AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 4),
           |d AS (SELECT e.vec_id, c.cell,
           |    list_sum(list_transform(range(1, len(e.v) + 1),
           |      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) AS dist
           |  FROM e CROSS JOIN c),
           |a AS (SELECT vec_id, cell,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
           |  FROM d),
           |asn AS (SELECT vec_id, cell FROM a WHERE rn = 1),
           |x AS (SELECT asn.cell, unnest(range(1, len(e.v) + 1)) AS dim,
           |    unnest(e.v) AS x
           |  FROM asn JOIN e USING (vec_id))
           |SELECT cell, cast(dim as bigint) AS dim, cast(count(*) as bigint) AS n,
           |  cast(sum(cast(round(x * 1e6) as bigint)) as bigint) AS s_micro
           |FROM x GROUP BY cell, dim""".stripMargin
      }
    )
  )
}
