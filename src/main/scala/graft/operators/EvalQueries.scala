package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Operator-quality evaluations — measuring the engine's own heuristic
  * operators against ground truth the corpus carries:
  *
  *   - `docs_langid_confusion`: the language-ID heuristic's confusion
  *     matrix against the labeled `lang` column, plus per-true-language
  *     accuracy — the table that decides whether the stopword sets need
  *     another language before anyone trusts `docs_langid` gating.
  *   - `docs_dedup_eval`: precision/recall of the LSH+Jaccard near-dup
  *     pair detection against the corpus's INJECTED duplicate pairs
  *     (`+100000` verbatim, `+200000` tail-append — constructed labels,
  *     so the measurement is exact). The eval that sizes recall lost to
  *     banding before a 100 TB dedup run is trusted.
  *
  * Both reduce to bounded aggregates (languages², one row); integer
  * per-mille metrics.
  */
object EvalQueries {

  private val langidConfusion = Q(
    "docs_langid_confusion",
    (s, d) =>
      Tables
        .documents(s, d)
        .select(col("lang").as("true_lang"), languageId(col("text")).as("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(count(lit(1)).as("n")),
    Some {
      // The docs_langid oracle's shared prediction expression, aggregated
      // to the matrix.
      val (maxExpr, chain) = LlmQueries.langidPredDuck
      s"""WITH t AS (SELECT lang, text, $maxExpr AS mx FROM documents)
         |SELECT lang AS true_lang, (CASE $chain ELSE 'und' END) AS pred_lang,
         |  cast(count(*) as bigint) AS n
         |FROM t GROUP BY 1, 2""".stripMargin
    }
  )

  private val dedupEval = Q(
    "docs_dedup_eval",
    (s, d) =>
      // Labeled truth: every injected near-copy forms exactly one
      // expected pair with its base document. Shares expectedPairs /
      // pairMetrics with the multiprobe eval (one definition of the
      // ground truth and of the scalar-assembly idiom — the metrics
      // join rides a NON-foldable constant key, `c − c + 1`, because a
      // literal key constant-folds away and Catalyst plans a
      // nested-loop cross, tripping PlanSpec's BNLJ guard).
      pairMetrics(
        "banded",
        LlmQueries.minhashPairsOf(LlmQueries.corpus(s, d)),
        expectedPairs(s, d)
      ).drop("variant"),
    Some(
      s"""WITH ${LlmQueries.CorpusSql}, ${LlmQueries.SigSql},
         |expected AS (
         |  SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id, doc_id + 200000 FROM documents WHERE doc_id % 10 = 5),
         |agg AS (
         |  SELECT
         |    (SELECT count(*) FROM expected) AS n_expected,
         |    (SELECT count(*) FROM pairs) AS n_found,
         |    (SELECT count(*) FROM pairs p JOIN expected e
         |       ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b) AS n_hit)
         |SELECT cast(n_expected as bigint) AS n_expected,
         |  cast(n_found as bigint) AS n_found,
         |  cast(n_hit as bigint) AS n_hit,
         |  cast((n_hit * 1000) // n_expected as bigint) AS recall_permille,
         |  cast((n_hit * 1000) // n_found as bigint) AS precision_permille
         |FROM agg""".stripMargin
    )
  )

  private def expectedPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = Tables.documents(s, d).select(col("doc_id"))
    base
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 100000).as("doc_b"))
      .unionByName(
        base
          .filter(col("doc_id") % 10 === 5)
          .select(col("doc_id").as("doc_a"), (col("doc_id") + 200000).as("doc_b"))
      )
  }

  private def pairMetrics(
      variant: String,
      found: org.apache.spark.sql.DataFrame,
      expected: org.apache.spark.sql.DataFrame
  ) = {
    val hit = found.join(expected, Seq("doc_a", "doc_b"))
    def keyed(df: org.apache.spark.sql.DataFrame, c: String) =
      df.withColumn("j", (col(c) - col(c) + 1).cast("int"))
    keyed(expected.agg(count(lit(1)).as("n_expected")), "n_expected")
      .join(keyed(found.agg(count(lit(1)).as("n_found")), "n_found"), Seq("j"))
      .join(keyed(hit.agg(count(lit(1)).as("n_hit")), "n_hit"), Seq("j"))
      .select(
        lit(variant).as("variant"),
        col("n_expected"),
        col("n_found"),
        col("n_hit"),
        expr("(n_hit * 1000) div n_expected").as("recall_permille"),
        expr("(n_hit * 1000) div n_found").as("precision_permille")
      )
  }

  private val dedupEvalMultiprobe = Q(
    // The banded baseline vs the drop-one-row multi-probe candidate set
    // over the same injected ground truth: two rows, one per variant —
    // the certified recall-vs-precision trade of probing the partial-key
    // lattice (lshProbeBands). The oracle rebuilds BOTH candidate sets
    // from the shared signature CTE, so the lift number itself is
    // hash-checked, not just spec-asserted.
    "docs_dedup_eval_multiprobe",
    (s, d) => {
      val expected = expectedPairs(s, d)
      val corpus = LlmQueries.corpus(s, d)
      pairMetrics("banded", LlmQueries.minhashPairsOf(corpus), expected)
        .unionByName(
          pairMetrics("multiprobe", LlmQueries.minhashProbePairsOf(corpus), expected)
        )
    },
    Some {
      val bands = graft.operators.LlmQueries.Bands
      val rows = graft.operators.LlmQueries.Rows
      val partial = (for { b <- 0 until bands; r <- 0 until rows } yield {
        val parts = (0 until rows)
          .filter(_ != r)
          .map(q => s"cast(sig[${b * rows + q + 1}] as varchar)")
          .mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band_id, $r AS drop_pos, md5($parts) AS p_hash FROM sg"
      }).mkString(" UNION ALL ")
      s"""WITH ${LlmQueries.CorpusSql}, ${LlmQueries.SigSql},
         |expected AS (
         |  SELECT doc_id AS doc_a, doc_id + 100000 AS doc_b FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL
         |  SELECT doc_id, doc_id + 200000 FROM documents WHERE doc_id % 10 = 5),
         |pb AS ($partial),
         |ppairs AS (
         |  SELECT b1.doc_id AS doc_a, b2.doc_id AS doc_b
         |  FROM pb b1 JOIN pb b2
         |    ON b1.band_id = b2.band_id AND b1.drop_pos = b2.drop_pos
         |    AND b1.p_hash = b2.p_hash AND b1.doc_id < b2.doc_id
         |  GROUP BY 1, 2),
         |m1 AS (
         |  SELECT 'banded' AS variant,
         |    (SELECT count(*) FROM expected) AS n_expected,
         |    (SELECT count(*) FROM pairs) AS n_found,
         |    (SELECT count(*) FROM pairs p JOIN expected e
         |       ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b) AS n_hit),
         |m2 AS (
         |  SELECT 'multiprobe' AS variant,
         |    (SELECT count(*) FROM expected) AS n_expected,
         |    (SELECT count(*) FROM ppairs) AS n_found,
         |    (SELECT count(*) FROM ppairs p JOIN expected e
         |       ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b) AS n_hit),
         |m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
         |SELECT variant, cast(n_expected as bigint) AS n_expected,
         |  cast(n_found as bigint) AS n_found,
         |  cast(n_hit as bigint) AS n_hit,
         |  cast((n_hit * 1000) // n_expected as bigint) AS recall_permille,
         |  cast((n_hit * 1000) // n_found as bigint) AS precision_permille
         |FROM m""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(langidConfusion, dedupEval, dedupEvalMultiprobe)
}
