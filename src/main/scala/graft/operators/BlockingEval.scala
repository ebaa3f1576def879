package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-quality evaluation for the dedup pipeline — the record-
  * linkage literature's standard diagnostics (reduction ratio and
  * per-blocking-key precision; Christen 2012's survey of indexing
  * techniques) computed over the SAME blocking and match predicate the
  * production dedup runs (reference DedupHandler.php's title-key + ISBN
  * blocks). Per block kind:
  *
  *   - `n_keys` — distinct usable (non-empty, non-heavy) blocking keys;
  *   - `n_candidates` — cross-source candidate pairs the kind generates,
  *     computed WITHOUT materializing a single pair: Σ over keys of
  *     Σ_{s<t} n_s·n_t from the bounded (kind, key, source) count table
  *     — the statistic every blocking tuner needs at 100 TB, where
  *     counting by pair enumeration would be the very quadratic the
  *     blocks exist to avoid;
  *   - `n_matches` — candidates that pass the full matchRecords veto
  *     chain (pair-materialized, but only within capped blocks — the
  *     production edge derivation's own cost envelope);
  *   - `precision_pm` — matches per candidate, exact integer permyriad;
  *   - `reduction_pm` — 10000·(1 − candidates/total cross-source pairs):
  *     how much of the all-pairs quadratic the blocking avoids, with the
  *     total likewise computed from per-source record counts only.
  *
  * The heavy-block cap (MaxBlockSize, broadcast anti-join) is applied
  * before BOTH counts, so the eval describes exactly the candidate set
  * the production path scores.
  */
object BlockingEval {

  /** Eval rows of any keyed record frame (withKeys output) — factored
    * for specs.
    */
  def evalOf(keyed: DataFrame): DataFrame = {
    val ex = Dedup.explodeBlockKeys(keyed)
    val heavy = ex
      .groupBy(col("__block_kind").as("__heavy_kind"), col("__block_key").as("__heavy_key"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > Dedup.MaxBlockSize)
      .drop("__n")
    val capped = ex
      .join(
        broadcast(heavy),
        col("__block_kind") === col("__heavy_kind") && col("__block_key") === col("__heavy_key"),
        "left_anti"
      )
      .persist()

    // Candidate counts from the bounded (kind, key, source) table.
    val perSrc = capped
      .groupBy("__block_kind", "__block_key", "source_id")
      .agg(count(lit(1)).as("n"))
    val cand = perSrc
      .select(col("__block_kind"), col("__block_key"), col("source_id").as("s1"), col("n").as("n1"))
      .join(
        perSrc.select(
          col("__block_kind"),
          col("__block_key"),
          col("source_id").as("s2"),
          col("n").as("n2")
        ),
        Seq("__block_kind", "__block_key")
      )
      .filter(col("s1") < col("s2"))
      .groupBy("__block_kind")
      .agg(sum(col("n1") * col("n2")).as("n_candidates"))
    val nkeys = capped
      .select(col("__block_kind"), col("__block_key"))
      .distinct()
      .groupBy("__block_kind")
      .agg(count(lit(1)).as("n_keys"))

    // Matched pairs per kind: the production pair join + veto chain,
    // kind retained (each record carries ONE key per kind, so a pair
    // appears at most once per kind — no distinct needed).
    val left = capped.columns.foldLeft(capped)((d, c) => d.withColumnRenamed(c, c + "_1"))
    val right = capped.columns.foldLeft(capped)((d, c) => d.withColumnRenamed(c, c + "_2"))
    val matches = left
      .join(
        right,
        col("__block_kind_1") === col("__block_kind_2") &&
          col("__block_key_1") === col("__block_key_2") &&
          col("source_id_1") =!= col("source_id_2") &&
          col("id_1") < col("id_2")
      )
      .filter(Dedup.matchPredicate)
      .groupBy(col("__block_kind_1").as("__block_kind"))
      .agg(count(lit(1)).as("n_matches"))

    // Total cross-source pairs from per-source record counts alone.
    val bySrc = keyed.groupBy("source_id").agg(count(lit(1)).as("n"))
    val total = bySrc
      .select(col("source_id").as("s1"), col("n").as("n1"))
      .join(bySrc.select(col("source_id").as("s2"), col("n").as("n2")), col("s1") < col("s2"))
      .agg(sum(col("n1") * col("n2")).as("total_pairs"))

    cand
      .join(nkeys, Seq("__block_kind"))
      .join(matches, Seq("__block_kind"), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
      .withColumn("j", (col("n_keys") - col("n_keys") + 1).cast("int"))
      .join(
        broadcast(
          total.select((col("total_pairs") - col("total_pairs") + 1).cast("int").as("j"), col("total_pairs"))
        ),
        Seq("j")
      )
      .select(
        col("__block_kind").as("kind"),
        col("n_keys"),
        col("n_candidates"),
        col("n_matches"),
        expr("n_matches * 10000 div n_candidates").as("precision_pm"),
        expr("10000 - n_candidates * 10000 div total_pairs").as("reduction_pm")
      )
  }

  private val evalQ = Q(
    "dedup_blocking_eval",
    (s, d) => evalOf(Dedup.withKeys(DedupQueries.records(s, d))),
    Some {
      s"""WITH ${DedupQueries.recordsSql},
         |ex AS (
         |  SELECT id, source_id, 't' AS kind, title_key AS key FROM recs WHERE title_key != ''
         |  UNION ALL
         |  SELECT id, source_id, 'i' AS kind, isbn_key AS key FROM recs WHERE isbn_key != ''),
         |heavy AS (SELECT kind, key FROM ex GROUP BY 1, 2 HAVING count(*) > ${Dedup.MaxBlockSize}),
         |capped AS (SELECT ex.* FROM ex ANTI JOIN heavy USING (kind, key)),
         |persrc AS (SELECT kind, key, source_id, count(*) AS n FROM capped GROUP BY 1, 2, 3),
         |cand AS (
         |  SELECT c1.kind, cast(sum(c1.n * c2.n) AS bigint) AS n_candidates
         |  FROM persrc c1 JOIN persrc c2
         |    ON c1.kind = c2.kind AND c1.key = c2.key AND c1.source_id < c2.source_id
         |  GROUP BY 1),
         |nkeys AS (SELECT kind, count(DISTINCT key) AS n_keys FROM capped GROUP BY 1),
         |m AS (
         |  SELECT e1.kind, count(*) AS n_matches
         |  FROM capped e1
         |  JOIN capped e2 ON e1.kind = e2.kind AND e1.key = e2.key
         |    AND e1.source_id != e2.source_id AND e1.id < e2.id
         |  JOIN recs r1 ON r1.id = e1.id
         |  JOIN recs r2 ON r2.id = e2.id
         |  WHERE ${DedupQueries.matchSql}
         |  GROUP BY 1),
         |tot AS (
         |  SELECT cast(sum(s1.n * s2.n) AS bigint) AS total_pairs FROM
         |    (SELECT source_id, count(*) AS n FROM recs GROUP BY 1) s1
         |    JOIN (SELECT source_id, count(*) AS n FROM recs GROUP BY 1) s2
         |    ON s1.source_id < s2.source_id)
         |SELECT cand.kind, cast(n_keys AS bigint) AS n_keys, n_candidates,
         |  cast(coalesce(n_matches, 0) AS bigint) AS n_matches,
         |  coalesce(n_matches, 0) * 10000 // n_candidates AS precision_pm,
         |  10000 - n_candidates * 10000 // total_pairs AS reduction_pm
         |FROM cand
         |JOIN nkeys ON cand.kind = nkeys.kind
         |LEFT JOIN m ON cand.kind = m.kind
         |CROSS JOIN tot""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(evalQ)
}
