package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.fingerprintHashes
import org.apache.spark.sql.functions._

/** Bloom-filter prefiltered decontamination — the no-shuffle membership
  * shape for benchmark decontamination at 100 TB.
  *
  * `docs_contamination` meets corpus and benchmark fingerprints in a
  * broadcast equi-join; that broadcasts the benchmark's full hash SET.
  * This variant builds Spark's bloom sketch over the benchmark hashes
  * (`graft_bloom_agg`, the engine's own BloomFilterAggregate surfaced
  * through GraftExtensions), ships it as ONE scalar-subquery constant
  * (bits, not rows — the same shape Spark's runtime row filters use),
  * and prefilters the corpus with `graft_might_contain` BEFORE the
  * exact verification join. Bloom filters have no false negatives, so
  * the exact verify of the survivors reproduces the precise join result
  * — which is why the DuckDB oracle is a plain join and the bloom stage
  * is invisible to correctness while cutting the join input by the
  * filter's rejection rate at scale.
  */
object BloomQueries {

  val all: Seq[Q] = Seq(
    Q(
      "docs_bloom_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs
          .select(
            col("doc_id"),
            explode(array_distinct(fingerprintHashes(col("text"), 8))).as("h")
          )
          .withColumn("hh", xxhash64(col("h")))
          .createOrReplaceTempView("graft_bloom_hashes")
        docs.select("doc_id").createOrReplaceTempView("graft_bloom_docs")
        s.sql(
          """WITH bench AS (SELECT hh, h FROM graft_bloom_hashes WHERE doc_id < 10),
            |bf AS (SELECT graft_bloom_agg(hh, cast(10000 as bigint)) AS bf FROM bench),
            |pre AS (
            |  SELECT c.doc_id, c.h FROM graft_bloom_hashes c
            |  WHERE c.doc_id >= 10 AND graft_might_contain((SELECT bf FROM bf), c.hh)),
            |hits AS (
            |  SELECT pre.doc_id, count(*) AS shared_windows
            |  FROM pre JOIN (SELECT DISTINCT h FROM bench) b ON pre.h = b.h
            |  GROUP BY pre.doc_id)
            |SELECT d.doc_id,
            |  coalesce(hits.shared_windows, cast(0 as bigint)) AS shared_windows,
            |  coalesce(hits.shared_windows, cast(0 as bigint)) > 0 AS contaminated
            |FROM graft_bloom_docs d LEFT JOIN hits ON d.doc_id = hits.doc_id
            |WHERE d.doc_id >= 10""".stripMargin
        )
      },
      // Shared oracle: the bloom stage must be invisible to results, so
      // this certifies against the SAME SQL as docs_contamination.
      Some(LlmQueries4.ContaminationOracleSql)
    )
  )
}
