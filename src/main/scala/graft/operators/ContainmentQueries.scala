package graft.operators

import graft.Q
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Asymmetric containment scoring over the LSH candidate pairs —
  * `C(A,B) = |A∩B| / |A|` (Broder 1997 distinguishes containment from
  * the resemblance `docs_jaccard_pairs` measures): a short document
  * quoted whole inside a long one has high containment but LOW Jaccard,
  * so a resemblance-only dedup keeps the engulfed copy. This is the
  * quote/boilerplate-inclusion detector; `engulfed` flags pairs where
  * either side is ≥90% inside the other. Scores in exact integer
  * micro-units (integer division), riding the already-capped candidate
  * join — no new shuffle shape.
  */
object ContainmentQueries {

  private val containmentPairs = Q(
    "docs_containment_pairs",
    (s, d) => {
      val wordSets = LlmQueries
        .corpus(s, d)
        .select(col("doc_id"), array_distinct(words(col("text"))).as("wset"))
      LlmQueries
        .minhashPairsOf(LlmQueries.corpus(s, d))
        .join(wordSets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("wset", "wa"), Seq("doc_a"))
        .join(wordSets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("wset", "wb"), Seq("doc_b"))
        .select(
          col("doc_a"),
          col("doc_b"),
          size(array_intersect(col("wa"), col("wb"))).cast("long").as("n_inter"),
          size(col("wa")).cast("long").as("n_a"),
          size(col("wb")).cast("long").as("n_b")
        )
        .select(
          col("doc_a"),
          col("doc_b"),
          col("n_inter"),
          col("n_a"),
          col("n_b"),
          expr("(n_inter * 1000000) div n_a").as("cont_a_micro"),
          expr("(n_inter * 1000000) div n_b").as("cont_b_micro"),
          (greatest(expr("(n_inter * 1000000) div n_a"), expr("(n_inter * 1000000) div n_b")) >= 900000)
            .as("engulfed")
        )
    },
    Some(
      s"""WITH ${LlmQueries.CorpusSql}, ${LlmQueries.SigSql},
         |wsets AS (SELECT doc_id, list_distinct(string_split(${LlmQueries.normSql("text")}, ' ')) AS wset FROM corpus),
         |scored AS (
         |  SELECT p.doc_a, p.doc_b,
         |    cast(len(list_intersect(a.wset, b.wset)) as bigint) AS n_inter,
         |    cast(len(a.wset) as bigint) AS n_a,
         |    cast(len(b.wset) as bigint) AS n_b
         |  FROM pairs p
         |  JOIN wsets a ON p.doc_a = a.doc_id
         |  JOIN wsets b ON p.doc_b = b.doc_id)
         |SELECT doc_a, doc_b, n_inter, n_a, n_b,
         |  cast((n_inter * 1000000) // n_a as bigint) AS cont_a_micro,
         |  cast((n_inter * 1000000) // n_b as bigint) AS cont_b_micro,
         |  greatest((n_inter * 1000000) // n_a, (n_inter * 1000000) // n_b) >= 900000 AS engulfed
         |FROM scored""".stripMargin
    )
  )

  /** Pair forensics: for each LSH candidate pair, the shared/unique
    * token-segment counts per side — the "WHY is this a near-dup"
    * explanation a curation reviewer reads before trusting a dedup
    * sweep (all-shared → verbatim copy; shared-prefix + unique-tail →
    * template with insertions). Segments are 8-token windows at 8-token
    * stride (the fingerprint granularity); counts are exact set
    * arithmetic on md5 segment hashes.
    */
  private val pairDiff = Q(
    "docs_pair_diff",
    (s, d) => {
      val segsOf =
        // bindOnce: per-window slices would otherwise inline the split,
        // re-evaluating it once per segment — O(n²) per row.
        graft.functions.MetadataFunctions.bindOnce(
          split(coalesce(col("text"), lit("")), " ")
        ) { tokens =>
          array_distinct(
            transform(
              sequence(lit(0), greatest(floor((size(tokens) - 1) / 8).cast("int"), lit(0))),
              i => md5(concat_ws(" ", slice(tokens, i * 8 + 1, lit(8))))
            )
          )
        }
      val segs = LlmQueries.corpus(s, d).select(col("doc_id"), segsOf.as("segs"))
      LlmQueries
        .minhashPairsOf(LlmQueries.corpus(s, d))
        .join(segs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("segs", "sa"), Seq("doc_a"))
        .join(segs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("segs", "sb"), Seq("doc_b"))
        .select(
          col("doc_a"),
          col("doc_b"),
          size(array_intersect(col("sa"), col("sb"))).cast("long").as("n_shared"),
          size(array_except(col("sa"), col("sb"))).cast("long").as("n_only_a"),
          size(array_except(col("sb"), col("sa"))).cast("long").as("n_only_b")
        )
    },
    Some(
      s"""WITH ${LlmQueries.CorpusSql}, ${LlmQueries.SigSql},
         |tkx AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tokens FROM corpus),
         |segsets AS (
         |  SELECT doc_id, list_distinct(list_transform(
         |    range(0, greatest((len(tokens) - 1) // 8, 0) + 1),
         |    i -> md5(array_to_string(tokens[i*8+1 : i*8+8], ' ')))) AS segs
         |  FROM tkx)
         |SELECT p.doc_a, p.doc_b,
         |  cast(len(list_intersect(a.segs, b.segs)) as bigint) AS n_shared,
         |  cast(len(list_filter(a.segs, x -> NOT list_contains(b.segs, x))) as bigint) AS n_only_a,
         |  cast(len(list_filter(b.segs, x -> NOT list_contains(a.segs, x))) as bigint) AS n_only_b
         |FROM pairs p
         |JOIN segsets a ON p.doc_a = a.doc_id
         |JOIN segsets b ON p.doc_b = b.doc_id""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(containmentPairs, pairDiff)
}
