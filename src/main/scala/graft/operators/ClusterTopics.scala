package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cluster labeling: the step after any embedding clustering — name each
  * cluster by its most DISTINCTIVE terms (highest cluster-frequency to
  * corpus-frequency lift), so a human can read a 10k-cluster corpus map
  * without sampling documents. Composes the certified pieces: the
  * ann_ivf coarse quantizer assigns documents to cells through the
  * doc_id↔vec_id pairing, then term lift is exact integer micro-units.
  *
  * Scale shape: cell assignment is map-only; the (cell, term) and
  * per-term aggregates are vocabulary-keyed shuffles with map-side
  * combine (the docs_tfidf shape); the top-3 window partitions by cell
  * over the already-aggregated vocabulary table, never raw documents.
  */
object ClusterTopics {

  private val Cells = 8
  private val TopTerms = 3

  private val clusterTopics = Q(
    "embed_cluster_topics",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cells = Tables
        .embeddings(s, d)
        .select(col("vec_id"), LlmQueries2.ivfCell(col("embedding"), Cells).as("cell"))
      // Two aggregates read `terms`; Spark does not deduplicate common
      // subplans, so without the persist the documents⋈cells join and
      // the explode run twice (same re-derivation the PageRank edge
      // table hit). Verify/Bench clear the cache per query.
      val terms = Tables
        .documents(s, d)
        .join(cells, col("doc_id") === col("vec_id"))
        .select(col("cell"), explode(split(coalesce(col("text"), lit("")), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val inCell = terms.groupBy("cell", "term").agg(count(lit(1)).as("n_cell"))
      val global = terms.groupBy("term").agg(count(lit(1)).as("n_global"))
      val lift = inCell
        .join(global, Seq("term"))
        .select(
          col("cell"),
          col("term"),
          col("n_cell"),
          col("n_global"),
          expr("(n_cell * 1000000) div n_global").as("lift_micro")
        )
      val w = Window
        .partitionBy("cell")
        .orderBy(col("lift_micro").desc, col("n_cell").desc, col("term"))
      lift
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= TopTerms)
        .select(col("cell").cast("long").as("cell"), col("rank"), col("term"), col("n_cell"), col("n_global"), col("lift_micro"))
    },
    Some {
      val weight =
        "(strpos('0123456789abcdef', substr(md5('ivf' || cast(c as varchar) || ':' || cast(dd - 1 as varchar)), 1, 1)) - 1 - 7.5)"
      val scores =
        s"list_transform(range(0, $Cells), c -> list_sum(list_transform(range(1, len(e) + 1), dd -> e[dd] * $weight)))"
      s"""WITH t AS (SELECT vec_id, cast(embedding as double[]) AS e FROM embeddings),
         |b AS (SELECT vec_id, list_position(sc, list_max(sc)) AS cell
         |      FROM (SELECT vec_id, e, $scores AS sc FROM t) _s),
         |terms AS (
         |  SELECT b.cell, unnest(string_split(coalesce(doc.text, ''), ' ')) AS term
         |  FROM documents doc JOIN b ON doc.doc_id = b.vec_id),
         |tf AS (SELECT cell, term, count(*) AS n_cell FROM terms WHERE len(term) > 0 GROUP BY 1, 2),
         |g AS (SELECT term, count(*) AS n_global FROM terms WHERE len(term) > 0 GROUP BY 1),
         |lift AS (
         |  SELECT cell, tf.term, n_cell, n_global, (n_cell * 1000000) // n_global AS lift_micro
         |  FROM tf JOIN g ON tf.term = g.term),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY cell ORDER BY lift_micro DESC, n_cell DESC, term) AS rank
         |  FROM lift)
         |SELECT cast(cell as bigint) AS cell, cast(rank as int) AS rank, term,
         |  cast(n_cell as bigint) AS n_cell, cast(n_global as bigint) AS n_global,
         |  cast(lift_micro as bigint) AS lift_micro
         |FROM ranked WHERE rank <= $TopTerms""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(clusterTopics)
}
