package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recall-vs-nprobe tuning curve for the plain IVF path: recall@5
  * against brute-force cosine truth when each query probes its top
  * 1 / 2 / 4 cells of the 8-cell deterministic quantizer. THE
  * operational ANN knob — `ann_recall_ivfpq` measures one deployed
  * configuration; this curve says what each extra probe buys, which is
  * how nprobe is actually chosen (probe until the recall curve flattens,
  * never further — every probe multiplies query fan-out at 100 TB).
  * Completes the tuning-curve family: planes (`ann_recall_eval`),
  * Hamming radius (`ann_recall_multiprobe`), dimensions
  * (`ann_recall_dims`), fusion (`ann_recall_hybrid`), and now nprobe.
  *
  * Scale shape: the corpus side is the certified argmax cell
  * assignment (one map pass); probe lists are per-query top-n cells by
  * (score desc, cell asc) — a deterministic sort of an 8-element
  * array, never a corpus rank; candidates come from a cell-keyed
  * equi-join; only the deliberately small query sample does exact
  * cosine (the AnnEval brute-force whitelist covers the truth side).
  */
object NprobeRecall {

  private val Cells = 8
  private val Queries = 10
  private val K = 5
  private val ProbeGrid = Seq(1, 2, 4)

  /** Cells ranked by (score desc, cell asc) for a vector — 1-based cell
    * ids matching [[LlmQueries2.ivfCell]] (rank 1 IS the assigned cell).
    */
  private def rankedCells(vec: Column): Column =
    transform(
      array_sort(
        transform(
          sequence(lit(0), lit(Cells - 1)),
          c => struct((-LlmQueries2.centroidDot(vec, c)).as("ns"), (c + 1).cast("long").as("cell"))
        )
      ),
      s => s.getField("cell")
    )

  def recallCurveOf(emb: DataFrame): DataFrame = {
    val assigned = emb.select(
      col("vec_id"),
      LlmQueries2.ivfCell(col("embedding"), Cells).cast("long").as("cell")
    )
    val truth = AnnEval.truthTopK(emb, Queries, K)
    val qcells = emb
      .filter(col("vec_id") < Queries)
      .select(
        col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        rankedCells(col("embedding")).as("rc")
      )
    val arms = ProbeGrid.map { n =>
      val probes = qcells.select(
        col("query_id"),
        col("qv"),
        explode(slice(col("rc"), 1, n)).as("cell")
      )
      val cand = assigned
        .join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), col("qv"))
      val scored = cand
        .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
        .select(
          col("query_id"),
          col("vec_id").as("approx_id"),
          round(cosine(col("qv"), col("embedding")), 6).as("score")
        )
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
        .orderBy(col("score").desc, col("approx_id"))
      val top = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select("query_id", "approx_id")
      AnnEval
        .recallOf(truth, top)
        .select(lit(n.toLong).as("nprobe"), col("query_id"), col("k"), col("n_overlap"), col("recall_permille"))
    }
    arms.reduce(_.unionByName(_))
  }

  private val recallQ = Q(
    "ann_recall_nprobe",
    (s, d) => recallCurveOf(Tables.embeddings(s, d).select("vec_id", "embedding")),
    Some {
      val w =
        "(strpos('0123456789abcdef', substr(md5('ivf' || cast(c as varchar) || ':' || cast(dd - 1 as varchar)), 1, 1)) - 1 - 7.5)"
      val scores =
        s"list_transform(range(0, $Cells), c -> list_sum(list_transform(range(1, len(e) + 1), dd -> e[dd] * $w)))"
      val cos =
        "round(list_dot_product(q.qv, x.e) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(x.e, x.e))), 6)"
      def arm(n: Int): String =
        s"""SELECT CAST($n AS BIGINT) AS nprobe, t.query_id,
           |  CAST(count(*) AS BIGINT) AS k,
           |  CAST(count(a.approx_id) AS BIGINT) AS n_overlap,
           |  CAST((count(a.approx_id) * 1000) // count(*) AS BIGINT) AS recall_permille
           |FROM truth t LEFT JOIN (
           |  SELECT query_id, approx_id FROM (
           |    SELECT c.query_id, c.vec_id AS approx_id,
           |      row_number() OVER (PARTITION BY c.query_id ORDER BY c.score DESC, c.vec_id) AS rank
           |    FROM (
           |      SELECT p.query_id, b.vec_id, $cos AS score
           |      FROM (SELECT query_id, qv, cell FROM qprobe WHERE rn <= $n) p
           |      JOIN b ON b.cell = p.cell
           |      JOIN v q ON q.vec_id = p.query_id
           |      JOIN v x ON x.vec_id = b.vec_id
           |      WHERE b.vec_id != p.query_id) c) _r
           |  WHERE rank <= $K) a
           |  ON a.query_id = t.query_id AND a.approx_id = t.neighbor_id
           |GROUP BY 2""".stripMargin
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS e, cast(embedding as double[]) AS qv FROM embeddings),
         |sc AS (SELECT vec_id, e, $scores AS sc FROM v),
         |b AS (SELECT vec_id, list_position(sc, list_max(sc)) AS cell FROM sc),
         |qprobe AS (
         |  SELECT vec_id AS query_id, e AS qv, cell,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
         |  FROM (
         |    SELECT vec_id, e, unnest(range(1, $Cells + 1)) AS cell, unnest(sc) AS s
         |    FROM sc WHERE vec_id < $Queries) _q),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.e, x.e) /
         |              (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(x.e, x.e))), 6) DESC,
         |        x.vec_id) AS rank
         |    FROM v x JOIN v q ON q.vec_id < $Queries AND x.vec_id != q.vec_id) _t
         |  WHERE rank <= $K)
         |${ProbeGrid.map(arm).mkString("\nUNION ALL\n")}""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(recallQ)
}
