package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-dimension ablation (the Matryoshka question, Kusupati
  * 2022): recall@5 of cosine search over the PREFIX of the embedding
  * (32/16/8 of 64 dims) against full-dimension ground truth — the eval
  * that decides how many dimensions the 100 TB vector store actually
  * pays for. Same determinism discipline and deliberately-small eval
  * sample as the other AnnEval consumers (brute force on 10 queries,
  * PlanSpec-whitelisted); the score joins per-dims recall rows for a
  * monotone quality/size curve.
  */
object DimAblation {

  private val DimSweep = Seq(32, 16, 8)
  private val K = 5
  private val NQueries = 10

  private val recallDims = Q(
    "ann_recall_dims",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val truth = AnnEval.truthTopK(emb, NQueries, K)
      def evalDims(dims: Int): DataFrame = {
        val cut = emb.select(col("vec_id"), slice(col("embedding"), 1, dims).as("embedding"))
        val queries = cut
          .filter(col("vec_id") < NQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
        val approx = AnnEval
          .topK(
            cut
              .join(broadcast(queries), col("vec_id") =!= col("query_id"))
              .select(
                col("query_id"),
                col("vec_id").as("neighbor_id"),
                round(cosine(col("qvec"), col("embedding")), 6).as("score")
              ),
            K
          )
          .select(col("query_id"), col("neighbor_id").as("approx_id"))
        AnnEval
          .recallOf(truth, approx)
          .select(lit(dims).as("dims"), col("query_id"), col("k"), col("n_overlap"), col("recall_permille"))
      }
      DimSweep.map(evalDims).reduce(_ unionByName _)
    },
    Some {
      def cosSql(a: String, b: String) =
        s"""round(list_dot_product($a, $b) /
           |          (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)""".stripMargin
      val perDims = DimSweep
        .map { dims =>
          s"""(SELECT $dims AS dims, t.query_id, cast(count(*) as bigint) AS k,
             |  cast(count(a.approx_id) as bigint) AS n_overlap,
             |  cast(count(a.approx_id) * 1000 // count(*) as bigint) AS recall_permille
             |FROM truth t LEFT JOIN (
             |  SELECT query_id, neighbor_id AS approx_id FROM (
             |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
             |        ${cosSql(s"q.vec[1:$dims]", s"e.vec[1:$dims]")} DESC,
             |        e.vec_id) AS rank
             |    FROM v e JOIN v q ON q.vec_id < $NQueries AND e.vec_id != q.vec_id) _a
             |  WHERE rank <= $K) a
             |  ON t.query_id = a.query_id AND t.neighbor_id = a.approx_id
             |GROUP BY 2)""".stripMargin
        }
        .mkString("\nUNION ALL\n")
      s"""WITH v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        ${cosSql("q.vec", "e.vec")} DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < $NQueries AND e.vec_id != q.vec_id) _t
         |  WHERE rank <= $K)
         |$perDims""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(recallDims)
}
