package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared pieces of the ANN recall evaluations (`ann_recall_eval`,
  * `ann_recall_multiprobe`). The determinism discipline here —
  * 6-decimal score round then neighbor-id tiebreak, exact per-mille
  * integer recall — is load-bearing for the oracle compare AND for the
  * cross-operator dominance assertions in SketchSpec, so it lives in
  * exactly one place on each engine side.
  */
private[operators] object AnnEval {

  /** Deterministic top-k by rounded cosine then neighbor id. `cand`
    * carries (query_id, neighbor_id, score).
    */
  def topK(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force ground truth: exact top-k cosine over the full corpus
    * for the first `nQueries` vectors (broadcast nested loop BY DESIGN —
    * the eval sample is deliberately small; PlanSpec whitelists the
    * consumers).
    */
  def truthTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val queries = emb
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    topK(
      emb
        .join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(
          col("query_id"),
          col("vec_id").as("neighbor_id"),
          round(cosine(col("qvec"), col("embedding")), 6).as("score")
        ),
      k
    ).select(col("query_id"), col("neighbor_id"))
  }

  /** Per-query recall of `approx` (query_id, approx_id) against `truth`
    * (query_id, neighbor_id), in exact per-mille integer units.
    */
  def recallOf(truth: DataFrame, approx: DataFrame): DataFrame =
    truth
      .join(
        approx,
        truth("query_id") === approx("query_id") && truth("neighbor_id") === approx("approx_id"),
        "left"
      )
      .groupBy(truth("query_id").as("query_id"))
      .agg(count(lit(1)).as("k"), count(col("approx_id")).as("n_overlap"))
      .select(
        col("query_id"),
        col("k"),
        col("n_overlap"),
        expr("(n_overlap * 1000) div k").as("recall_permille")
      )

  /** DuckDB hyperplane weight for (plane `p`, 1-based dim `dd`) — must
    * stay in lockstep with [[graft.functions.VectorFunctions.planeWeight]].
    */
  val DuckWeight: String =
    "(strpos('0123456789abcdef', substr(md5(cast(p as varchar) || ':' || cast(dd - 1 as varchar)), 1, 1)) - 1 - 7.5)"

  /** DuckDB sign-LSH bucket over an `embedding` column — the SQL twin of
    * [[graft.functions.VectorFunctions.signLshBucket]].
    */
  def duckBucket(planes: Int): String =
    s"array_to_string(list_transform(range(0, $planes), p -> CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), dd -> (cast(embedding as double[]))[dd] * $DuckWeight)) >= 0 THEN '1' ELSE '0' END), '')"
}
