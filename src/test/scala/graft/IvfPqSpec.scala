package graft

import graft.operators.{IvfPq, KMeans, PqTrain}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end certification of the TRAINED IVF-PQ search path: KMeans
  * Lloyd loop → nearest-centroid routing with nprobe → PQ/ADC shortlist
  * → exact rerank, with a planted-neighbor recall floor against
  * brute-force cosine. (The registered `embed_ivfpq_search` query
  * certifies the deterministic-codebook pipeline against the DuckDB
  * oracle; this spec certifies the trained-centroid composition the
  * oracle cannot express.)
  */
class IvfPqSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("trained IVF-PQ search recalls planted near-duplicates (recall@5 >= 0.8)") {
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // Plant 5 tightly-scaled copies of each query vector (cosine exactly
    // 1, tiny L2 offset): brute-force top-5 per query is exactly its
    // planted set, so recall is unambiguous.
    val planted = base
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), explode(sequence(lit(0), lit(4))).as("j"), col("embedding"))
      .select(
        (col("vec_id") * 10 + col("j") + 900000).as("vec_id"),
        transform(col("embedding"), x => x * (lit(1.0) + col("j").cast("double") / 500))
          .as("embedding")
      )
    val corpus = base.unionByName(planted).persist()

    // Train 8 IVF centroids with two Lloyd iterations from the first 8
    // vectors as seeds.
    val embIdVec = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    var cents: DataFrame = base
      .filter(col("vec_id") < 8)
      .select(
        col("vec_id").as("cell"),
        transform(col("embedding"), _.cast("double")).as("cv")
      )
    for (_ <- 1 to 2)
      cents = KMeans.centroids(KMeans.step(embIdVec, cents)).persist()

    val approx = IvfPq
      .searchTrained(corpus, cents)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // Brute-force cosine top-5 (the certified baseline shape).
    import graft.functions.VectorFunctions.cosine
    val qs = corpus
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    val brute = corpus
      .join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("score")
      )
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 5)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    assert(brute.keySet == approx.keySet && brute.nonEmpty)
    // Brute-force really did find the planted set (sanity of the fixture).
    brute.foreach { case (q, ns) =>
      assert(ns == (0 to 4).map(j => q * 10 + j + 900000).toSet, s"fixture for query $q")
    }
    val recalls = brute.keys.toSeq.map { q =>
      approx(q).intersect(brute(q)).size.toDouble / 5
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"recall@5 = $avg (per-query: $recalls)")
    spark.catalog.clearCache()
  }

  test("FULLY-trained IVF-PQ (trained coarse + trained codebooks) keeps the recall floor") {
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val planted = base
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), explode(sequence(lit(0), lit(4))).as("j"), col("embedding"))
      .select(
        (col("vec_id") * 10 + col("j") + 900000).as("vec_id"),
        transform(col("embedding"), x => x * (lit(1.0) + col("j").cast("double") / 500))
          .as("embedding")
      )
    val corpus = base.unionByName(planted).persist()
    val embIdVec = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    var cents: DataFrame = base
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
    for (_ <- 1 to 2)
      cents = KMeans.centroids(KMeans.step(embIdVec, cents)).persist()
    val pqStats = PqTrain.trainOf(corpus)

    val approx = IvfPq
      .searchFullyTrained(corpus, cents, pqStats)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    import graft.functions.VectorFunctions.cosine
    val qs = corpus
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    val brute = corpus
      .join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        cosine(col("qv"), col("embedding")).as("score")
      )
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 5)
      .select("query_id", "neighbor_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap

    assert(brute.keySet == approx.keySet && brute.nonEmpty)
    val recalls = brute.keys.toSeq.map { q =>
      approx(q).intersect(brute(q)).size.toDouble / 5
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.8, s"recall@5 = $avg (per-query: $recalls)")
    spark.catalog.clearCache()
  }
}
