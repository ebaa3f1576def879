package graft

import graft.operators.LlmQueries8
import org.apache.spark.sql.functions._

/** Near-dup clustering and sequence-packing semantics the oracle cannot
  * express (multi-hop components) or does not pin down (packing
  * invariants).
  */
class Llm8Spec extends SparkSuite {

  test("neardup clusters are transitive across chains; singletons keep their id") {
    import spark.implicits._
    // a≈b and b≈c overlap heavily pairwise, a and c less so — the chain
    // must still land in ONE cluster via propagation; d shares nothing.
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base + " tail one"),
      (2L, base + " tail two"),
      (3L, base + " tail two more words here"),
      (4L, (100 to 140).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = LlmQueries8
      .neardupClusters(docs, 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(1) == ((1L, true)))
    assert(out(2)._1 == 1L && !out(2)._2)
    assert(out(3)._1 == 1L && !out(3)._2)
    assert(out(4) == ((4L, true)))
  }

  test("sequence packing accounts for every token exactly once") {
    val sfDir = "/root/testdata/sf0.001"
    val packed = SparkEntry.queries("docs_pack_sequences")(spark, sfDir)
    val totalPacked =
      packed.agg(sum(col("seq_tokens"))).head().getLong(0)
    val totalTokens = Tables
      .documents(spark, sfDir)
      .select(size(split(coalesce(col("text"), lit("")), " ")).cast("bigint").as("n"))
      .agg(sum(col("n")))
      .head()
      .getLong(0)
    assert(totalPacked == totalTokens)
    // One row per (shard, bin) and no empty bins in the output.
    assert(packed.count() == packed.select("lang", "bucket", "seq_id").distinct().count())
    assert(packed.filter(col("n_docs") < 1 || col("seq_tokens") < 1).count() == 0)
  }
}
