package graft

import scala.collection.mutable

import graft.operators.LlmQueries8
import graft.streaming.NeardupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Top-level row for the MemoryStream encoder. */
case class NeardupStreamDoc(doc_id: Long, text: String)

/** Streaming incremental near-dup: micro-batches must reproduce the
  * batch `neardupIncremental` assignment (which the
  * `docs_neardup_incremental` oracle certifies).
  */
class NeardupStreamSpec extends SparkSuite {

  test("streaming micro-batches reproduce the batch near-dup assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val corpus = docs.withColumn("cluster_id", col("doc_id")).persist()

    val near = docs
      .filter(col("doc_id") % 10 === 0)
      .select(
        (col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" extra tail words appended here")).as("text")
      )
    val novel = docs
      .filter(col("doc_id") % 10 === 5)
      .select(
        (col("doc_id") + 600000).as("doc_id"),
        concat(lit("nv"), col("doc_id").cast("string"), lit(" xq"), col("doc_id").cast("string"))
          .as("text")
      )
    val batch = near.union(novel)
    val expected = LlmQueries8
      .neardupIncremental(batch, corpus)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap

    val all = batch.as[NeardupStreamDoc].collect()
    val (first, second) = all.splitAt(all.length / 2)
    val input = MemoryStream[NeardupStreamDoc]
    val got = mutable.Map[Long, (Long, Boolean)]()
    // Continuous micro-batch trigger: data is enqueued after start(), and
    // the default AvailableNow trigger would race — an empty first poll
    // terminates the query before addData lands (seen under parallel
    // suite load). processAllAvailable after EACH addData also pins the
    // two-micro-batch replay the test is about.
    val q = NeardupStream
      .incremental(
        input.toDF(),
        corpus,
        (out, _) =>
          out.collect().foreach(r => got.synchronized {
            got(r.getLong(0)) = (r.getLong(1), r.getBoolean(2))
          }),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
      )
      .start()
    try {
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.size == expected.size)
    assert(got.toMap == expected)
    // The fixture exercises both outcomes: adopted clusters and novel docs.
    assert(expected.values.exists(!_._2) && expected.values.exists(_._2))
    spark.catalog.clearCache()
  }
}
