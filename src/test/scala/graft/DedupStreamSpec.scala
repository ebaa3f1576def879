package graft

import scala.collection.mutable

import graft.operators.{Dedup, DedupQueries}
import graft.streaming.DedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Record row for the MemoryStream encoder (top-level: Spark cannot
  * encode a class nested inside the suite).
  */
case class DedupStreamRec(
    id: String,
    source_id: String,
    title: String,
    author: String,
    year: Int,
    isbn: String,
    pages: Int,
    series_issn: String,
    series_numbering: String
)

/** Streaming incremental dedup: a MemoryStream of new records, split
  * across micro-batches, must produce exactly the assignments of the
  * batch `Dedup.dedupIncremental` run (which the `dedup_incremental`
  * oracle certifies).
  */
class DedupStreamSpec extends SparkSuite {

  test("streaming micro-batches reproduce the batch incremental assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val sf = "/root/testdata/sf0.001"
    val recs = DedupQueries.records(spark, sf)
    val clustered = Dedup
      .dedupRecords(recs)
      .filter(col("dedup_id").isNotNull)
      .join(recs, Seq("id"))
      .persist()

    val batch = DedupQueries.batchRecords(spark, sf)
    val expected = Dedup
      .dedupIncremental(batch, clustered)
      .collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
      .toMap

    // Stream the same records in two micro-batches.
    val all = batch.as[DedupStreamRec].collect()
    val (first, second) = all.splitAt(all.length / 2)
    val input = MemoryStream[DedupStreamRec]
    val got = mutable.Map[String, Option[String]]()
    // Continuous micro-batch trigger: data is enqueued after start(), and
    // the default AvailableNow trigger would race — an empty first poll
    // terminates the query before addData lands (seen under parallel
    // suite load). processAllAvailable after EACH addData also pins the
    // two-micro-batch replay the test is about.
    val q = DedupStream
      .incremental(
        input.toDF(),
        clustered,
        (out, _) =>
          out.collect().foreach(r => got.synchronized {
            got(r.getString(0)) = Option(r.getString(1))
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
    // Sanity: the fixture actually exercises both outcomes.
    assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty))
  }
}
