package graft

import graft.streaming.SketchStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming sketch maintenance agrees with the batch sketch over the
  * same corpus — replayed in two batches to exercise incremental state.
  */
object SketchStreamSpec {
  case class Doc(doc_id: Long, source: String, text: String)
}

class SketchStreamSpec extends SparkSuite {
  import SketchStreamSpec.Doc

  private val batch1 = Seq(
    Doc(1, "a", "the quick brown fox jumps over the lazy dog"),
    Doc(2, "a", "the quick brown fox naps"),
    Doc(3, "b", "pack my box with five dozen liquor jugs")
  )
  private val batch2 = Seq(
    Doc(4, "b", "the quick brown fox jumps again and again"),
    Doc(5, "c", "sphinx of black quartz judge my vow")
  )

  test("streaming CMS cells equal the batch sketch over the replayed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = SketchStream
      .cmsCells(input.toDF())
      .writeStream
      .format("memory")
      .queryName("cms_out")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark
        .table("cms_out")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val expected = SketchStream
        .cmsCells((batch1 ++ batch2).toDF())
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(streamed == expected)
      assert(expected.nonEmpty)
    } finally q.stop()
  }

  test("streaming KMV registers equal the batch registers; minima only shrink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = SketchStream
      .kmvRegisters(input.toDF())
      .writeStream
      .format("memory")
      .queryName("kmv_out")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      val after1 = spark
        .table("kmv_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      input.addData(batch2: _*)
      q.processAllAvailable()
      val after2 = spark
        .table("kmv_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val expected = SketchStream
        .kmvRegisters((batch1 ++ batch2).toDF())
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(after2 == expected)
      // Register monotonicity: a key present in both snapshots never grows.
      after1.foreach { case (k, v) => assert(after2(k) <= v) }
    } finally q.stop()
  }
}
