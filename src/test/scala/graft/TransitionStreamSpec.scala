package graft

import graft.streaming.TransitionStream
import graft.streaming.TransitionStream.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming transition extractor must emit every adjacent-pair
  * transition exactly once across micro-batch boundaries — the carried
  * last-event state is the whole correctness content.
  */
class TransitionStreamSpec extends SparkSuite {

  test("two micro-batches reproduce the one-shot transition multiset") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // user 1: a→b | batch cut | →c→a ; user 2: x | cut | →x.
    val batch1 = Seq(Ev(1, 10, 1, "a"), Ev(2, 20, 1, "b"), Ev(3, 15, 2, "x"))
    val batch2 = Seq(Ev(4, 30, 1, "c"), Ev(5, 40, 1, "a"), Ev(6, 25, 2, "x"))

    val in = MemoryStream[Ev]
    val q = TransitionStream
      .transitionsStream(in.toDS())
      .writeStream
      .format("memory")
      .queryName("trans_out")
      .outputMode("append")
      .start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      in.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark
      .table("trans_out")
      .as[TransitionStream.Step]
      .collect()
      .map(s => (s.user_id, s.from_type, s.to_type))
      .sorted
      .toSeq
    val want = Seq(
      (1L, "a", "b"),
      (1L, "b", "c"),
      (1L, "c", "a"),
      (2L, "x", "x")
    ).sorted
    assert(got == want)
  }
}
