package graft

import graft.streaming.AsofStream
import graft.streaming.AsofStream.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming as-of join must attribute every purchase to the latest
  * earlier click exactly once across micro-batch boundaries — the
  * carried latest-click state is the whole correctness content.
  */
class AsofStreamSpec extends SparkSuite {

  test("two micro-batches reproduce the one-shot as-of attribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // user 1: click(10) purchase(20) | cut | purchase(30) click(40) purchase(50)
    //   → p20←c10, p30←c10 (carried across the cut), p50←c40.
    // user 2: purchase(5) with NO prior click → unmatched;
    //   click(15) | cut | purchase(25) → matched to the carried click.
    val batch1 = Seq(
      Ev(1, 10, 1, "click"),
      Ev(2, 20, 1, "purchase"),
      Ev(3, 5, 2, "purchase"),
      Ev(4, 15, 2, "click")
    )
    val batch2 = Seq(
      Ev(5, 30, 1, "purchase"),
      Ev(6, 40, 1, "click"),
      Ev(7, 50, 1, "purchase"),
      Ev(8, 25, 2, "purchase")
    )

    val in = MemoryStream[Ev]
    val q = AsofStream
      .asofStream(in.toDS())
      .writeStream
      .format("memory")
      .queryName("asof_out")
      .outputMode("append")
      .start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      in.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark
      .table("asof_out")
      .as[AsofStream.AsofMatch]
      .collect()
      .map(m => (m.event_id, m.click_event_id, m.gap_us))
      .sortBy(_._1)
      .toSeq
    val want = Seq(
      (2L, Some(1L), Some(10L)),
      (3L, None, None),
      (5L, Some(1L), Some(20L)),
      (7L, Some(6L), Some(10L)),
      (8L, Some(4L), Some(10L))
    )
    assert(got == want)
  }
}
