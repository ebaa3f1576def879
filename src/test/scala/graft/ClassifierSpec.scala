package graft

import org.apache.spark.sql.functions._

/** The trained classifier must actually LEARN: after K full-batch
  * iterations from zero weights, in-class scores must separate. (The
  * DuckDB oracle certifies the arithmetic; this certifies the model is
  * not a fixed point at p=0.5.)
  */
class ClassifierSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("trained scores separate the labeled classes") {
    val scored = SparkEntry.queries("docs_classifier_score")(spark, sf)
    val m = scored
      .groupBy("y")
      .agg(avg("p_mu").as("mean_p"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Long]("y") -> (r.getAs[Double]("mean_p"), r.getAs[Long]("n")))
      .toMap
    assert(m.contains(0L) && m.contains(1L), s"missing a class: $m")
    val (p1, n1) = m(1L)
    val (p0, n0) = m(0L)
    assert(n0 > 0 && n1 > 0)
    // Mean positive-class probability must exceed the negative class by a
    // real margin (zero-weight start scores everything at exactly 0.5).
    assert(p1 - p0 > 100000.0, s"no separation: en=$p1 other=$p0")
    assert(p1 > 500000.0 && p0 < 500000.0, s"not on opposite sides: $p1 / $p0")
  }

  test("every document is scored exactly once, including empty ones") {
    val scored = SparkEntry.queries("docs_classifier_score")(spark, sf)
    val nDocs = Tables.documents(spark, sf).count()
    assert(scored.count() === nDocs)
    assert(scored.select("doc_id").distinct().count() === nDocs)
  }
}
