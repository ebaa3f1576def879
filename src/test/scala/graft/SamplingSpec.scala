package graft

/** Behavioral checks for the corpus samplers: the temperature sampler must
  * flatten the language distribution (high-resource languages downsample
  * harder) while staying near the corpus budget.
  */
class SamplingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("temperature sampling flattens the language distribution within budget") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count().toDouble
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val kept = SparkEntry.queries("docs_sample_temperature")(spark, sf)
    val keptByLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // Budget: 30% of the corpus, within md5-bucket discretization noise.
    val keptTotal = keptByLang.values.sum.toDouble
    assert(keptTotal / total > 0.2 && keptTotal / total < 0.4,
      s"kept ${keptTotal / total} of corpus, expected ~0.3")

    // Flattening: the highest-resource language keeps a strictly smaller
    // fraction than the lowest-resource one.
    val hi = byLang.maxBy(_._2)._1
    val lo = byLang.minBy(_._2)._1
    val hiRate = keptByLang.getOrElse(hi, 0L).toDouble / byLang(hi)
    val loRate = keptByLang.getOrElse(lo, 0L).toDouble / byLang(lo)
    assert(hiRate < loRate, s"$hi rate $hiRate should be < $lo rate $loRate")
  }
}
