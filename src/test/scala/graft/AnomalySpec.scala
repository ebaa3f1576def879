package graft

import graft.operators.AnomalyQueries

/** Hampel-gate semantics on hand series — in particular the MAD-collapse
  * fallback the corpus fixture never reaches.
  */
class AnomalySpec extends SparkSuite {

  private def flags(series: Seq[Long]): Map[String, Boolean] = {
    import spark.implicits._
    val daily = series.zipWithIndex
      .map { case (n, i) => ("t", f"2024-01-${i + 1}%02d", n) }
      .toDF("event_type", "day", "n")
    AnomalyQueries
      .madFlags(daily)
      .collect()
      .map(r => r.getString(1) -> r.getBoolean(6))
      .toMap
  }

  test("MAD collapse: a near-constant series does not flag a tiny blip") {
    // MAD = 0 here; without the minimum-scale fallback every non-median
    // day (the single 101) would read as an anomaly.
    val f = flags(Seq(100, 100, 100, 100, 100, 100, 101))
    assert(f.values.forall(!_))
  }

  test("MAD collapse: a genuine spike still flags under the fallback scale") {
    // MAD = 0, spike is 3x the median — dev > 10% of median fires.
    val f = flags(Seq(100, 100, 100, 100, 100, 100, 300))
    assert(f("2024-01-07"))
    assert(f.count(_._2) == 1)
  }

  test("normal variation inside 3*MAD does not flag; an outlier beyond it does") {
    val f = flags(Seq(95, 100, 105, 98, 102, 97, 103, 250))
    assert(f("2024-01-08"))
    assert(f.count(_._2) == 1)
  }
}
