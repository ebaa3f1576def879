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

  private def drift(series: Seq[Long]): Seq[(String, Boolean)] = {
    import spark.implicits._
    val daily = series.zipWithIndex
      .map { case (n, i) => ("t", f"2024-01-${i + 1}%02d", n) }
      .toDF("event_type", "day", "n")
    AnomalyQueries
      .cusumDrift(daily)
      .orderBy("day")
      .collect()
      .map(r => r.getString(1) -> r.getBoolean(5))
      .toSeq
  }

  test("CUSUM flags a sustained 20% elevation the MAD point rule misses") {
    // Ten days at +9% after twenty stable days: each elevated day sits
    // under the point rule's 10%-of-median floor (so events_anomaly_mad
    // stays quiet), but ~8 doubled units/day accumulate in the CUSUM and
    // cross the 2.5x-scale decision interval mid-run. (The stable
    // majority matters: median statistics tolerate <50% contamination.)
    val stable = Seq[Long](100, 101, 99, 100, 102, 98, 100, 101, 99, 100,
      100, 101, 99, 100, 102, 98, 100, 101, 99, 100)
    val series = stable ++ Seq.fill(10)(109L)
    assert(flags(series).values.count(identity) == 0, "point rule should stay quiet")
    val d = drift(series)
    assert(d.take(20).forall(!_._2), d.toString) // quiet through the stable stretch
    assert(d.exists(_._2), "sustained elevation never flagged")
  }

  test("CUSUM stays quiet on a stable series") {
    val d = drift(Seq[Long](100, 101, 99, 100, 102, 98, 100, 101, 99, 100))
    assert(d.forall(!_._2))
  }

  test("CUSUM accumulates from day one and decays after the elevation ends") {
    // Exercises the least(0, min P) clamp directly: eight elevated days
    // FIRST mean the running prefix min is POSITIVE, so the clamp must
    // hold S = P (flag days 7-9 exactly, by hand: +8/day elevated,
    // −10/day stable, threshold S > 50); without the clamp S = P − P₁
    // and day 7 would not flag. The post-elevation decay (flag gone by
    // day 10) is the reset half.
    val series = Seq.fill(8)(109L) ++ Seq.fill(22)(100L)
    val d = drift(series)
    val flagged = d.filter(_._2).map(_._1).toSet
    assert(flagged == Set("2024-01-07", "2024-01-08", "2024-01-09"), d.toString)
  }

  test("normal variation inside 3*MAD does not flag; an outlier beyond it does") {
    val f = flags(Seq(95, 100, 105, 98, 102, 97, 103, 250))
    assert(f("2024-01-08"))
    assert(f.count(_._2) == 1)
  }
}
