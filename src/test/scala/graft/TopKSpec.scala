package graft

import graft.operators.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded top-k-per-group semantics the oracle pins down only on the
  * bench corpus: exact equality with the naive window rank on adversarial
  * shapes — ties straddling the cutoff, groups smaller than k, null
  * group keys, and a mega-group.
  */
class TopKSpec extends SparkSuite {

  private def referenceTopk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
        )
      )
      .filter(col("rk") <= k)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "g", "s", "rk").collect().map(_.toSeq).toSet

  test("equals the window rank on cutoff-straddling ties, small groups, and null groups") {
    import spark.implicits._
    val rows =
      // group a: 10 rows, scores so that the k=4 cutoff lands INSIDE a
      // tie run (five rows share score 7; ranks 3-7 — only ids with
      // tie-rank <= 2 survive).
      (1L to 2L).map(i => (i, Option("a"), 9L)) ++
        (3L to 7L).map(i => (i, Option("a"), 7L)) ++
        (8L to 10L).map(i => (i, Option("a"), 1L)) ++
        // group b smaller than k: everything kept.
        (11L to 12L).map(i => (i, Option("b"), 5L)) ++
        // null group: must come back, as its own group.
        (13L to 18L).map(i => (i, Option.empty[String], i)) ++
        // mega-group c: 500 rows, distinct scores.
        (100L to 599L).map(i => (i, Option("c"), 1000L - i))
    val df = rows.toDF("id", "g", "s")
    val k = 4
    val got = asSet(TopK.topkPerGroup(df, "g", "s", "id", k).withColumn("rk", col("rk")))
    val want = asSet(referenceTopk(df, k))
    assert(got == want)
    // The tie run at the cutoff kept exactly ids 3 and 4 (doc-id order).
    val aIds = got.filter(_(1) == "a").map(_.head.asInstanceOf[Long]).toSet
    assert(aIds == Set(1L, 2L, 3L, 4L))
    // Null group present with k rows (scores 18,17,16,15).
    assert(got.count(_(1) == null) == k)
  }

  test("an all-tied group (one giant score cell) still selects k by id order") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, "x", 5L)).toDF("id", "g", "s")
    val got = TopK.topkPerGroup(df, "g", "s", "id", 10).select("id").as[Long].collect().toSet
    assert(got == (1L to 10L).toSet)
  }
}
