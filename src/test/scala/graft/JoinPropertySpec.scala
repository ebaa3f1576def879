package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: the composed temporal joins must agree with oblivious
  * brute-force references on randomized corpora — the banding/window
  * constructions carry all the correctness risk (bucket boundaries,
  * ties, per-user isolation), and random data hits combinations the
  * hand-built specs don't.
  */
class JoinPropertySpec extends SparkSuite {

  import spark.implicits._

  private val WinUs = 1800000000L

  private case class E(id: Long, user: Long, us: Long, typ: String)

  /** Random corpus: few users, timestamps clustered near bucket
    * boundaries (multiples of the 30-min window ± small jitter) so
    * cross-bucket and tie cases occur constantly.
    */
  private def corpusGen: Gen[List[E]] =
    for {
      n <- Gen.choose(5, 40)
      evs <- Gen.listOfN(
        n,
        for {
          user <- Gen.choose(1L, 4L)
          bucket <- Gen.choose(0L, 3L)
          jitter <- Gen.choose(-3L, 3L)
          typ <- Gen.oneOf("click", "purchase", "view")
        } yield (user, bucket * WinUs + jitter * 600000000L, typ)
      )
    } yield evs.zipWithIndex.map { case ((u, us, t), i) =>
      E(i.toLong + 1, u, math.max(us, 0L), t)
    }

  private def df(es: List[E]): DataFrame =
    es.map(e => (e.id, e.user, e.us, e.typ))
      .toDF("event_id", "user_id", "us", "event_type")

  test("interval join equals the brute-force band filter on random corpora") {
    (1L to 25L).foreach { seed =>
      val es = corpusGen.apply(Gen.Parameters.default, Seed(seed)).get
      val got = operators.JoinQueries
        .intervalOf(df(es))
        .collect()
        .map(r => (r.getAs[Long]("purchase_event_id"), r.getAs[Long]("click_event_id")))
        .toSet
      val want = (for {
        p <- es if p.typ == "purchase"
        c <- es if c.typ == "click" && c.user == p.user &&
          c.us >= p.us - WinUs && c.us < p.us
      } yield (p.id, c.id)).toSet
      assert(got === want, s"seed=$seed corpus=$es")
    }
  }

  test("asof join equals the brute-force latest-prior scan on random corpora") {
    (1L to 25L).foreach { seed =>
      val es = corpusGen.apply(Gen.Parameters.default, Seed(seed)).get
      // The operator needs a ts column only for display formatting; feed
      // micros through timestamp_micros.
      val e = df(es).withColumn(
        "ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("us")
        )
      )
      val got = operators.JoinQueries
        .asofOf(e)
        .collect()
        .map(r =>
          r.getAs[Long]("event_id") ->
            Option(r.getAs[java.lang.Long]("click_event_id")).map(_.longValue())
        )
        .toMap
      val want = es
        .filter(_.typ == "purchase")
        .map { p =>
          // Backward-inclusive under the total (us, id) order: the click
          // with the largest (us, id) strictly below the purchase's.
          val prior = es.filter(c =>
            c.typ == "click" && c.user == p.user &&
              (c.us < p.us || (c.us == p.us && c.id < p.id))
          )
          p.id -> (if (prior.isEmpty) None
                   else Some(prior.maxBy(c => (c.us, c.id)).id))
        }
        .toMap
      assert(got === want, s"seed=$seed corpus=$es")
    }
  }
}
