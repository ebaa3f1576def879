package graft

import graft.operators.DoReMi

class DoReMiSpec extends SparkSuite {
  import spark.implicits._

  test("weights are a smoothed distribution over domains") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = DoReMi.domainWeights(docs).collect()
    val k = out.length
    assert(k > 1)
    val total = out.map(_.getAs[Double]("weight")).sum
    // Each weight is rounded to 4 dp, so the sum drifts by ≤ k·5e-5.
    assert(math.abs(total - 1.0) <= k * 5e-5 + 1e-9)
    // Uniform smoothing floors every domain at c/K.
    out.foreach(r => assert(r.getAs[Double]("weight") >= 0.2 / k - 1e-4))
  }

  test("the domain the bigram model explains best gets the most weight") {
    // Domain "pairs": every word deterministically predicts its
    // successor (w_i -> w_{i+1} within a doc), so the bigram reference
    // is far better than the unigram proxy — large excess. Domain
    // "shuffled": the same vocabulary in varying order, so bigrams are
    // mostly singletons and Laplace smoothing makes the reference no
    // better. DoReMi must upweight "pairs".
    val pairDocs = (0 until 8).map { d =>
      (d.toLong, (0 until 20).map(i => s"w${i % 10}").mkString(" "), "pairs")
    }
    val shufDocs = (0 until 8).map { d =>
      // Deterministic per-doc permutation via a stride coprime to 10.
      val stride = Seq(3, 7, 9, 1, 3, 7, 9, 1)(d)
      (100L + d, (0 until 20).map(i => s"w${(i * stride + d) % 10}").mkString(" "), "shuffled")
    }
    val docs = (pairDocs ++ shufDocs).toDF("doc_id", "text", "source")
    val out = DoReMi
      .domainWeights(docs)
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("weight"))
      .toMap
    assert(
      out("pairs") > out("shuffled"),
      s"expected pairs > shuffled, got $out"
    )
  }
}
