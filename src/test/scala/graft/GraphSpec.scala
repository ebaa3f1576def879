package graft

import graft.operators.GraphQueries
import org.apache.spark.sql.functions._

/** PageRank semantics on hand-built graphs — the structural properties
  * the oracle compare certifies only pointwise on the trade graph.
  */
class GraphSpec extends SparkSuite {

  private def ranksOf(edges: Seq[(String, String, Long)]): Map[String, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "w")
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    GraphQueries
      .pagerank(sym)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
  }

  test("symmetric two-node graph converges to equal ranks") {
    val r = ranksOf(Seq(("a", "b", 1L)))
    assert(r("a") == r("b"))
  }

  test("star center outranks leaves; leaves tie") {
    val r = ranksOf(Seq(("hub", "x", 1L), ("hub", "y", 1L), ("hub", "z", 1L)))
    assert(r("hub") > r("x"))
    assert(r("x") == r("y") && r("y") == r("z"))
  }

  test("every node keeps at least the damping floor") {
    val r = ranksOf(Seq(("a", "b", 3L), ("b", "c", 1L), ("c", "d", 2L)))
    assert(r.values.forall(_ >= 150000L))
    assert(r.size == 4)
  }

  test("heavier edges pull proportionally more rank") {
    // d splits its mass 9:1 between a and b; a must outrank b.
    val r = ranksOf(Seq(("d", "a", 9L), ("d", "b", 1L)))
    assert(r("a") > r("b"))
  }
}
