package graft.tools

import graft.operators.{Dedup, DedupQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B timing for dedup_records variants (dev tool):
  *  A. current pipeline (persisted keys, 2-join propagation rounds)
  *  B. no keyed persist (recompute the cheap fused key expressions)
  *  C. union-fused propagation (1 join + 1 agg per round instead of 2+1)
  */
object DedupProbe2 {

  /** Union-fused min-label propagation: per round, peer messages and own
    * labels union into ONE aggregate; old-vs-new compare rides the same
    * groupBy (min over tagged sources), so a round is 1 join + 1 agg.
    */
  def assignClustersFused(edges: DataFrame, iters: Int = 10): DataFrame = {
    val sym = edges
      .select(col("id_1").as("id"), col("id_2").as("peer"))
      .union(edges.select(col("id_2").as("id"), col("id_1").as("peer")))
      .persist()
    var labels = sym
      .groupBy("id")
      .agg(min(col("peer")).as("min_peer"))
      .select(col("id"), least(col("min_peer"), col("id")).as("dedup_id"))
      .persist()
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val msgs = sym
        .join(
          labels.select(col("id").as("peer"), col("dedup_id").as("peer_label")),
          Seq("peer")
        )
        .select(col("id"), col("peer_label").as("lbl"), lit(false).as("own"))
      val next = msgs
        .union(labels.select(col("id"), col("dedup_id").as("lbl"), lit(true).as("own")))
        .groupBy("id")
        .agg(
          min(col("lbl")).as("dedup_id"),
          min(when(col("own"), col("lbl"))).as("__old")
        )
        .select(
          col("id"),
          col("dedup_id"),
          (col("dedup_id") < col("__old")).as("__decreased")
        )
        .persist()
      val nDecreased = next.filter(col("__decreased")).count()
      labels.unpersist()
      labels = next
      converged = nDecreased == 0
    }
    labels.select("id", "dedup_id")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe2] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(label: String)(body: => DataFrame): Unit = {
      spark.catalog.clearCache()
      time(label)(body.write.format("noop").mode("overwrite").save())
    }
    val recs = () => DedupQueries.records(spark, sfDir)

    // Warmup
    run("warmup (current)")(Dedup.dedupRecords(recs()))

    for (pass <- 1 to 2) {
      run(s"A current (pass $pass)")(Dedup.dedupRecords(recs()))
      run(s"B no-persist keys (pass $pass)") {
        val keyed = Dedup.withKeys(recs())
        val clusters = Dedup.assignClusters(Dedup.matchedEdges(keyed))
        keyed.select("id").join(clusters, Seq("id"), "left")
      }
      run(s"C fused rounds (pass $pass)") {
        val keyed = Dedup.withKeys(recs()).persist()
        val clusters = assignClustersFused(Dedup.matchedEdges(keyed))
        keyed.select("id").join(clusters, Seq("id"), "left")
      }
      run(s"D both (pass $pass)") {
        val keyed = Dedup.withKeys(recs())
        val clusters = assignClustersFused(Dedup.matchedEdges(keyed))
        keyed.select("id").join(clusters, Seq("id"), "left")
      }
    }
    // Equivalence check: same cluster assignment as current.
    val cur = Dedup.dedupRecords(recs()).filter(col("dedup_id").isNotNull)
    val keyed = Dedup.withKeys(recs())
    val fused = keyed
      .select("id")
      .join(assignClustersFused(Dedup.matchedEdges(keyed)), Seq("id"), "left")
      .filter(col("dedup_id").isNotNull)
    val diff = cur.exceptAll(fused).count() + fused.exceptAll(cur).count()
    println(s"[probe2] equivalence diff rows = $diff")
    spark.stop()
  }
}
