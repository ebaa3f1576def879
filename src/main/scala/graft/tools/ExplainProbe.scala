package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan-shape audit for named registry queries: counts the operator
  * families that matter at scale (exchanges, joins, scans) so a plan
  * regression — e.g. the 2^rounds scan blowup the unpersisted EAD3
  * pointer-doubling loop exhibited — is visible in one line per query.
  * Usage: `runMain graft.tools.ExplainProbe q1 q2 ...` (defaults to the
  * round's structurally interesting queries).
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("ead3_split", "docs_gopher_repetition", "dedup_records_bucketed",
        "forward_tosolr_assembly", "marc_holdings_norm", "docs_dedup_eval_multiprobe")
    for (q <- qs) {
      val lines = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString.linesIterator.toSeq
      println(
        f"PLANSHAPE $q%-28s lines=${lines.size}%4d " +
          f"exch=${lines.count(_.contains("Exchange hashpartitioning"))}%3d " +
          f"bcast=${lines.count(_.contains("BroadcastExchange"))}%3d " +
          f"smj=${lines.count(_.contains("SortMergeJoin"))}%3d " +
          f"bhj=${lines.count(_.contains("BroadcastHashJoin"))}%3d " +
          f"scans=${lines.count(_.contains("FileScan"))}%3d " +
          f"inmem=${lines.count(_.contains("InMemoryTableScan"))}%3d"
      )
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
