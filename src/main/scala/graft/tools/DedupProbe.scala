package graft.tools

import graft.operators.{Dedup, DedupQueries}
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing for the dedup_records pipeline (dev tool, not part
  * of the driver contract).
  */
object DedupProbe {
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
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val records = DedupQueries.records(spark, sfDir)
    time("records.count")(records.count())
    val keyed = Dedup.withKeys(records).persist()
    time("keyed materialize")(keyed.count())
    val edges = Dedup.matchedEdges(keyed)
    val e = time("matchedEdges")(edges.persist().count())
    println(s"[probe] edges = $e")
    val clusters = time("assignClusters")(Dedup.assignClusters(edges))
    time("clusters.count")(clusters.count())
    val out = keyed.select("id").join(clusters, Seq("id"), "left")
    time("final join + noop write")(
      out.write.format("noop").mode("overwrite").save()
    )
    time("full dedupRecords again")(
      Dedup.dedupRecords(DedupQueries.records(spark, sfDir)).write
        .format("noop").mode("overwrite").save()
    )
    // Warm JVM, cold cache: the honest bench condition.
    spark.catalog.clearCache()
    time("full dedupRecords cold-cache")(
      Dedup.dedupRecords(DedupQueries.records(spark, sfDir)).write
        .format("noop").mode("overwrite").save()
    )
    spark.catalog.clearCache()
    val k2 = Dedup.withKeys(DedupQueries.records(spark, sfDir))
    time("withKeys only")(
      k2.write.format("noop").mode("overwrite").save()
    )
    time("heavyKeys(title_key) on top")(
      Dedup.heavyKeys(k2, "title_key", Dedup.MaxBlockSize).write
        .format("noop").mode("overwrite").save()
    )
    spark.stop()
  }
}
