package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement experiments for the optimization round (not a
  * registered query; numbers land in OPTIMIZATION_r13.md).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskTime = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskTime.addAndGet(t.taskMetrics.executorRunTime)
    })
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val tt0 = taskTime.get()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val tt = (taskTime.get() - tt0) / 1e3
      println(f"[scratch] $name%-40s wall=$wall%7.3f s  task=$tt%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.operators.{Dedup, DedupQueries}

    // Warmup full pipeline once (codegen).
    time("warmup dedup_records") {
      noop(Dedup.dedupRecords(DedupQueries.records(spark, sfDir)).select("id", "dedup_id"))
    }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    // E1: key computation alone.
    time("E1 records+withKeys noop") {
      noop(Dedup.withKeys(DedupQueries.records(spark, sfDir)))
    }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    // E2: keyed persisted + materialized, then edges.
    val keyed = Dedup.withKeys(DedupQueries.records(spark, sfDir)).persist()
    time("E2a keyed materialize (count)") { keyed.count() }
    val edges = Dedup.matchedEdges(keyed)
    time("E2b matchedEdges noop (keyed hot)") { noop(edges) }
    // E3: propagation from hot edges.
    time("E3 assignClusters (edges recomputed)") { noop(Dedup.assignClusters(edges)) }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    // E4: full pipeline, current shape.
    time("E4 dedupRecords full") {
      noop(Dedup.dedupRecords(DedupQueries.records(spark, sfDir)).select("id", "dedup_id"))
    }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    // E5: full pipeline with edges localCheckpointed before propagation
    // (kills any double computation of the sym cache).
    time("E5 dedupRecords, edges checkpointed") {
      val keyed2 = Dedup.withKeys(DedupQueries.records(spark, sfDir)).persist()
      val e = Dedup.matchedEdges(keyed2).localCheckpoint()
      val clusters = Dedup.assignClusters(e)
      noop(keyed2.select("id").join(clusters, Seq("id"), "left"))
    }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    // E6: repartitioned source (simulate the scan fan-out).
    time("E6 dedupRecords, records repartitioned") {
      val recs = DedupQueries.records(spark, sfDir).repartition(cpus.toInt)
      noop(Dedup.dedupRecords(recs).select("id", "dedup_id"))
    }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    // E7: E5+E6 combined.
    time("E7 dedupRecords, repart + ckpt edges") {
      val recs = DedupQueries.records(spark, sfDir).repartition(cpus.toInt)
      val keyed2 = Dedup.withKeys(recs).persist()
      val e = Dedup.matchedEdges(keyed2).localCheckpoint()
      val clusters = Dedup.assignClusters(e)
      noop(keyed2.select("id").join(clusters, Seq("id"), "left"))
    }
    spark.catalog.clearCache(); Lineage.releaseHeld()

    spark.stop()
  }
}
