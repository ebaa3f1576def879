package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement experiments for the optimization round (not a
  * registered query; numbers land in OPTIMIZATION_r14.md).
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
      println(f"[scratch] $name%-44s wall=$wall%7.3f s  task=$tt%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reset(): Unit = { spark.catalog.clearCache(); Lineage.releaseHeld() }

    // AQE coalescing knob A/B on the CPU-dense reduce stages
    // (events_sessionize 2-task windows, merge_components 8-task agg).
    val names = Seq("events_sessionize", "merge_components", "docs_exact_dedup", "q1_agg")
    val qs = SparkEntry.registry.filter(q => names.contains(q.name))
    qs.foreach { q => // codegen warmup
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); reset()
    }
    for (rep <- 1 to 3; mps <- Seq("1MB", "64KB", "16KB")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", mps)
      qs.foreach { q =>
        time(s"A$rep mps=$mps ${q.name}") {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        reset()
      }
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")

    spark.stop()
  }
}
