package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupQueries}

/** Scaling probe: replicates the dedup corpus N× (disjoint key spaces) and
  * times the full pipeline, to check the operator scales linearly rather
  * than quadratically before it ever meets a cluster.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = DedupQueries.records(spark, "/root/testdata/sf0.1")
    // Replicas must be disjoint in ALL dedup keys (title + isbn), not just
    // ids — otherwise blocks merge across replicas and candidate pairs
    // grow quadratically in `mult`, measuring block growth rather than
    // corpus growth. Prefixing the title perturbs its title_key; clearing
    // the isbn on replicas keeps isbn blocks constant-size.
    val big = (0 until mult)
      .map { i =>
        if (i == 0) base
        else
          base
            .withColumn("id", concat(lit(s"x$i."), col("id")))
            .withColumn("title", concat(lit(s"x$i"), col("title")))
            .withColumn("isbn", lit(""))
      }
      .reduce(_ union _)
    val total = big.count()
    val t0 = System.nanoTime()
    val n = Dedup.dedupRecords(big).filter(col("dedup_id").isNotNull).count()
    println(f"SCALE mult=$mult records=$total clustered=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
