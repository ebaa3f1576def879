package graft.tools
import org.apache.spark.sql.SparkSession
object AsmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("marc_tosolr_assembly", "lido_tosolr_assembly", "docs_sample_unimax", "embed_sample_balanced"); sf <- Seq("sf0.01", "sf0.1")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, s"/root/testdata/$sf").write.format("noop").mode("overwrite").save()
      println(f"probe $q $sf ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
