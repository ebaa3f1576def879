package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Queries with `oracle = None` are validated by ScalaTest specs instead
  * (the driver records a weaker rows-only check for them).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Included in the Bench headline set when true. */
    bench: Boolean = false,
    /** Included in the Bench SECOND group (round-5+ hot families) when
      * true. Group 1 is frozen since r4 so its per-query numbers stay
      * comparable round-over-round; group 2 makes perf regressions in
      * the newer operators visible. The reported headline total stays
      * group-1-only for the same reason.
      */
    bench2: Boolean = false
)

/** Lineage-truncation helper shared by the iterative operators
  * (Bpe.train, Dedup.assignClusters, ConnectedComponents): a
  * `localCheckpoint` plans as `LogicalRDD`, and holding that RDD handle
  * is the only way to release the checkpoint blocks once the NEXT round
  * has materialized past them (`Dataset.unpersist` only clears
  * CacheManager entries, not RDD-level checkpoint storage).
  *
  * CAVEAT (real cluster): truncating lineage means lost executor blocks
  * cannot be recomputed; deployments with a configured checkpoint dir
  * should use reliable `checkpoint()` for the same discipline.
  */
object Lineage {
  def checkpointRdd(df: DataFrame, who: String): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case other =>
        // A localCheckpoint always plans as LogicalRDD today; if a Spark
        // upgrade changes that shape, say so instead of silently leaking
        // every checkpoint's blocks for the rest of the session.
        System.err.println(
          s"[graft.$who] localCheckpoint planned as ${other.getClass.getSimpleName}, " +
            "not LogicalRDD — checkpoint blocks will not be released eagerly"
        )
        None
    }

  /** Deferred-release registry for NON-iterative checkpoint sites
    * (ImageFeatures.nearDupOf, CurationQueries.stridedSpansOf): the
    * operator returns a lazy frame riding a localCheckpoint, so it
    * cannot release the blocks itself — `Dataset.unpersist`/clearCache
    * would not free them, and GC is the only fallback. The operator
    * registers the handle with [[hold]]; the consumer calls
    * [[releaseHeld]] AFTER its action completes (Verify/Bench do, per
    * query, next to `clearCache`). CONTRACT: release truncates the
    * checkpointed lineage, so frames returned before a `releaseHeld()`
    * must not be re-executed after it — re-derive them instead.
    */
  private val held = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  def hold(df: DataFrame, who: String): DataFrame = {
    checkpointRdd(df, who).foreach(held.add)
    df
  }

  def releaseHeld(): Unit = {
    var r = held.poll()
    while (r != null) {
      r.unpersist(blocking = false)
      r = held.poll()
    }
  }
}

/** Testdata star-schema loaders. All operators read these tables; at
  * production scale the same code runs over partitioned cloud storage —
  * `spark.read.parquet` keeps partition pruning + column pruning intact.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table carries nanosecond parquet timestamps, which Spark's
    * vectorized reader rejects by default. We read them as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`, set in Verify/Bench sessions)
    * and convert to microsecond TimestampType here — the same truncation
    * DuckDB applies, keeping the oracle comparable. When a session reads
    * them as timestamps natively, this is a no-op.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // `div` (integral division) — a double division would round epoch
        // nanos (values >> 2^53) by up to ±128 ns and land on the wrong
        // microsecond near boundaries.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Parquet micros with isAdjustedToUTC=false read as TIMESTAMP_NTZ,
        // which time-arithmetic functions (unix_micros, window) reject.
        // The session timezone is pinned to UTC, so the cast reinterprets
        // the same wall-clock instant — identical to DuckDB's naive read.
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
