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

/** The local-fast / cluster-safe checkpoint seam (round-14, VERDICT r13
  * "what's wrong" #3): `localCheckpoint` stores blocks on the executors
  * and TRUNCATES lineage, so on a real cluster a lost executor kills the
  * job instead of recomputing — the right trade in local mode (no
  * executor loss, no DFS round-trip), the wrong one at 100 TB. With a
  * reliable checkpoint directory configured (`spark.graft.checkpointDir`
  * session conf, or the `SPARK_GRAFT_CHECKPOINT_DIR` env var) every
  * operator checkpoint routes through reliable `Dataset.checkpoint`
  * (DFS-backed, recomputable-free recovery) instead; unset (the local
  * default, and what the driver's bench sessions use) it stays
  * `localCheckpoint`. Both plan as `LogicalRDD`, so the
  * [[Lineage]] hold/release discipline is unchanged.
  */
object Checkpoint {
  private def dirOf(spark: org.apache.spark.sql.SparkSession): Option[String] =
    spark.conf
      .getOption("spark.graft.checkpointDir")
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)

  /** Checkpoint `df` (eager by default, like `Dataset.checkpoint`). */
  def of(df: DataFrame, eager: Boolean = true): DataFrame =
    dirOf(df.sparkSession) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir creates a unique subdir per context; set once.
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
}

/** Testdata star-schema loaders. All operators read these tables; at
  * production scale the same code runs over partitioned cloud storage —
  * `spark.read.parquet` keeps partition pruning + column pruning intact.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Input-parallelism floor for CPU-dense per-row kernels (optimization
    * guide §2.5 "input skew: one huge unsplittable file ... otherwise
    * repartition immediately after the read"): the testdata parquet
    * ships ONE row group per file, so a scan plans at file granularity —
    * 1-3 tasks regardless of cores — and a heavy per-row kernel placed
    * directly on the scan (ISO2709 round-trip map, winnowing anchor
    * selection, brute-force cosine) inherits that ceiling (measured:
    * the strided-span winnow ran as one 2.3 s task vs a 272 ms median
    * sibling at sf0.1 local[32]).
    *
    * APPLIED SELECTIVELY, not at every table read: a round-13
    * interleaved A/B (4 bench runs) showed a blanket floor on all scans
    * LOSES ~4 s on group 1 / ~5 s on group 2 — unioned reads multiply
    * to 64-96 partitions whose per-stage scheduling overhead, plus the
    * extra round-robin exchange under queries that immediately
    * hash-shuffle anyway (aggregates, windows, joins), swamps the
    * gains — while exactly the per-row-kernel sites win consistently
    * (ingest_pipeline 0.93→0.43 s, knn_cosine 0.61→0.40 s,
    * docs_duplicate_spans_strided 4.0→2.5 s).
    *
    * Conditional on the input actually planning below the session's
    * parallelism: a production table (many files / row groups) already
    * exceeds `defaultParallelism`, so this is a no-op at cluster scale —
    * it scales with the configured core count, never a constant.
    * Row-to-partition assignment is deterministic (Spark sorts before
    * round-robin repartition, SPARK-23207) and the consumers feed
    * partition-order-independent aggregates; the full oracle sweep
    * certifies output equality. `SPARK_GRAFT_FANOUT=off` disables it
    * for A/B measurement.
    */
  def fanOutForCpu(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // Scan-side parallelism probe via the FILE COUNT of the plan's leaf
    // relations (`inputFiles` walks the logical plan; no job, no plan
    // conversion) — NOT `df.rdd.getNumPartitions`, which under AQE
    // forces getFinalPhysicalPlan and would EXECUTE any upstream
    // exchange at probe time (r13 ADVICE). This helper is for per-row
    // kernels placed directly on a scan/union-of-scans; with one row
    // group per testdata file, partitions ≈ files. When file packing
    // makes partitions < files the probe only errs toward NOT adding an
    // exchange — the conservative side. Non-file inputs (0 files)
    // skip the fan-out.
    val files = df.inputFiles.length
    if (fanOutEnabled && files > 0 && files * 2 <= par) df.repartition(par)
    else df
  }

  private val fanOutEnabled =
    sys.env.getOrElse("SPARK_GRAFT_FANOUT", "on") != "off"

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
