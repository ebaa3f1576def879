package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over an embedding column — the training
  * kernel behind a real IVF index. `ann_ivf` routes by fixed hash
  * projections; production IVF routes by trained centroids, and this is
  * the step that trains them.
  *
  * Scale shape per iteration: the K centroids collapse into ONE broadcast
  * row joined on a computed constant key (a BroadcastHashJoin — never a
  * nested loop), assignment is a per-row argmin over the centroid array
  * (sequential double arithmetic, bit-deterministic), and the update is a
  * posexplode + groupBy(cell, dim) aggregate whose key space is K×D —
  * tiny, so the shuffle is ~pure map-side combine at any corpus size. The
  * corpus is never shuffled; only K×D partial sums move. Driving
  * `step`/`centroids` in a loop is the full Lloyd algorithm, one action
  * per iteration, same pattern as [[Dedup.assignClusters]].
  */
object KMeans {

  /** Composed higher-order-function argmin — the cross-checkable
    * specification of [[graft.plans.NearestCentroidExpr]] (KMeansSpec
    * asserts equality). `cents` is an `array<struct<cell, cv>>` column.
    */
  def nearestCellHof(vec: Column, cents: Column): Column =
    aggregate(
      cents,
      struct(lit(-1L).as("cell"), lit(Double.MaxValue).as("dist")),
      (acc, c) => {
        val dsq = l2sq(vec, c.getField("cv"))
        when(
          dsq < acc.getField("dist"),
          // Aliases on non-trivial expressions inside a lambda don't
          // survive analysis (the struct resolves as col1/col2); cast to
          // the accumulator's shape so the CASE branches unify.
          struct(c.getField("cell").cast("long"), dsq)
            .cast("struct<cell:bigint,dist:double>")
        ).otherwise(acc)
      }
    ).getField("cell")

  /** Squared L2 distance, sequential double accumulation. */
  private[operators] def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(
        a,
        b,
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
      ),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** One Lloyd iteration.
    *
    * @param emb   (id, vec) — vec is array<float> or array<double>
    * @param seeds (cell, cv) — current centroids, ≤ a broadcastable count
    * @return (cell, dim, n, s_micro): per-centroid member count and exact
    *         per-dimension integer micro-unit sums (dim is 1-based; new
    *         centroid = s_micro / (1e6 * n)). Integer sums are
    *         order-independent under shuffle and tie-proof across engines
    *         (a float whose decimal expansion has exactly d+1 fraction
    *         digits ends in ...5, so a decimal(…,d) cast is a rounding tie
    *         that engines break differently; rounding x*1e6 decides on the
    *         same IEEE double everywhere), which is what lets a DuckDB
    *         oracle certify the step.
    */
  /** `(cell, cv)` seed rows collapsed into ONE deterministic broadcast
    * row `(j, cents)` — sorted by cell so tie-breaks don't depend on the
    * seeds' partitioning; the computed constant key `j` keeps the
    * downstream join a hash join (a literal key folds away and a bare
    * crossJoin plans the BroadcastNestedLoopJoin the plan suite reserves
    * for the knn baseline).
    */
  def centroidsRow(seeds: DataFrame): DataFrame =
    seeds
      .agg(sort_array(collect_list(struct(col("cell"), col("cv")))).as("cents"))
      .select((size(col("cents")) - size(col("cents")) + 1).cast("int").as("j"), col("cents"))

  /** Native nearest-centroid assignment column (argmin squared L2 over a
    * `array<struct<cell, cv>>` column; [[nearestCellHof]] is the
    * composed specification it is spec-asserted equal to).
    */
  def nearestCell(vec: Column, cents: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.plans.NearestCentroidExpr(
        org.apache.spark.sql.GraftColumn.exprOf(vec),
        org.apache.spark.sql.GraftColumn.exprOf(cents)
      )
    )

  def step(emb: DataFrame, seeds: DataFrame): DataFrame = {
    // Nearest centroid by squared L2; strict < keeps the lowest cell on
    // ties (the argmin ORDER BY dist, cell). Native kernel: the composed
    // HOF form ([[nearestCellHof]], kept as the cross-checkable
    // specification) costs ~14 ms/row interpreted — assignment would
    // dominate every Lloyd pass at scale.
    emb
      .withColumn("j", (size(col("vec")) * 0 + 1).cast("int"))
      .join(broadcast(centroidsRow(seeds)), Seq("j"))
      .select(nearestCell(col("vec"), col("cents")).as("cell"), posexplode(col("vec")))
      .select(
        col("cell"),
        (col("pos") + 1).cast("long").as("dim"),
        col("col").cast("double").as("x")
      )
      .groupBy("cell", "dim")
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("x") * 1e6).cast("long")).as("s_micro")
      )
  }

  /** Reassemble (cell, cv) centroids from a [[step]] output, for the next
    * iteration: cv[dim] = s_micro / (1e6 * n), dims ordered.
    */
  def centroids(stepOut: DataFrame): DataFrame =
    stepOut
      .groupBy("cell")
      .agg(
        transform(
          array_sort(
            collect_list(struct(col("dim"), (col("s_micro") / (col("n") * 1e6)).as("v")))
          ),
          _.getField("v")
        ).as("cv")
      )
}
