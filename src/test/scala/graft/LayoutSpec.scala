package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order layout: the value of a space-filling curve is PER-DIMENSION
  * file pruning — for a predicate on either column alone, far fewer
  * files' [min, max] ranges match. Total bounding-box area is invariant
  * between layouts (an 8×8 z-grid and 64 time slices tile the same
  * rectangle), so the metric here is expected files touched by a
  * uniform point predicate per dimension: Σ width_i / globalWidth.
  * Arrival-order files span every user (x-predicates touch all 64);
  * z-order files form a grid (≈8 of 64 per dimension).
  */
class LayoutSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("z-ordered files prune far better than arrival-order files") {
    // Per-file stats of the z layout, from the registered query itself.
    val zFiles = SparkEntry.queries("events_zorder_layout")(spark, sf)

    // Arrival-order baseline: same file count, files cut by event_id.
    val rowFiles = Tables
      .events(spark, sf)
      .select(
        col("user_id").as("x"),
        expr("unix_micros(ts) div 60000000 - 28401120").as("y"),
        col("event_id")
      )
      .withColumn("f", ntile(64).over(Window.orderBy("event_id")))
      .groupBy("f")
      .agg(
        min("x").as("min_user"), max("x").as("max_user"),
        min("y").as("min_minute"), max("y").as("max_minute")
      )

    def expectedFilesTouched(files: DataFrame): Double = {
      val rows = files.collect()
      val uW = (rows.map(_.getAs[Long]("max_user")).max -
        rows.map(_.getAs[Long]("min_user")).min + 1).toDouble
      val mW = (rows.map(_.getAs[Long]("max_minute")).max -
        rows.map(_.getAs[Long]("min_minute")).min + 1).toDouble
      val px = rows.map(r => (r.getAs[Long]("max_user") - r.getAs[Long]("min_user") + 1) / uW).sum
      val py = rows.map(r => (r.getAs[Long]("max_minute") - r.getAs[Long]("min_minute") + 1) / mW).sum
      px + py
    }

    assert(zFiles.count() > 16, "z layout produced too few files to compare")
    val zTouch = expectedFilesTouched(zFiles)
    val rowTouch = expectedFilesTouched(rowFiles)
    assert(
      zTouch * 3 < rowTouch,
      s"z-order expected-files-touched $zTouch not ≪ arrival-order $rowTouch"
    )
  }

  test("morton value interleaves bits exactly") {
    val z = spark
      .sql(
        s"SELECT ${graft.operators.LayoutQueries.zExprSparkForTest("5", "3")} AS z"
      )
      .collect()(0)
      .getAs[Number](0)
      .longValue()
    // x=5 (101b) occupies even bits 0 and 4; y=3 (11b) odd bits 1 and 3:
    // z = 1 + 2 + 8 + 16 = 27.
    assert(z === 27L)
  }

  test("min-max scaling maps the endpoints to 0 and 65535") {
    val r = spark
      .sql(
        "SELECT " +
          graft.operators.LayoutQueries.scaleExprSparkForTest("10", "10", "50") + " AS lo, " +
          graft.operators.LayoutQueries.scaleExprSparkForTest("50", "10", "50") + " AS hi, " +
          graft.operators.LayoutQueries.scaleExprSparkForTest("7", "7", "7") + " AS degenerate"
      )
      .collect()(0)
    assert(r.getAs[Number]("lo").longValue() === 0L)
    assert(r.getAs[Number]("hi").longValue() === 65535L)
    assert(r.getAs[Number]("degenerate").longValue() === 0L)
  }
}
