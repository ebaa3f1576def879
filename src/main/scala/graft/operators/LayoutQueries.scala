package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Z-order file-layout optimization — the data-skipping story at 100 TB.
  *
  * A 100 TB table is only fast to query if most files can be SKIPPED from
  * their min/max column statistics; skipping works on at most one sort
  * dimension unless rows are clustered on a space-filling curve. This
  * module normalizes two dimensions — user and time — to a common 16-bit
  * scale, computes the Morton (Z) value, and reports the per-file
  * bounding boxes a Z-ordered layout produces: exactly what an
  * `OPTIMIZE ... ZORDER BY` pass in a lakehouse table format
  * materializes before writing.
  *
  * Normalization matters: interleaving RAW values is a no-op when one
  * dimension spans fewer bits than the other (its bits sit below the
  * other's high bits, and the curve degenerates to a plain sort on the
  * wider column — measured, not hypothetical: the un-normalized variant
  * produced time-slice files with full-width user ranges, zero pruning
  * gain). Production systems interleave range-partition ids for the
  * same reason; min/max scaling is the deterministic equivalent.
  *
  * Shapes:
  *  - One bounded aggregate computes global min/max per dimension
  *    (map-side combined; production reads them from table metadata);
  *    the 1-row result rides a computed-key BROADCAST hash join — never
  *    a nested-loop.
  *  - The z-value is pure integer bit arithmetic (the 5-step bit-spread,
  *    "Interleave bits by Binary Magic Numbers"), codegen'd map-only
  *    work — no UDF.
  *  - File assignment uses FIXED-WIDTH z-ranges (top 6 bits → ≤64
  *    files): a pure function of the row, needing no global sort. A
  *    production writer would `repartitionByRange(zval)` for even file
  *    sizes; the statistics this query verifies are the same either way.
  *  - The per-file report (count + min/max of both dimensions) is the
  *    input a scan planner prunes with; LayoutSpec asserts the Z layout
  *    beats arrival-order files ≥4× on expected files touched by a
  *    single-dimension predicate.
  */
object LayoutQueries {

  /** Origin minute: 2024-01-01 00:00:00 UTC — the testdata epoch. */
  private val OriginMin = 1704067200L / 60L

  /** 5-step bit spread of a 16-bit value into even bit positions, as an
    * engine SQL expression. `shift` abstracts the left-shift syntax
    * difference (Spark `shiftleft(x, n)`, DuckDB `x << n`).
    */
  private def spreadSql(in: String, shift: (String, Int) => String): String = {
    var e = s"($in & 65535)"
    for ((sh, mask) <- Seq(8 -> 0x00ff00ffL, 4 -> 0x0f0f0f0fL, 2 -> 0x33333333L, 1 -> 0x55555555L))
      e = s"((($e | ${shift(e, sh)}) & $mask))"
    e
  }

  private val sparkShift = (x: String, n: Int) => s"shiftleft($x, $n)"
  private val duckShift = (x: String, n: Int) => s"($x << $n)"

  /** Morton value of (x, y), both already clamped to 16 bits. */
  private def zSql(x: String, y: String, shift: (String, Int) => String): String =
    s"(${spreadSql(x, shift)} | ${shift(spreadSql(y, shift), 1)})"

  /** Min/max scale of `c` into [0, 65535] — integer arithmetic only. */
  private def scaleSql(c: String, lo: String, hi: String): String =
    s"((($c - $lo) * 65535) div greatest($hi - $lo, 1))"

  /** Test hook: the Spark-side Morton expression for (x, y) columns. */
  def zExprSparkForTest(x: String, y: String): String = zSql(x, y, sparkShift)

  /** Test hook: the Spark-side min/max scaling expression. */
  def scaleExprSparkForTest(c: String, lo: String, hi: String): String =
    scaleSql(c, lo, hi)

  private val layout = Q(
    "events_zorder_layout",
    (s, d) => {
      val pts = Tables
        .events(s, d)
        .select(
          col("user_id").as("x"),
          expr(s"unix_micros(ts) div 60000000 - $OriginMin").as("y")
        )
      // 1-row global stats joined back via a computed constant key: the
      // equi-key makes this a BroadcastHashJoin (a bare crossJoin of a
      // 1-row frame plans a nested loop, which the plan suite forbids).
      val stats = pts.agg(
        min("x").as("xlo"), max("x").as("xhi"),
        min("y").as("ylo"), max("y").as("yhi")
      )
      pts
        .withColumn("j", (col("x") - col("x")).cast("int"))
        .join(
          broadcast(
            stats.withColumn("j", (col("xlo") - col("xlo")).cast("int"))
          ),
          Seq("j")
        )
        .withColumn("x16", expr(scaleSql("x", "xlo", "xhi")))
        .withColumn("y16", expr(scaleSql("y", "ylo", "yhi")))
        .withColumn("z", expr(zSql("x16", "y16", sparkShift)))
        // Top 6 of the 32 z bits → ≤64 fixed-width "files".
        .withColumn("file_id", expr("z div 67108864"))
        .groupBy("file_id")
        .agg(
          count(lit(1)).as("n_rows"),
          min("x").as("min_user"),
          max("x").as("max_user"),
          min("y").as("min_minute"),
          max("y").as("max_minute")
        )
    },
    Some {
      val z = zSql("x16", "y16", duckShift)
      s"""WITH pts AS (
         |  SELECT user_id AS x,
         |    epoch_us(ts) // 60000000 - $OriginMin AS y
         |  FROM events),
         |stats AS (SELECT min(x) AS xlo, max(x) AS xhi,
         |                 min(y) AS ylo, max(y) AS yhi FROM pts),
         |scaled AS (
         |  SELECT x, y,
         |    ((x - xlo) * 65535) // greatest(xhi - xlo, 1) AS x16,
         |    ((y - ylo) * 65535) // greatest(yhi - ylo, 1) AS y16
         |  FROM pts, stats),
         |zz AS (SELECT x, y, $z AS z FROM scaled)
         |SELECT z // 67108864 AS file_id, count(*) AS n_rows,
         |  min(x) AS min_user, max(x) AS max_user,
         |  min(y) AS min_minute, max(y) AS max_minute
         |FROM zz GROUP BY 1""".stripMargin
    },
    bench = false
  )

  val all: Seq[Q] = Seq(layout)
}
