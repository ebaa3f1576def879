package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level table profiling — the ANALYZE-TABLE face every
  * analytics engine exposes: one row per column with row count, null
  * count, exact distinct count, and min/max rendered to a
  * deterministic string form. The profile a pipeline snapshots before
  * and after an ingest to catch schema rot (nulls appearing, cardinality
  * collapse, range drift).
  *
  * Scale shape: one aggregate per column over a SINGLE-COLUMN
  * projection — parquet column pruning means each pass reads only its
  * own column; the union is 11 one-row frames. Exact COUNT(DISTINCT)
  * is the oracle-checkable form (it shuffles each column's distinct
  * values; the registry's KMV/HLL rows are the sketch variant to swap
  * in when a column's cardinality approaches the row count).
  *
  * Engine determinism: money/measure doubles profile through their
  * exact CENT representation (round(x·100) as int64 — the AnalyticsQueries
  * decimal discipline), timestamps format to seconds, and integer
  * min/max render as plain digits — no float-to-string formatting
  * crosses the engine boundary.
  */
object TableProfile {

  private def colProfile(
      t: DataFrame,
      name: String,
      v: Column,
      render: Column => Column
  ): DataFrame =
    t.agg(
      count(lit(1)).as("n"),
      sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(v).as("n_distinct"),
      render(min(v)).as("min_s"),
      render(max(v)).as("max_s")
    ).select(
      lit(name).as("column_name"),
      col("n"),
      col("n_null"),
      col("n_distinct"),
      col("min_s"),
      col("max_s")
    )

  def profileLineitem(t: DataFrame): DataFrame = {
    val asStr = (c: Column) => c.cast("string")
    val asTs = (c: Column) => date_format(c, "yyyy-MM-dd HH:mm:ss")
    def cents(name: String) = expr(s"cast(round($name * 100) as bigint)")
    val parts = Seq(
      colProfile(t, "l_orderkey", col("l_orderkey"), asStr),
      colProfile(t, "l_partkey", col("l_partkey"), asStr),
      colProfile(t, "l_suppkey", col("l_suppkey"), asStr),
      colProfile(t, "l_linenumber", col("l_linenumber"), asStr),
      colProfile(t, "l_quantity_c", cents("l_quantity"), asStr),
      colProfile(t, "l_extendedprice_c", cents("l_extendedprice"), asStr),
      colProfile(t, "l_discount_c", cents("l_discount"), asStr),
      colProfile(t, "l_tax_c", cents("l_tax"), asStr),
      colProfile(t, "l_returnflag", col("l_returnflag"), (c: Column) => c),
      colProfile(t, "l_linestatus", col("l_linestatus"), (c: Column) => c),
      colProfile(t, "l_shipdate", col("l_shipdate"), asTs)
    )
    parts.reduce(_ unionByName _)
  }

  private def oracleSql: String = {
    def row(name: String, v: String, render: String => String): String =
      s"""SELECT '$name' AS column_name, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN $v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $v) AS BIGINT) AS n_distinct,
         |  ${render(s"min($v)")} AS min_s, ${render(s"max($v)")} AS max_s
         |FROM lineitem""".stripMargin
    val asStr = (e: String) => s"CAST($e AS VARCHAR)"
    val asIs = (e: String) => e
    val asTs = (e: String) => s"strftime($e, '%Y-%m-%d %H:%M:%S')"
    def cents(c: String) = s"CAST(round($c * 100) AS BIGINT)"
    Seq(
      row("l_orderkey", "l_orderkey", asStr),
      row("l_partkey", "l_partkey", asStr),
      row("l_suppkey", "l_suppkey", asStr),
      row("l_linenumber", "l_linenumber", asStr),
      row("l_quantity_c", cents("l_quantity"), asStr),
      row("l_extendedprice_c", cents("l_extendedprice"), asStr),
      row("l_discount_c", cents("l_discount"), asStr),
      row("l_tax_c", cents("l_tax"), asStr),
      row("l_returnflag", "l_returnflag", asIs),
      row("l_linestatus", "l_linestatus", asIs),
      row("l_shipdate", "l_shipdate", asTs)
    ).mkString("\nUNION ALL\n")
  }

  private val profileQ = Q(
    "table_profile",
    (s, d) => profileLineitem(Tables.lineitem(s, d)),
    Some(oracleSql)
  )

  val all: Seq[Q] = Seq(profileQ)
}
