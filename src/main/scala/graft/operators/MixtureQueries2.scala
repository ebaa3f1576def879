package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced corpus sampling (the diversity-quota step of
  * D4-style pipelines — Tirumala 2023 "D4: Improving LLM Pretraining
  * via Document De-Duplication and Diversification": after semantic
  * clustering, cap every cluster's contribution so head clusters of
  * near-boilerplate can't dominate the training mix). Each embedding
  * routes to its IVF cell (the deterministic coarse quantizer shared
  * with `ann_ivf`), each cell gets a uniform quota
  * `total div n_cells`, and members are kept by a deterministic
  * per-cell rank (md5 order) — oversized cells are truncated to the
  * quota, small cells keep everything.
  *
  * Shape at 100 TB (round-8 rewrite): cell assignment is map-only, and
  * the per-cell rank is SALTED — embedding skew makes mega-cells the
  * norm (the reason `embed_semdedup` caps heavy cells), and a plain
  * `row_number() OVER (PARTITION BY cell)` would sort the mega-cell on
  * one task. The md5 rank key makes the split exact AND balanced: the
  * window partitions on (cell, first-2-hex-chars-of-rank-key) — 256
  * uniform subgroups per cell, because md5 prefixes are uniform — and
  * the global per-cell rank is recovered as `rank within subgroup +
  * count of earlier subgroups' members`, a bounded (cells × 256)
  * aggregate joined back by broadcast. Lexicographic md5 order equals
  * (prefix group asc, rank within group asc), so the recovered rank is
  * bit-identical to the unsalted one. The md5 rank also makes re-runs
  * reproducible — the same documents survive on any cluster layout.
  */
object MixtureQueries2 {

  /** Balanced sampling over any (vec_id, embedding) frame — see the
    * object doc for the salted-rank scale shape. Exposed for the skew
    * scale probe.
    */
  def balancedSampleOf(embeddings: org.apache.spark.sql.DataFrame, cells: Int = 8)
      : org.apache.spark.sql.DataFrame = {
    val emb = embeddings.select(
      col("vec_id"),
      LlmQueries2.ivfCell(col("embedding"), cells).as("cell")
    )
    // quota = total div cells — a 1-row broadcast joined on a
    // NON-FOLDABLE constant key (the house pattern: a foldable key
    // would constant-fold into a cartesian and trip the PlanSpec
    // guard; BroadcastHashJoin on the computed key is exchange-free
    // on the fact side).
    val quota = emb
      .groupBy((col("vec_id") * 0).as("k"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("k"),
        (col("n") - pmod(col("n"), lit(cells))).divide(lit(cells)).cast("long").as("quota")
      )
    val withQuota = emb
      .withColumn("k", col("vec_id") * 0)
      .join(broadcast(quota), Seq("k"))
      .withColumn("rk", md5(concat(lit("bal"), col("vec_id").cast("string"))))
      .withColumn("salt", substring(col("rk"), 1, 2))
    // Bounded (cell, salt) census → members in lexicographically
    // EARLIER salt groups of the same cell. ≤ cells×256 rows:
    // broadcast, so the rank recovery is map-only on the fact side.
    val saltCounts = withQuota.groupBy("cell", "salt").agg(count(lit(1)).as("sc"))
    val before = saltCounts
      .withColumn(
        "salt_before",
        coalesce(
          sum(col("sc")).over(
            Window
              .partitionBy(col("cell"))
              .orderBy(col("salt"))
              .rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("cell", "salt", "salt_before")
    val w = Window
      .partitionBy(col("cell"), col("salt"))
      .orderBy(col("rk"), col("vec_id"))
    withQuota
      .join(broadcast(before), Seq("cell", "salt"))
      .withColumn("cell_rank", col("salt_before") + row_number().over(w))
      .select(
        col("vec_id"),
        col("cell"),
        col("cell_rank").cast("long").as("cell_rank"),
        (col("cell_rank") <= col("quota")).as("kept")
      )
  }

  val all: Seq[Q] = Seq(
    Q(
      "embed_sample_balanced",
      (s, d) => balancedSampleOf(Tables.embeddings(s, d)),
      Some {
        val weight =
          "(strpos('0123456789abcdef', substr(md5('ivf' || cast(c as varchar) || ':' || cast(dd - 1 as varchar)), 1, 1)) - 1 - 7.5)"
        val scores =
          s"list_transform(range(0, 8), c -> list_sum(list_transform(range(1, len(e) + 1), dd -> e[dd] * $weight)))"
        s"""WITH t AS (SELECT vec_id, cast(embedding as double[]) AS e FROM embeddings),
           |b AS (SELECT vec_id, list_position(sc, list_max(sc)) AS cell
           |      FROM (SELECT vec_id, e, $scores AS sc FROM t) _s),
           |q AS (SELECT (count(*) // 8) AS quota FROM b),
           |r AS (SELECT vec_id, cell,
           |        row_number() OVER (PARTITION BY cell
           |          ORDER BY md5('bal' || cast(vec_id as varchar)), vec_id) AS cell_rank
           |      FROM b)
           |SELECT vec_id, cell, cell_rank, cell_rank <= (SELECT quota FROM q) AS kept
           |FROM r ORDER BY vec_id""".stripMargin
      }
    )
  )
}
