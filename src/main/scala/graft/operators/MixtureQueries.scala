package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** UniMax language sampling (Chung et al. 2023, "UniMax: Fairer and More
  * Effective Language Sampling for Large-Scale Multilingual
  * Pretraining"): distribute a total token budget across languages as
  * uniformly as possible, capping every language at N epochs of its
  * corpus size. The closed form processes languages in ASCENDING size
  * order keeping a remaining budget R over k remaining languages:
  * `alloc = min(N * size, R div k)` (integer division keeps the
  * sequential arithmetic bit-exact across engines).
  *
  * Shape at 100 TB: one bounded-key aggregate (per-language token
  * sums — at most a few hundred languages), then the fold runs over a
  * collected language TABLE inside a single `aggregate()` HOF on a
  * one-row frame — the same corpus-never-moves pattern as the KMeans
  * centroid loop. The per-document sampling gate (alloc/size as a
  * keep-rate against an md5 bucket) stays map-only; only the
  * language table is tiny.
  */
object MixtureQueries {

  /** Epoch cap N and budget share (numerator/denominator of the total
    * corpus mass) — config, resolved at plan build.
    */
  private val Epochs = 2L
  private val BudgetNum = 1L
  private val BudgetDen = 2L

  val all: Seq[Q] = Seq(
    Q(
      "docs_sample_unimax",
      (s, d) => {
        // Shard 'en' into many small synthetic languages so BOTH branches
        // of the allocator run under the oracle: the tiny shards hit the
        // N-epoch cap, the big languages take the uniform share.
        val langKey = when(
          col("lang") === "en",
          concat(lit("en-"), (col("doc_id") % 40).cast("string"))
        ).otherwise(col("lang"))
        val langSizes = Tables
          .documents(s, d)
          .groupBy(langKey.as("lang"))
          .agg(sum(col("n_chars")).as("size"))
        // One row: languages ascending by (size, lang) + the total.
        val packed = langSizes.agg(
          sort_array(collect_list(struct(col("size"), col("lang")))).as("ls"),
          sum(col("size")).as("total")
        )
        // Exact integer floor division (a div b for non-negative longs):
        // subtract the remainder first so the double division is exact.
        def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          ((a - pmod(a, b)) / b).cast("long")
        val budget = idiv(col("total") * BudgetNum, lit(BudgetDen))
        val withAllocs = packed.select(
          col("ls"),
          aggregate(
            col("ls"),
            struct(
              budget.as("r"),
              array().cast("array<bigint>").as("allocs")
            ),
            (acc, l) => {
              val k = (size(col("ls")) - size(acc("allocs"))).cast("long")
              val alloc = least(lit(Epochs) * l("size"), idiv(acc("r"), k))
              struct(
                (acc("r") - alloc).as("r"),
                concat(acc("allocs"), array(alloc)).as("allocs")
              )
            }
          )("allocs").as("allocs")
        )
        withAllocs
          .select(posexplode(col("ls")).as(Seq("i", "l")), col("allocs"))
          .select(
            col("l")("lang").as("lang"),
            col("l")("size").as("lang_size"),
            element_at(col("allocs"), col("i") + 1).as("alloc"),
            // epochs in micro-units: alloc*1e6 div size (exact floor div)
            {
              val x = element_at(col("allocs"), col("i") + 1) * 1000000L
              ((x - pmod(x, col("l")("size"))) / col("l")("size"))
                .cast("long")
                .as("epochs_micro")
            }
          )
      },
      Some(
        s"""WITH RECURSIVE sizes AS (
           |  SELECT (CASE WHEN lang = 'en' THEN 'en-' || cast(doc_id % 40 as varchar) ELSE lang END) AS lang,
           |    sum(n_chars) AS size FROM documents GROUP BY 1),
           |ordered AS (
           |  SELECT lang, size,
           |    row_number() OVER (ORDER BY size, lang) AS rn,
           |    count(*) OVER () AS n,
           |    (sum(size) OVER () * $BudgetNum // $BudgetDen) AS budget
           |  FROM sizes),
           |alloc AS (
           |  SELECT 0 AS rn, cast(NULL as varchar) AS lang, cast(0 as bigint) AS size,
           |    cast(0 as bigint) AS a, (SELECT budget FROM ordered LIMIT 1) AS r
           |  UNION ALL
           |  SELECT o.rn, o.lang, o.size,
           |    least($Epochs * o.size, (p.r // (o.n - o.rn + 1))) AS a,
           |    p.r - least($Epochs * o.size, (p.r // (o.n - o.rn + 1))) AS r
           |  FROM alloc p JOIN ordered o ON o.rn = p.rn + 1)
           |SELECT lang, size AS lang_size, a AS alloc,
           |  (a * 1000000 // size) AS epochs_micro
           |FROM alloc WHERE rn > 0 ORDER BY lang""".stripMargin
      )
    )
  )
}
