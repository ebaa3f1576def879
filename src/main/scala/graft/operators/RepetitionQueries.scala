package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.{normalizeText, words}
import org.apache.spark.sql.functions._

/** Gopher repetition filters (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", Appendix A.1.2) —
  * the repetition half of the rule set `docs_gopher_rules` does not
  * cover: documents dominated by duplicated lines or n-grams are
  * boilerplate/spam and poison training mixes.
  *
  * Metrics (exact integer per-mille; definitions pinned here since the
  * paper leaves implementation latitude — these follow the common public
  * implementations):
  *   - dup_line_permille: fraction of (non-empty) lines that are repeats
  *     of an earlier identical line = sum over line groups of (count−1)
  *     over total lines.
  *   - dup_line_char_permille: fraction of line characters in those
  *     repeated occurrences = sum of (count−1)·len over groups, over
  *     total line characters.
  *   - top2gram_char_permille: characters covered by the most frequent
  *     word 2-gram = count·len(gram) over normalized text length
  *     (overlap-counting, as in the public implementations; ties break
  *     deterministically by count desc, length desc, gram asc).
  *   - dup5gram_char_permille: characters covered by ALL word 5-grams
  *     occurring more than once = Σ count·len over duplicated grams,
  *     over normalized text length (overlap-counting upper bound).
  *
  * Thresholds are Rae A1's: 300‰ / 200‰ / 200‰ / 150‰ → per-rule flags
  * + conjunction pass.
  *
  * Scale shape: three explode→groupBy passes, every aggregation keyed by
  * (doc_id, token) — embarrassingly parallel, no global state, partial
  * aggregation map-side; the per-doc rollups join back on doc_id. No
  * within-document state exceeds the document itself.
  */
object RepetitionQueries {

  /** The metric pipeline over any (doc_id, text) frame — shared by the
    * registry query and the ScaleProbe `repetition` mode.
    */
  def metricsOf(input: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val docs = input
      .select(
        col("doc_id"),
        coalesce(col("text"), lit("")).as("t"),
        normalizeText(coalesce(col("text"), lit(""))).as("norm")
      )
    val base = docs.select(
          col("doc_id"),
          length(col("norm")).as("total_chars"),
          filter(split(col("t"), "\n"), l => l =!= "").as("lines"),
          words(col("t")).as("ws")
        )

        // Line duplication: one group per (doc, line).
        val lineAgg = base
          .select(col("doc_id"), explode(col("lines")).as("line"))
          .groupBy("doc_id", "line")
          .agg(count(lit(1)).as("c"), first(length(col("line"))).as("len"))
          .groupBy("doc_id")
          .agg(
            sum(col("c")).as("n_lines"),
            sum(col("c") - 1).as("n_dup_lines"),
            sum(col("c") * col("len")).as("line_chars"),
            sum((col("c") - 1) * col("len")).as("dup_line_chars")
          )

        def grams(n: Int) = {
          val ws = col("ws")
          // Guarded: Spark's sequence(1, k) turns DESCENDING for k < 1,
          // which would feed element_at an illegal 0 index under ANSI.
          when(
            size(ws) >= n,
            transform(
              sequence(lit(1), size(ws) - (n - 1)),
              i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*)
            )
          ).otherwise(array().cast("array<string>"))
        }

        // Most frequent 2-gram (deterministic tie-break).
        val top2 = base
          .select(col("doc_id"), explode(grams(2)).as("g"))
          .groupBy("doc_id", "g")
          .agg(count(lit(1)).as("c"))
          .withColumn(
            "rn",
            row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("doc_id")
                .orderBy(col("c").desc, length(col("g")).desc, col("g").asc)
            )
          )
          .filter(col("rn") === 1)
          .select(col("doc_id"), (col("c") * length(col("g"))).as("top2_chars"))

        // All duplicated 5-grams.
        val dup5 = base
          .select(col("doc_id"), explode(grams(5)).as("g"))
          .groupBy("doc_id", "g")
          .agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .groupBy("doc_id")
          .agg(sum(col("c") * length(col("g"))).as("dup5_chars"))

        base
          .select(col("doc_id"), col("total_chars"))
          .join(lineAgg, Seq("doc_id"), "left")
          .join(top2, Seq("doc_id"), "left")
          .join(dup5, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            expr("coalesce(n_dup_lines, 0) * 1000 div greatest(coalesce(n_lines, 0), 1)")
              .as("dup_line_permille"),
            expr("coalesce(dup_line_chars, 0) * 1000 div greatest(coalesce(line_chars, 0), 1)")
              .as("dup_line_char_permille"),
            expr("coalesce(top2_chars, 0) * 1000 div greatest(total_chars, 1)")
              .as("top2gram_char_permille"),
            expr("coalesce(dup5_chars, 0) * 1000 div greatest(total_chars, 1)")
              .as("dup5gram_char_permille")
          )
          .withColumn("dup_line_ok", col("dup_line_permille") <= 300)
          .withColumn("dup_line_char_ok", col("dup_line_char_permille") <= 200)
          .withColumn("top2gram_ok", col("top2gram_char_permille") <= 200)
          .withColumn("dup5gram_ok", col("dup5gram_char_permille") <= 150)
          .withColumn(
            "pass",
            col("dup_line_ok") && col("dup_line_char_ok") &&
              col("top2gram_ok") && col("dup5gram_ok")
          )
  }

  val all: Seq[Q] = Seq(
    Q(
      "docs_gopher_repetition",
      (s, d) => metricsOf(Tables.documents(s, d)),
      Some {
        val norm = "lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))"
        s"""WITH base AS (
           |  SELECT doc_id, length($norm) AS total_chars,
           |    list_filter(string_split(coalesce(text, ''), chr(10)), l -> l != '') AS lines,
           |    string_split($norm, ' ') AS ws
           |  FROM documents),
           |lx AS (SELECT doc_id, unnest(lines) AS line FROM base),
           |lg AS (SELECT doc_id, line, count(*) AS c, length(line) AS len
           |       FROM lx GROUP BY doc_id, line),
           |la AS (SELECT doc_id, sum(c) AS n_lines, sum(c - 1) AS n_dup_lines,
           |         sum(c * len) AS line_chars, sum((c - 1) * len) AS dup_line_chars
           |       FROM lg GROUP BY doc_id),
           |g2x AS (
           |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
           |    i -> ws[i] || ' ' || ws[i + 1])) AS g
           |  FROM base),
           |g2 AS (SELECT doc_id, g, count(*) AS c FROM g2x GROUP BY doc_id, g),
           |t2 AS (SELECT doc_id, c * length(g) AS top2_chars,
           |         row_number() OVER (PARTITION BY doc_id
           |           ORDER BY c DESC, length(g) DESC, g ASC) AS rn
           |       FROM g2),
           |top2 AS (SELECT doc_id, top2_chars FROM t2 WHERE rn = 1),
           |g5x AS (
           |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
           |    i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] || ' ' || ws[i + 4])) AS g
           |  FROM base),
           |g5 AS (SELECT doc_id, g, count(*) AS c FROM g5x GROUP BY doc_id, g),
           |dup5 AS (SELECT doc_id, sum(c * length(g)) AS dup5_chars
           |         FROM g5 WHERE c > 1 GROUP BY doc_id),
           |m AS (
           |  SELECT b.doc_id,
           |    coalesce(la.n_dup_lines, 0) * 1000 // greatest(coalesce(la.n_lines, 0), 1) AS dup_line_permille,
           |    coalesce(la.dup_line_chars, 0) * 1000 // greatest(coalesce(la.line_chars, 0), 1) AS dup_line_char_permille,
           |    coalesce(top2.top2_chars, 0) * 1000 // greatest(b.total_chars, 1) AS top2gram_char_permille,
           |    coalesce(dup5.dup5_chars, 0) * 1000 // greatest(b.total_chars, 1) AS dup5gram_char_permille
           |  FROM base b
           |  LEFT JOIN la ON b.doc_id = la.doc_id
           |  LEFT JOIN top2 ON b.doc_id = top2.doc_id
           |  LEFT JOIN dup5 ON b.doc_id = dup5.doc_id)
           |SELECT doc_id,
           |  cast(dup_line_permille as bigint) AS dup_line_permille,
           |  cast(dup_line_char_permille as bigint) AS dup_line_char_permille,
           |  cast(top2gram_char_permille as bigint) AS top2gram_char_permille,
           |  cast(dup5gram_char_permille as bigint) AS dup5gram_char_permille,
           |  dup_line_permille <= 300 AS dup_line_ok,
           |  dup_line_char_permille <= 200 AS dup_line_char_ok,
           |  top2gram_char_permille <= 200 AS top2gram_ok,
           |  dup5gram_char_permille <= 150 AS dup5gram_ok,
           |  (dup_line_permille <= 300 AND dup_line_char_permille <= 200
           |   AND top2gram_char_permille <= 200 AND dup5gram_char_permille <= 150) AS pass
           |FROM m""".stripMargin
      }
    )
  )
}
