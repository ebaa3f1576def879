package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Merged-record building with SolrUpdater's per-field merge policies
  * (reference: Solr/SolrUpdater.php mergeRecords:2612).
  *
  * Semantics mirrored exactly:
  *   - Record scoring:2614 — fieldCount over the scored fields + title
  *     length, where a field counts as "uppercase" when >95% of its
  *     letters/digits are uppercase letters; score = fieldCount when the
  *     uppercase ratio is 0, else (fieldCount + titleLen) / ratio (the
  *     reference's formula, quirks included).
  *   - Records fold in score order (the PHP usort is unstable on ties;
  *     this implementation adds a deterministic id tiebreak).
  *   - Field policies:2656 — merged fields concatenate across records in
  *     fold order (`language`, `publisher` here), single fields take the
  *     first non-empty value (`title`, `format`), summed fields add
  *     numerically, and every member id lands in local_ids in fold order.
  *   - The author=author2 rule is config-gated off by default
  *     ('author=author2' is not in the default mergedFields list) and is
  *     therefore not modeled.
  *
  * Set-oriented shape: one groupBy(dedup_id) with an array_sort over the
  * collected (negScore, id, fields) structs — a single bounded-key
  * shuffle; the scoring is per-row and codegen'd.
  */
object MergePolicyQueries {

  private def upperRatioCounts(v: Column): (Column, Column) = {
    val upper = length(regexp_replace(v, "[^\\p{Lu}]", ""))
    val all = length(regexp_replace(v, "[^\\p{L}0-9]", ""))
    (upper, all)
  }

  /** 1 when >95% of the field's letters/digits are uppercase. */
  private def isUppercase(v: Column): Column = {
    val (u, a) = upperRatioCounts(v)
    when(a > 0 && u.cast("double") / a > 0.95, 1).otherwise(0)
  }

  val all: Seq[Q] = Seq(
    Q(
      "solr_merge_policies",
      (s, d) => {
        val k = col("p_partkey")
        val ks = k.cast("string")
        val recs = Tables
          .part(s, d)
          .select(
            concat(lit("g"), (k / 4).cast("long").cast("string")).as("dedup_id"),
            concat(lit("r."), ks).as("id"),
            when(k % 4 === 0, upper(col("p_name")))
              .when(k % 4 === 1, concat(col("p_name"), lit(" extended title")))
              .otherwise(col("p_name")).as("title"),
            when(k % 3 === 0, lit("")).otherwise(concat(lit("Author "), (k % 50).cast("string")))
              .as("author"),
            concat(lit("Pub "), (k % 30).cast("string")).as("publisher"),
            when(k % 2 === 0, lit("fin|eng")).otherwise(lit("swe")).as("langs_str"),
            when(k % 5 === 0, lit("")).otherwise(lit("Book")).as("format"),
            (k % 7).cast("long").as("n_items")
          )
        val fieldCount = (col("title") =!= "").cast("int") +
          (col("author") =!= "").cast("int") +
          (col("publisher") =!= "").cast("int")
        val upperCount = isUppercase(col("title")) + isUppercase(col("author")) +
          isUppercase(col("publisher"))
        val titleLen = length(col("title"))
        val ratio = upperCount.cast("double") / fieldCount
        val score = when(fieldCount === 0, lit(0.0))
          .when(upperCount === 0, fieldCount.cast("double"))
          .otherwise((fieldCount + titleLen).cast("double") / ratio)
        val scored = recs.withColumn("neg_score", -score)
        val packed = struct(
          col("neg_score"),
          col("id"),
          col("title"),
          col("format"),
          col("langs_str"),
          col("publisher"),
          col("n_items")
        )
        scored
          .groupBy(col("dedup_id"))
          .agg(collect_list(packed).as("members"))
          .select(
            col("dedup_id"),
            array_sort(col("members")).as("m")
          )
          .select(
            col("dedup_id"),
            array_join(transform(col("m"), _.getField("id")), ",").as("local_ids"),
            coalesce(
              get(filter(transform(col("m"), _.getField("title")), t => t =!= ""), lit(0)),
              lit("")
            ).as("title"),
            coalesce(
              get(filter(transform(col("m"), _.getField("format")), f => f =!= ""), lit(0)),
              lit("")
            ).as("format"),
            array_join(transform(col("m"), _.getField("langs_str")), "|").as("language"),
            array_join(transform(col("m"), _.getField("publisher")), "|").as("publisher"),
            aggregate(col("m"), lit(0L), (acc, x) => acc + x.getField("n_items"))
              .as("n_items_sum")
          )
      },
      Some {
        val upperExpr = (v: String) =>
          s"(CASE WHEN length(regexp_replace($v, '[^\\p{L}0-9]', '', 'g')) > 0 AND " +
            s"cast(length(regexp_replace($v, '[^\\p{Lu}]', '', 'g')) as double) / length(regexp_replace($v, '[^\\p{L}0-9]', '', 'g')) > 0.95 " +
            s"THEN 1 ELSE 0 END)"
        s"""WITH r AS (
           |  SELECT 'g' || cast(p_partkey // 4 as varchar) AS dedup_id,
           |    'r.' || cast(p_partkey as varchar) AS id,
           |    (CASE WHEN p_partkey % 4 = 0 THEN upper(p_name)
           |          WHEN p_partkey % 4 = 1 THEN p_name || ' extended title'
           |          ELSE p_name END) AS title,
           |    (CASE WHEN p_partkey % 3 = 0 THEN '' ELSE 'Author ' || cast(p_partkey % 50 as varchar) END) AS author,
           |    'Pub ' || cast(p_partkey % 30 as varchar) AS publisher,
           |    (CASE WHEN p_partkey % 2 = 0 THEN 'fin|eng' ELSE 'swe' END) AS langs_str,
           |    (CASE WHEN p_partkey % 5 = 0 THEN '' ELSE 'Book' END) AS format,
           |    cast(p_partkey % 7 as bigint) AS n_items
           |  FROM part),
           |sc AS (
           |  SELECT *,
           |    (CASE WHEN title != '' THEN 1 ELSE 0 END)
           |      + (CASE WHEN author != '' THEN 1 ELSE 0 END)
           |      + (CASE WHEN publisher != '' THEN 1 ELSE 0 END) AS fc,
           |    ${upperExpr("title")} + ${upperExpr("author")} + ${upperExpr("publisher")} AS uc,
           |    length(title) AS tl
           |  FROM r),
           |scored AS (
           |  SELECT *,
           |    (CASE WHEN fc = 0 THEN 0.0
           |          WHEN uc = 0 THEN cast(fc as double)
           |          ELSE cast(fc + tl as double) / (cast(uc as double) / fc) END) AS score
           |  FROM sc)
           |SELECT dedup_id,
           |  string_agg(id, ',' ORDER BY score DESC, id) AS local_ids,
           |  coalesce(list_filter(list(title ORDER BY score DESC, id), t -> t != '')[1], '') AS title,
           |  coalesce(list_filter(list(format ORDER BY score DESC, id), f -> f != '')[1], '') AS format,
           |  string_agg(langs_str, '|' ORDER BY score DESC, id) AS language,
           |  string_agg(publisher, '|' ORDER BY score DESC, id) AS publisher,
           |  cast(sum(n_items) as bigint) AS n_items_sum
           |FROM scored GROUP BY dedup_id""".stripMargin
      }
    )
  )
}
