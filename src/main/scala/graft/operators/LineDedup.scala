package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Duplicated-segment REMOVAL — the transform that acts on what
  * `docs_segment_dedup` measures. RefinedWeb/FineWeb-style pipelines
  * don't just report corpus-common boilerplate lines, they strip them
  * before training: every fixed 8-word segment (the registry's shared
  * unsegmented-text "line" proxy) that occurs in ≥ 5 distinct documents
  * is deleted, and the document is rebuilt from its surviving segments
  * in order. Output keeps the rebuilt text's md5 + length rather than
  * the text itself, so the oracle certifies the exact reconstruction
  * byte-for-byte while the result row stays narrow.
  *
  * Scale shape: identical to `docs_segment_dedup` — explode to
  * (doc, segment) with a positional index, ONE map-side-combinable
  * count aggregation keyed by the segment hash (bounded by distinct
  * segment vocabulary, not corpus rows), a hash-equi join back, and a
  * per-doc ordered fold. The ordered rebuild sorts only WITHIN one
  * document's segment list (collect_list + array_sort over ≤ len/8
  * entries), never across documents — no window, no skew beyond
  * document length, which the corpus schema already bounds.
  */
object LineDedup {

  private val SegWords = 8 // = LlmQueries6.SegWords: shared segmentation
  private val CommonDocThreshold = 5 // = LlmQueries6.CommonDocThreshold

  /** Strip result of any (doc_id, text) input — factored for specs. */
  def stripOf(input: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // bindOnce: per-segment slices would otherwise inline (and
      // re-evaluate) the normalize+split subtree — O(n²) per document.
      val segArr = graft.functions.MetadataFunctions.bindOnce(words(col("text"))) { ws =>
        transform(
          sequence(lit(0), ((size(ws) - 1) / SegWords).cast("int")),
          i => array_join(slice(ws, i * SegWords + 1, lit(SegWords)), " ")
        )
      }
      val base = input.select(col("doc_id"), segArr.as("segs"))
      val segs = base
        .select(col("doc_id"), posexplode(col("segs")).as(Seq("pos", "seg")))
        .withColumn("h", md5(col("seg")))
      val counts = segs.groupBy("h").agg(countDistinct(col("doc_id")).as("n_docs"))
      val kept = segs
        .join(counts, Seq("h"))
        .filter(col("n_docs") < CommonDocThreshold)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_kept"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("pos"), col("seg")))),
              t => t.getField("seg")
            ),
            " "
          ).as("txt")
        )
      base
        .select(col("doc_id"), size(col("segs")).cast("bigint").as("n_segments"))
        .join(kept, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          col("n_segments"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_segments") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          md5(coalesce(col("txt"), lit(""))).as("clean_md5"),
          length(coalesce(col("txt"), lit(""))).cast("bigint").as("clean_chars")
        )
  }

  private val stripQ = Q(
    "docs_line_dedup_strip",
    (s, d) => stripOf(Tables.documents(s, d)),
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH w AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |seg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(0, cast(floor((len(ws) - 1) / $SegWords) as int) + 1),
         |      i -> {'pos': i, 'seg': array_to_string(ws[i * $SegWords + 1 : i * $SegWords + $SegWords], ' ')})) AS s
         |  FROM w),
         |segf AS (SELECT doc_id, s.pos AS pos, s.seg AS seg, md5(s.seg) AS h FROM seg),
         |counts AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM segf GROUP BY h),
         |reb AS (
         |  SELECT doc_id, count(*) AS n_kept, string_agg(seg, ' ' ORDER BY pos) AS txt
         |  FROM segf JOIN counts USING (h)
         |  WHERE n_docs < $CommonDocThreshold
         |  GROUP BY doc_id),
         |ns AS (
         |  SELECT doc_id, cast(cast(floor((len(ws) - 1) / $SegWords) as int) + 1 AS bigint) AS n_segments
         |  FROM w)
         |SELECT ns.doc_id, n_segments,
         |  coalesce(n_kept, 0) AS n_kept,
         |  n_segments - coalesce(n_kept, 0) AS n_removed,
         |  md5(coalesce(txt, '')) AS clean_md5,
         |  cast(length(coalesce(txt, '')) AS bigint) AS clean_chars
         |FROM ns LEFT JOIN reb ON ns.doc_id = reb.doc_id""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(stripQ)
}
