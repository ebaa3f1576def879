package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import MetadataQueries._

/** Dublin Core record extraction (reference: Record/Dc.php toSolrArray,
  * getTitle:243, getISBNs:270, getFormat:311, getPublicationYear:321).
  *
  * The record model is the generic flat-field form — one
  * array<struct<elem,val>> per record (a DC document is an unordered bag
  * of qualified elements) — and every getter is an array expression over
  * it: `filter` by element name + `transform` to values, all inside
  * whole-stage codegen. The oracle recomputes the expected outputs from
  * the scalar base columns through the same shared string-semantics SQL
  * templates (stripTrailingPunctuation chain, sort-title, ISBN
  * normalization), so the extraction logic — not just the plumbing — is
  * what the hash compare certifies.
  */
object DcQueries {

  /** Values of DC element `e`, in document order. */
  private def vals(fields: Column, e: String): Column =
    transform(
      filter(fields, f => f.getField("elem") === e),
      f => f.getField("val")
    )

  /** First value of element `e`, "" when absent ([[get]] is out-of-bounds
    * null where ANSI element_at throws).
    */
  private def first(fields: Column, e: String): Column =
    coalesce(get(vals(fields, e), lit(0)), lit(""))

  /** Last value matching `^https?` in `arr`, null when none — the
    * reference's loop-and-overwrite URL selection.
    */
  private def lastHttp(arr: Column): Column =
    get(reverse(filter(arr, v => v.rlike("^https?"))), lit(0))

  /** 3-char chunks of one language word (PHP str_split(w, 3) incl. short
    * tail), lowercased — Dc.php's language handling.
    */
  private def langChunks(w: Column): Column =
    transform(
      sequence(lit(0), floor((length(w) - 1) / 3).cast("int")),
      i => lower(w.substr(i * 3 + 1, lit(3)))
    )

  val all: Seq[Q] = Seq(
    Q(
      "dc_extract",
      (s, d) => {
        val k = col("p_partkey")
        val w = split(col("p_name"), " ")
        val isbnBase = lpad((k * 7919 % 1000000000).cast("string"), 9, "0")
        val isbn10 = concat(isbnBase, graft.functions.MetadataFunctions.isbn10CheckChar(isbnBase))
        val fields = array(
          struct(lit("title").as("elem"),
            when(k % 3 === 0, concat(col("p_name"), lit(" : a study")))
              .otherwise(concat(col("p_name"), lit(" /"))).as("val")),
          struct(lit("creator").as("elem"),
            concat(element_at(w, 2), lit(", "), element_at(w, 1), lit(",")).as("val")),
          struct(lit("contributor").as("elem"),
            concat(element_at(w, 1), lit(" assoc")).as("val")),
          struct(lit("contributor").as("elem"),
            concat(element_at(w, 2), lit(" jr")).as("val")),
          struct(lit("date").as("elem"),
            when(k % 4 === 0, lit("circa 1990"))
              .otherwise((lit(1900) + k % 100).cast("string")).as("val")),
          struct(lit("date").as("elem"), (lit(1900) + k % 100).cast("string").as("val")),
          struct(lit("identifier").as("elem"),
            concat(lit("https://ex.org/"), k.cast("string")).as("val")),
          struct(lit("identifier").as("elem"),
            when(k % 5 === 0, isbn10)
              .otherwise(concat(lit("oai:ex:"), k.cast("string"))).as("val")),
          struct(lit("language").as("elem"),
            when(k % 2 === 0, lit("ENG fin")).otherwise(lit("engfinswe")).as("val")),
          struct(lit("type").as("elem"),
            when(k % 6 === 0, lit("")).otherwise(lit("Book")).as("val")),
          struct(lit("publisher").as("elem"),
            concat(lit("House of "), element_at(w, 2), lit(" Ltd.")).as("val")),
          struct(lit("description").as("elem"),
            when(k % 2 === 0, concat(lit("https://desc.ex/"), k.cast("string")))
              .otherwise(lit("table of contents here")).as("val")),
          struct(lit("description").as("elem"), lit("further notes text").as("val"))
        )
        val doc = Tables
          .part(s, d)
          .select(concat(lit("dc"), k.cast("string")).as("record_id"), fields.as("fields"))
        val f = col("fields")
        // Staged selects: stripTrailingPunctuation mentions its input
        // ~300×, so stripping a first(fields,...) tree directly inlines it
        // multiplicatively (a ~4.6 MiB task binary). Stage the raw element
        // lookups first; the strips then duplicate only cheap attributes.
        val l1 = doc.select(
          col("record_id"),
          trim(first(f, "title")).as("title_raw"),
          trim(first(f, "creator")).as("creator_raw"),
          trim(first(f, "type")).as("type_raw"),
          trim(first(f, "publisher")).as("publisher_raw"),
          vals(f, "description").as("descs"),
          vals(f, "identifier").as("identifiers"),
          vals(f, "date").as("dates"),
          vals(f, "contributor").as("contributors"),
          split(trim(first(f, "language")), " ").as("lang_words")
        )
        val l2 = l1.select(
          col("record_id"),
          stripTrailingPunctuation(col("title_raw")).as("title"),
          createSortTitle(col("title_raw")).as("title_sort"),
          stripTrailingPunctuation(col("creator_raw")).as("author"),
          col("type_raw"),
          col("publisher_raw"),
          col("descs"),
          col("identifiers"),
          col("dates"),
          col("contributors"),
          col("lang_words")
        )
        val titleParts = split(col("title"), " : ", 2)
        val descs = col("descs")
        l2.select(
          col("record_id"),
          col("title"),
          element_at(titleParts, 1).as("title_short"),
          coalesce(get(titleParts, lit(1)), lit("")).as("title_sub"),
          col("title_sort"),
          col("author"),
          array_join(col("contributors"), "|").as("author2"),
          when(col("type_raw") === "", lit("Other"))
            .otherwise(col("type_raw")).as("format"),
          coalesce(
            get(filter(col("dates"), dte => trim(dte).rlike("^\\d{4}$")), lit(0)),
            lit("")
          ).as("publish_year"),
          array_join(
            array_distinct(
              filter(
                transform(
                  col("identifiers"),
                  id =>
                    normalizeIsbn(
                      regexp_extract(
                        regexp_replace(trim(id), "-", ""),
                        "([0-9]{9,12}[0-9xX])",
                        1
                      )
                    )
                ),
                x => x =!= ""
              )
            ),
            "|"
          ).as("isbns"),
          array_join(flatten(transform(col("lang_words"), langChunks(_))), "|").as("langs"),
          stripTrailingPunctuation(col("publisher_raw")).as("publisher"),
          coalesce(lastHttp(descs), lastHttp(col("identifiers")), lit(""))
            .as("url"),
          array_join(
            filter(descs, dsc => !dsc.rlike("^https?") && !dsc.rlike("^\\d+\\.\\d+$")),
            "|"
          ).as("contents")
        )
      },
      Some {
        val isbnB = "lpad(cast(p_partkey*7919 % 1000000000 as varchar), 9, '0')"
        s"""WITH base0 AS (
           |  SELECT p_partkey AS k, p_name AS name,
           |    string_split(p_name, ' ') AS w, $isbnB AS ib
           |  FROM part),
           |base AS (
           |  SELECT k, name, w, 'dc' || cast(k as varchar) AS record_id,
           |    (CASE WHEN k % 3 = 0 THEN name || ' : a study' ELSE name || ' /' END) AS rawtitle,
           |    w[2] || ', ' || w[1] || ',' AS rawcreator,
           |    'House of ' || w[2] || ' Ltd.' AS rawpub,
           |    (CASE WHEN k % 5 = 0 THEN ib || ${isbn10CheckCharSql("ib")} ELSE 'oai:ex:' || cast(k as varchar) END) AS ident2,
           |    (CASE WHEN k % 2 = 0 THEN 'ENG fin' ELSE 'engfinswe' END) AS lang,
           |    (CASE WHEN k % 2 = 0 THEN 'https://desc.ex/' || cast(k as varchar) ELSE 'table of contents here' END) AS desc1
           |  FROM base0),
           |${stripTrailStagesSql("base", "rawtitle", "title_s", "dt")},
           |${stripTrailStagesSql("dt4", "rawcreator", "author_s", "da")},
           |${stripTrailStagesSql("da4", "rawpub", "pub_s", "dp")},
           |srt_a AS (SELECT *, ${stripArticleSql("rawtitle")} AS st1 FROM dp4),
           |srt_b AS (SELECT *, ${stripPunctSql("st1")} AS st2 FROM srt_a),
           |srt AS (SELECT *,
           |  lower(CASE WHEN substr(st2,1,1) != substr(st1,1,1) THEN ${stripArticleSql("st2")} ELSE st2 END) AS title_sort_s
           |  FROM srt_b),
           |isb0 AS (SELECT *, regexp_extract(replace(ident2, '-', ''), '([0-9]{9,12}[0-9xX])', 1) AS im FROM srt),
           |isb AS (SELECT *, ${normIsbnSql("im")} AS isbn13 FROM isb0)
           |SELECT record_id,
           |  title_s AS title,
           |  (CASE WHEN strpos(title_s, ' : ') > 0 THEN substr(title_s, 1, strpos(title_s, ' : ') - 1) ELSE title_s END) AS title_short,
           |  (CASE WHEN strpos(title_s, ' : ') > 0 THEN substr(title_s, strpos(title_s, ' : ') + 3) ELSE '' END) AS title_sub,
           |  title_sort_s AS title_sort,
           |  author_s AS author,
           |  w[1] || ' assoc|' || w[2] || ' jr' AS author2,
           |  (CASE WHEN k % 6 = 0 THEN 'Other' ELSE 'Book' END) AS format,
           |  cast(1900 + k % 100 as varchar) AS publish_year,
           |  (CASE WHEN isbn13 != '' THEN isbn13 ELSE '' END) AS isbns,
           |  array_to_string(
           |    flatten(list_transform(string_split(lang, ' '),
           |      wrd -> list_transform(range(1, cast(ceil(length(wrd) / 3.0) as int) + 1),
           |               i -> lower(substr(wrd, (i-1)*3 + 1, 3))))),
           |    '|') AS langs,
           |  pub_s AS publisher,
           |  (CASE WHEN k % 2 = 0 THEN desc1 ELSE 'https://ex.org/' || cast(k as varchar) END) AS url,
           |  (CASE WHEN k % 2 = 0 THEN 'further notes text'
           |        ELSE desc1 || '|further notes text' END) AS contents
           |FROM isb""".stripMargin
      }
    )
  )
}
