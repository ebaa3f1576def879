package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** RDF linked-data import + corpus mixture statistics.
  *
  *  - `Command/Util/ImportRdf.php`: stream N-Triples, group consecutive
  *    triples by subject into one linked-data document per subject. The
  *    Spark shape drops the "consecutive" constraint for a full
  *    hash-group by subject (same result for well-formed dumps, and
  *    order-independent — the property a distributed reader needs).
  *    Parsing is regexp extraction per line: subject/predicate IRIs in
  *    angle brackets, object either an IRI or a quoted literal.
  *  - Per-source mixture statistics: the summary table a training-data
  *    pipeline feeds into mixture weighting (docs, token mass, mean
  *    quality proxy per source) — one map-side-combinable groupBy.
  */
object RdfQueries {

  val all: Seq[Q] = Seq(
    Q(
      "rdf_import",
      (s, d) => {
        val id = col("doc_id").cast("string")
        // Each line is serialized INDEPENDENTLY (a null lang/source nulls
        // only its own line, not the whole document — concat is
        // null-propagating) and literal content strips quote, backslash
        // AND line-break characters so no value can split a line.
        val titleLine = concat(
          lit("<urn:doc:"), id, lit("> <http://purl.org/dc/terms/title> \""),
          regexp_replace(substring(col("text"), 1, 20), "[\"\\\\\n\r]", ""), lit("\" .")
        )
        val langLine = concat(
          lit("<urn:doc:"), id, lit("> <http://purl.org/dc/terms/language> \""),
          regexp_replace(col("lang"), "[\"\\\\\n\r]", ""), lit("\" .")
        )
        val sourceLine = concat(
          lit("<urn:doc:"), id, lit("> <http://purl.org/dc/terms/source> <urn:src:"),
          col("source"), lit("> .")
        )
        val lines = Tables
          .documents(s, d)
          .select(explode(array(titleLine, langLine, sourceLine)).as("line"))
          .filter(col("line").isNotNull)
        val subject = regexp_extract(col("line"), "^<([^>]*)>", 1)
        val predicate = regexp_extract(col("line"), "^<[^>]*>\\s+<([^>]*)>", 1)
        val literal = regexp_extract(col("line"), "\"([^\"]*)\"", 1)
        val iriObj = regexp_extract(col("line"), "^<[^>]*>\\s+<[^>]*>\\s+<([^>]*)>", 1)
        lines
          .select(
            subject.as("subject"),
            predicate.as("predicate"),
            when(literal =!= "", literal).otherwise(iriObj).as("object")
          )
          .groupBy("subject")
          .agg(
            count(lit(1)).as("n_triples"),
            array_join(array_sort(collect_list(col("predicate"))), "|").as("predicates"),
            max(when(col("predicate") === "http://purl.org/dc/terms/language", col("object")))
              .as("language")
          )
      },
      Some(
        """WITH t AS (SELECT cast(doc_id as varchar) AS id,
          |  regexp_replace(substr(text, 1, 20), '["\\\n\r]', '', 'g') AS title20,
          |  regexp_replace(lang, '["\\\n\r]', '', 'g') AS lang, source
          |  FROM documents),
          |lines0 AS (
          |  SELECT unnest([
          |    '<urn:doc:' || id || '> <http://purl.org/dc/terms/title> "' || title20 || '" .',
          |    '<urn:doc:' || id || '> <http://purl.org/dc/terms/language> "' || lang || '" .',
          |    '<urn:doc:' || id || '> <http://purl.org/dc/terms/source> <urn:src:' || source || '> .'
          |  ]) AS line FROM t),
          |lines AS (SELECT line FROM lines0 WHERE line IS NOT NULL),
          |p AS (SELECT
          |    regexp_extract(line, '^<([^>]*)>', 1) AS subject,
          |    regexp_extract(line, '^<[^>]*>\s+<([^>]*)>', 1) AS predicate,
          |    CASE WHEN regexp_extract(line, '"([^"]*)"', 1) != ''
          |         THEN regexp_extract(line, '"([^"]*)"', 1)
          |         ELSE regexp_extract(line, '^<[^>]*>\s+<[^>]*>\s+<([^>]*)>', 1) END AS object
          |  FROM lines)
          |SELECT subject, count(*) AS n_triples,
          |  array_to_string(list_sort(list(predicate)), '|') AS predicates,
          |  max(CASE WHEN predicate = 'http://purl.org/dc/terms/language' THEN object END) AS language
          |FROM p GROUP BY subject""".stripMargin
      )
    ),
    Q(
      "docs_source_mix",
      (s, d) => {
        val nTokens = size(split(trim(col("text")), "\\s+"))
        Tables
          .documents(s, d)
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(nTokens.cast("long")).as("total_tokens"),
            round(avg(length(col("text"))), 4).as("mean_chars"),
            countDistinct(col("lang")).as("n_langs")
          )
      },
      Some(
        """SELECT source, count(*) AS n_docs,
          |  cast(sum(len(regexp_split_to_array(trim(text), '\s+'))) as bigint) AS total_tokens,
          |  round(avg(length(text)), 4) AS mean_chars,
          |  count(DISTINCT lang) AS n_langs
          |FROM documents GROUP BY source""".stripMargin
      )
    )
  )
}
