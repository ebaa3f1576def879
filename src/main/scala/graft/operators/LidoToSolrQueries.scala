package graft.operators

import graft.{Q, Tables}
import graft.operators.MetadataQueries.{normIsbnSql, stripPunctSql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-gate certification for the [[LidoToSolr]] assembly: synthesized
  * LIDO records (title sets with preferred/alternate parts in two
  * languages, priority-mapped events with actors and materials, typed
  * subjects, repository work IDs, record-info IDs, related works) built
  * as nested literals from `part`, run through the REAL `solrColumns`
  * program, oracle replayed flat in DuckDB. Shapes mirror the
  * reference's own fixtures; general-shape parity is covered by
  * LidoFixtureSpec on lido1/lido2/lido3.
  */
object LidoToSolrQueries {

  val all: Seq[Q] = Seq(
    Q(
      "lido_tosolr_assembly",
      (s, d) => {
        val k = col("p_partkey")
        val e = lit("")

        def langParts(lang: String, parts: Column*) =
          struct(lit(lang).as("lang"), array(parts: _*).as("parts"))

        // One titleSet: preferred 'fi' part always; alternate 'fi' part on
        // odd keys (mergeTitleValues appends it to the preferred string).
        val tMain = concat(lit("Objekti "), (k % 100).cast("string"))
        val tAlt = concat(lit("Vaihtoehto "), (k % 40).cast("string"))
        val hasAlt = k % 2 === 1
        val set1 = struct(
          array(langParts("fi", tMain)).as("prefG"),
          when(hasAlt, array(langParts("fi", tAlt)))
            .otherwise(
              array().cast("array<struct<lang:string,parts:array<string>>>")
            )
            .as("altG")
        )

        def actor(n: Column) =
          struct(n.as("name"), lit("tekijä").as("role"))
        def event(typ: String, actorName: Column, date: Column, mat: Column) =
          struct(
            array(lit(typ)).as("types"),
            when(actorName =!= "", array(actor(actorName)))
              .otherwise(array().cast("array<struct<name:string,role:string>>"))
              .as("actors"),
            when(date =!= "", array(date)).otherwise(array().cast("array<string>")).as("displayDates"),
            array().cast("array<string>").as("displayPlaces"),
            when(mat =!= "", array(mat)).otherwise(array().cast("array<string>")).as("matTerms"),
            array().cast("array<string>").as("matDisplay")
          )
        // creation (priority 1) listed FIRST in document order, design
        // (priority 0) second — the priority sort must flip them.
        val creator = concat(lit("Tekijä, Test "), (k % 50).cast("string"))
        val designer =
          when(k % 3 === 0, concat(lit("Muotoilija "), (k % 30).cast("string"))).otherwise(e)
        val evDate = concat(lit("19"), lpad((k % 90).cast("string"), 2, "0"))
        val events0 = array(
          event("creation", creator, evDate, concat(lit("puu"), (k % 5).cast("string"))),
          event("design", designer, e, e),
          event("exhibition", lit("Ignored Actor"), lit("2001"), lit("ignoredmat"))
        )

        val subj = struct(
          lit("").as("typ"),
          array(concat(lit("aihe"), (k % 20).cast("string")), lit("muoto")).as("terms"),
          when(k % 4 === 0, array(lit("1800-luku.")))
            .otherwise(array().cast("array<string>"))
            .as("dispDates"),
          array().cast("array<string>").as("dispPlaces"),
          array().cast("array<string>").as("places")
        )
        val subjIcon = struct(
          lit("iconclass").as("typ"),
          array(lit("25F23")).as("terms"),
          array().cast("array<string>").as("dispDates"),
          array().cast("array<string>").as("dispPlaces"),
          array().cast("array<string>").as("places")
        )

        def ident(t: String, v: Column) = struct(lit(t).as("typ"), v.as("v"))
        val isbn10 = lit("951-0-18435-7") // normalizes to 9789510184356
        val workIds = when(
          k % 5 === 0,
          array(ident("numero", concat(lit("N"), k.cast("string"))), ident("isbn", isbn10))
        ).otherwise(array(ident("numero", concat(lit("N"), k.cast("string")))))

        val relWorks = when(
          k % 6 === 0,
          array(
            struct(
              lit("Collection").as("relType"),
              concat(lit("Kokoelma "), (k % 8).cast("string")).as("displayObject"),
              lit("").as("objId"),
              lit("").as("objType")
            )
          )
        ).otherwise(
          array().cast(
            "array<struct<relType:string,displayObject:string,objId:string,objType:string>>"
          )
        )

        val rec = struct(
          concat(lit("lido"), k.cast("string")).as("id"),
          array(set1).as("titleSets"),
          array().cast("array<struct<typ:string,values:array<string>>>").as("descriptions"),
          array(concat(lit("tyyppi"), (k % 7).cast("string"))).as("workTypes"),
          array(concat(lit("Museo "), (k % 9).cast("string"))).as("repoLegalNames"),
          array().cast("array<string>").as("sourceLegalNames"),
          array(ident("mus", concat(lit("M"), k.cast("string")))).as("recordInfoIds"),
          workIds.as("workIds"),
          array(subj, subjIcon).as("subjects"),
          events0.as("events"),
          relWorks.as("relWorks"),
          array().cast("array<string>").as("resourceLinks"),
          array(tMain, lit("vapaa teksti")).as("allText")
        )

        val records = Tables
          .part(s, d)
          .select(k.as("p_partkey"), rec.as("rec"))
        val solr =
          LidoToSolr.solrColumns(col("rec"), LidoToSolr.Params(defaultLanguage = "fi")).toMap
        records.select(
          col("p_partkey"),
          solr("title").as("title"),
          solr("title_sort").as("title_sort"),
          array_join(solr("title_alt"), "|").as("title_alt_csv"),
          solr("format").as("format"),
          solr("institution").as("institution"),
          array_join(solr("author"), "|").as("author_csv"),
          solr("author_sort").as("author_sort"),
          array_join(solr("topic"), "|").as("topic_csv"),
          array_join(solr("material_str_mv"), "|").as("material_csv"),
          array_join(solr("era"), "|").as("era_csv"),
          solr("collection").as("collection"),
          array_join(solr("ctrlnum"), "|").as("ctrlnum_csv"),
          array_join(solr("isbn"), "|").as("isbn_csv"),
          array_join(solr("allfields"), "|").as("allfields_csv")
        )
      },
      Some {
        val isbn13 = normIsbnSql("'9510184357'")
        s"""WITH base AS (
           |  SELECT p_partkey AS k,
           |    'Objekti ' || cast(p_partkey % 100 as varchar) AS tmain,
           |    'Vaihtoehto ' || cast(p_partkey % 40 as varchar) AS talt,
           |    'Tekijä, Test ' || cast(p_partkey % 50 as varchar) AS creator,
           |    'Muotoilija ' || cast(p_partkey % 30 as varchar) AS designer,
           |    '19' || lpad(cast(p_partkey % 90 as varchar), 2, '0') AS evdate,
           |    'aihe' || cast(p_partkey % 20 as varchar) AS topic1
           |  FROM part),
           |t AS (
           |  SELECT *,
           |    (CASE WHEN k % 2 = 1 THEN tmain || '; ' || talt ELSE tmain END) AS title
           |  FROM base)
           |SELECT k AS p_partkey,
           |  title,
           |  lower(${stripPunctSql("title")}) AS title_sort,
           |  '' AS title_alt_csv,
           |  'tyyppi' || cast(k % 7 as varchar) AS format,
           |  'Museo ' || cast(k % 9 as varchar) AS institution,
           |  (CASE WHEN k % 3 = 0 THEN designer || '|' || creator ELSE creator END) AS author_csv,
           |  (CASE WHEN k % 3 = 0 THEN designer ELSE creator END) AS author_sort,
           |  topic1 || '|muoto' AS topic_csv,
           |  'puu' || cast(k % 5 as varchar) AS material_csv,
           |  (CASE WHEN k % 4 = 0 THEN '1800-luku' ELSE evdate END) AS era_csv,
           |  (CASE WHEN k % 6 = 0 THEN 'Kokoelma ' || cast(k % 8 as varchar) ELSE '' END) AS collection,
           |  '(mus)M' || cast(k as varchar) AS ctrlnum_csv,
           |  (CASE WHEN k % 5 = 0 THEN $isbn13 ELSE '' END) AS isbn_csv,
           |  tmain || '|vapaa teksti' AS allfields_csv
           |FROM t ORDER BY p_partkey""".stripMargin
      }
    )
  )
}
