package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-gate certification for the [[ForwardToSolr]] assembly (the
  * `marc_tosolr_assembly` pattern applied to Forward.php:157):
  * synthesized EN 15907 film records are built as nested literals from
  * `part`, run through the REAL `ForwardToSolr.solrColumns` projection,
  * and the DuckDB oracle replays the arithmetic over the same flat
  * synthesis. The shapes exercise every wiring decision — IDTypeName
  * prefixing, identifying-title exclusion from title_alt,
  * primary-language Synopsis/Content selection with unfiltered
  * fallback, directors-first primary ordering, the empty-relator-list
  * = every-agent corporate quirk, and the trailing-punctuation strip
  * on allfields — while general-shape parity on the reference's own
  * forward1.xml fixture is covered by ForwardFixtureSpec.
  */
object ForwardToSolrQueries {

  private def agent(name: Column, activity: Column) =
    struct(name.as("name"), activity.as("activity"))
  private def desc(typ: String, lang: String, text: Column) =
    struct(lit(typ).as("typ"), lit(lang).as("lang"), text.as("text"))

  val all: Seq[Q] = Seq(
    Q(
      "forward_tosolr_assembly",
      (s, d) => {
        val k = col("p_partkey")
        def str(prefix: String, m: Int): Column =
          concat(lit(prefix), (k % m).cast("string"))

        val title = str("Film ", 100)
        val year = (lit(1950) + (k % 70)).cast("string")
        val synTxt = (k % 9).cast("string")

        val rec = struct(
          concat(lit("f"), k.cast("string")).as("idValue"),
          when(k % 3 === 0, lit("")).otherwise(lit("elonet_elokuva")).as("idTypeName"),
          title.as("identifyingTitle"),
          year.as("year"),
          // Second title equals the identifying title every 5th record —
          // the title_alt exclusion edge.
          array(title, when(k % 5 === 0, title).otherwise(str("Alt ", 7)))
            .as("titleTexts"),
          // Array shape varies by k: the en Synopsis drops out on odd
          // records (forcing the unfiltered-language fallback) and the
          // Content description appears every 4th.
          filter(
            array(
              when(k % 2 === 0, desc("Synopsis", "en", concat(lit("Syn en "), synTxt)))
                .otherwise(desc("Synopsis", "en", lit(""))),
              desc("Synopsis", "fi", concat(lit("Syn fi "), synTxt)),
              when(k % 4 === 0, desc("Content description", "fi", concat(lit("Con fi "), synTxt)))
                .otherwise(desc("Content description", "fi", lit("")))
            ),
            x => x("text") =!= ""
          ).as("descs"),
          // Writer listed BEFORE the director: primSorted must reorder
          // d02 first. The company agent (every 6th) matches neither
          // relator set and only surfaces through the empty-corporate
          // all-agents quirk.
          filter(
            array(
              agent(str("Writer W", 8), lit("A00")),
              agent(str("Director D", 10), lit("D02")),
              agent(str("Actor A", 12), lit("E01")),
              when(k % 6 === 0, agent(str("Company P", 5), lit("E10")))
                .otherwise(agent(lit(""), lit("E10")))
            ),
            a => a("name") =!= ""
          ).as("agents"),
          array(str("s", 20), str("t", 6)).as("subjects"),
          filter(array(when(k % 2 === 1, lit("Finland")).otherwise(lit(""))), x => x =!= "")
            .as("regions"),
          array(title, lit("Raw text."), year).as("allTextRaw")
        )

        val records = Tables.part(s, d).select(k.as("p_partkey"), rec.as("rec"))
        val solr = ForwardToSolr.solrColumns(col("rec")).toMap

        records.select(
          col("p_partkey"),
          solr("ctrlnum").as("ctrlnum"),
          solr("title").as("title"),
          array_join(solr("title_alt"), "|").as("title_alt_csv"),
          solr("title_sort").as("title_sort"),
          solr("description").as("description"),
          solr("publishDate").as("publish_date"),
          array_join(solr("author"), "|").as("author_csv"),
          array_join(solr("author_role"), "|").as("author_role_csv"),
          solr("author_sort").as("author_sort"),
          array_join(solr("author2"), "|").as("author2_csv"),
          array_join(solr("author2_role"), "|").as("author2_role_csv"),
          array_join(solr("author_corporate"), "|").as("corp_csv"),
          array_join(solr("author_corporate_role"), "|").as("corp_role_csv"),
          array_join(solr("topic"), "|").as("topic_csv"),
          array_join(solr("geographic"), "|").as("geographic_csv"),
          solr("format").as("format"),
          array_join(solr("allfields"), "|").as("allfields_csv")
        )
      },
      Some {
        s"""WITH base AS (
           |  SELECT p_partkey AS k,
           |    'Film ' || cast(p_partkey % 100 as varchar) AS title,
           |    cast(1950 + p_partkey % 70 as varchar) AS yr,
           |    cast(p_partkey % 9 as varchar) AS sx,
           |    'Director D' || cast(p_partkey % 10 as varchar) AS dname,
           |    'Writer W' || cast(p_partkey % 8 as varchar) AS wname,
           |    'Actor A' || cast(p_partkey % 12 as varchar) AS aname,
           |    'Company P' || cast(p_partkey % 5 as varchar) AS cname
           |  FROM part)
           |SELECT k AS p_partkey,
           |  (CASE WHEN k % 3 = 0 THEN 'f' || cast(k as varchar)
           |        ELSE 'elonet_elokuva_f' || cast(k as varchar) END) AS ctrlnum,
           |  title,
           |  (CASE WHEN k % 5 = 0 THEN ''
           |        ELSE 'Alt ' || cast(k % 7 as varchar) END) AS title_alt_csv,
           |  lower(title) AS title_sort,
           |  (CASE WHEN k % 2 = 0 THEN 'Syn en ' || sx ELSE 'Syn fi ' || sx END)
           |    || (CASE WHEN k % 4 = 0 THEN ' Con fi ' || sx ELSE '' END) AS description,
           |  yr AS publish_date,
           |  dname || '|' || wname AS author_csv,
           |  'd02|a00' AS author_role_csv,
           |  dname AS author_sort,
           |  aname AS author2_csv,
           |  'e01' AS author2_role_csv,
           |  wname || '|' || dname || '|' || aname
           |    || (CASE WHEN k % 6 = 0 THEN '|' || cname ELSE '' END) AS corp_csv,
           |  'a00|d02|e01' || (CASE WHEN k % 6 = 0 THEN '|e10' ELSE '' END) AS corp_role_csv,
           |  's' || cast(k % 20 as varchar) || '|t' || cast(k % 6 as varchar) AS topic_csv,
           |  (CASE WHEN k % 2 = 1 THEN 'Finland' ELSE '' END) AS geographic_csv,
           |  'MotionPicture' AS format,
           |  title || '|Raw text|' || yr AS allfields_csv
           |FROM base ORDER BY k""".stripMargin
      }
    )
  )
}
