package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import MetadataQueries._

/** XML metadata-profile extraction: Qualified Dublin Core, LRMI and ESE.
  *
  * Reference semantics (re-expressed, not ported):
  *   - `Record/Qdc.php` — attribute-aware QDC extraction: first
  *     non-alternative title vs title_alt:175, per-type-attribute format
  *     buckets with preferred/excluded types (getFormat:338), urn unique
  *     ids:256, start-anchored ISBN candidates:276, typed ISSNs:300, DOI
  *     URL unwrapping:528, language-tagged description precedence:415 and
  *     lexvo language URIs:552.
  *   - `Record/Lrmi.php` — person/organization author structures:141-190,
  *     about/thing topic model:191 with https→http id normalization,
  *     material/inLanguage languages:251, constant format:100.
  *   - `Record/Ese.php` — rawer semantics than QDC on purpose: unanchored
  *     ISBN candidates:163, strict `^\d{4}$` years only:214, unchunked
  *     language words:85, loop-overwrite URL (last match wins):107.
  *
  * Each record model is an `array<struct<...>>` column synthesized
  * deterministically from the testdata tables; every getter is a
  * filter/transform/aggregate expression over it (whole-stage codegen, no
  * UDFs). The DuckDB oracle recomputes the expected output from the same
  * base columns through the shared SQL templates, so the extraction
  * semantics — not just plumbing — is what the hash compare certifies.
  */
object ProfileQueries {

  private def ofElem(f: Column, e: String): Column =
    filter(f, x => x.getField("elem") === e)

  private def vls(f: Column, e: String): Column =
    transform(ofElem(f, e), _.getField("val"))

  /** 3-char chunks of one language word (PHP str_split(w, 3) incl. short
    * tail), lowercased.
    */
  private def langChunks(w: Column): Column =
    transform(
      sequence(lit(0), floor((length(w) - 1) / 3).cast("int")),
      i => lower(w.substr(i * 3 + 1, lit(3)))
    )

  /** QDC field entry: element name + type/lang attributes + value. */
  private def fld(elem: String, typ: Column, lang: Column, value: Column): Column =
    struct(lit(elem).as("elem"), typ.as("typ"), lang.as("lang"), value.as("val"))

  private val qdc = Q(
    "qdc_extract",
    (s, d) => {
      val k = col("p_partkey")
      val name = col("p_name")
      val w = split(name, " ")
      val isbnBase = lpad((k * 7919 % 1000000000).cast("string"), 9, "0")
      val isbn10 = concat(isbnBase, isbn10CheckChar(isbnBase))
      val dashedIsbn =
        concat(substring(isbn10, 1, 3), lit("-"), substring(isbn10, 4, 7))
      val e = lit("")
      val fields = array(
        // Titles: the first non-alternative one is the main title, every
        // other (earlier alternatives included) lands in title_alt.
        fld("title", when(k % 4 === 0, lit("alternative")).otherwise(e), e,
          when(k % 4 === 0, concat(lit("Alt "), name))
            .otherwise(concat(name, lit(" : a study /")))),
        fld("title", when(k % 4 === 0, e).otherwise(lit("alternative")), e,
          when(k % 4 === 0, concat(name, lit(".")))
            .otherwise(concat(lit("Alt "), name))),
        fld("creator", e, e,
          concat(element_at(w, 2), lit(", "), element_at(w, 1), lit(","))),
        fld("creator", e, e, concat(lit("Company of "), element_at(w, 2))),
        fld("contributor", e, e, concat(element_at(w, 1), lit(" ed."))),
        fld("identifier", e, e, concat(lit("URN:NBN:fi-"), k.cast("string"))),
        fld("identifier", e, e,
          when(k % 5 === 0, dashedIsbn)
            .otherwise(concat(lit("oai:ex:"), k.cast("string")))),
        fld("identifier", e, e, concat(lit("https://ex.org/"), k.cast("string"))),
        fld("identifier", lit("doi"), e,
          when(k % 3 === 0,
            concat(lit("https://doi.org/10.123/x"), k.cast("string"), lit("?utm=1")))
            .otherwise(concat(lit("ex-doi-"), k.cast("string")))),
        fld("identifier", lit("issn"), e,
          concat(lit("2345-"), lpad((k * 7 % 10000).cast("string"), 4, "0"))),
        fld("isFormatOf", e, e,
          when(k % 10 === 0, dashedIsbn).otherwise(concat(lit("of-"), k.cast("string")))),
        fld("relation", lit("issn"), e,
          concat(lit("1234-"), lpad((k % 10000).cast("string"), 4, "0"))),
        fld("date", e, e,
          when(k % 7 === 0, lit("n.d."))
            .when(k % 4 === 0, lit("circa 1990"))
            .otherwise((lit(1900) + k % 100).cast("string"))),
        fld("date", e, e,
          when(k % 7 === 0, lit("unknown"))
            .when(k % 4 === 0, concat((lit(1900) + k % 100).cast("string"), lit("/97")))
            .otherwise(lit("junk"))),
        fld("issued", e, e, (lit(1800) + k % 100).cast("string")),
        fld("type", lit("administrative"), e, lit("AdminRec")),
        fld("type", e, e, when(k % 11 === 0, e).otherwise(lit("Text"))),
        fld("type", lit("media"), e, when(k % 3 === 0, lit("Video")).otherwise(e)),
        fld("description", e, lit("sv"), concat(lit("Svensk text "), k.cast("string"))),
        fld("description", e, lit("en"),
          when(k % 2 === 0, concat(lit("English text "), k.cast("string")))
            .otherwise(concat(lit("https://desc.ex/"), k.cast("string")))),
        fld("description", e, e, when(k % 5 === 0, lit("9.99")).otherwise(lit("plain note"))),
        fld("language", e, e,
          when(k % 3 === 0, lit("http://lexvo.org/id/iso639-3/fin swe"))
            .otherwise(lit("ENG swe"))),
        fld("publisher", e, e, concat(lit("House of "), element_at(w, 2), lit(" Ltd.")))
      )
      val doc = Tables
        .part(s, d)
        .select(concat(lit("qdc"), k.cast("string")).as("record_id"), fields.as("fields"))
      qdcSolrFrame(doc)
    },
    qdcOracle
  )

  /** The QDC toSolrArray derivation over any `(record_id, fields:
    * array<struct<elem,typ,lang,val>>)` frame — shared between the
    * registered query (synthesized field model) and ReferenceParitySpec,
    * which feeds it the reference's own qdc1.xml fixture and compares
    * against QdcTest.php's expected values. Format semantics follow
    * `Qdc.php` getFormat:338 exactly: empty type attribute ≙ the
    * `no_type` bucket, buckets collect first-wins, preferred types in
    * order, else the first collected bucket, else Unknown.
    */
  def qdcSolrFrame(
      doc: org.apache.spark.sql.DataFrame,
      preferredFormatTypes: Seq[String] = Seq("media"),
      excludedFormatTypes: Seq[String] = Seq("administrative")
  ): org.apache.spark.sql.DataFrame = {
      val f = col("fields")

      val titles = ofElem(f, "title")
      // 1-based index of the first non-alternative title (0 when none).
      val mainPos = array_position(
        transform(titles, t => t.getField("typ") =!= "alternative"),
        true
      )
      val mainTitle = trim(element_at(titles, mainPos.cast("int")).getField("val"))
      val titleAlt = transform(
        filter(titles, (t, i) => (i + 1) =!= mainPos),
        t => trim(t.getField("val"))
      )

      val creators = transform(vls(f, "creator"), stripTrailingPunctuation(_))

      // Format: drop excluded/empty types, bucket first-wins per type
      // attribute ('' → no_type), preferred buckets first, else the first
      // collected bucket, else Unknown.
      def typAttr(t: Column): Column = {
        val tt = trim(t.getField("typ"))
        when(tt === "", "no_type").otherwise(tt)
      }
      val types = filter(
        ofElem(f, "type"),
        t => trim(t.getField("val")) =!= "" &&
          !typAttr(t).isin(excludedFormatTypes.map(lit(_)): _*)
      )
      val preferredHit = preferredFormatTypes
        .map(p => trim(get(filter(types, t => typAttr(t) === p), lit(0)).getField("val")))
        .foldLeft(lit(null).cast("string"))(coalesce(_, _))
      val format =
        coalesce(preferredHit, trim(get(types, lit(0)).getField("val")), lit("Unknown"))

      def yearOf(arr: Column): Column = get(
        filter(
          transform(arr, dt => {
            val t0 = trim(dt)
            when(t0.rlike("^\\d{4}$"), t0)
              .otherwise(regexp_extract(t0, "^(\\d{4})(-|/)", 1))
          }),
          y => y =!= ""
        ),
        lit(0)
      )
      val publishYear = coalesce(yearOf(vls(f, "date")), yearOf(vls(f, "issued")), lit(""))

      val ids = vls(f, "identifier")
      val uniqueIds = array_distinct(
        transform(
          filter(ids, i => lower(trim(i)).startsWith("urn:")),
          i => concat(lit("(urn)"), normalizeKey(lower(trim(i))))
        )
      )
      val isbns = array_distinct(
        filter(
          transform(
            concat(ids, vls(f, "isFormatOf")),
            i =>
              normalizeIsbn(
                regexp_extract(regexp_replace(trim(i), "-", ""), "^([0-9]{9,12}[0-9xX])", 1)
              )
          ),
          x => x =!= ""
        )
      )
      def typedVals(elem: String, typ: String): Column =
        transform(
          filter(ofElem(f, elem), x => x.getField("typ") === typ),
          x => trim(x.getField("val"))
        )
      val issns = concat(typedVals("relation", "issn"), typedVals("identifier", "issn"))
      val dois = transform(
        typedVals("identifier", "doi"),
        i => {
          val m = regexp_extract(i, "(urn:doi:|https?://doi.org/|https?://dx.doi.org/)([^?#]+)", 2)
          when(m =!= "", m).otherwise(i)
        }
      )

      val langWords = split(trim(get(vls(f, "language"), lit(0))), " ")
      val langs = filter(
        flatten(
          transform(
            langWords,
            wd => langChunks(regexp_replace(wd, "^http://lexvo\\.org/id/iso639-./(.*)", "$1"))
          )
        ),
        x => x =!= ""
      )

      val descs = filter(
        ofElem(f, "description"),
        dsc => !trim(dsc.getField("val")).rlike("(^https?)|(^\\d+\\.\\d+$)")
      )
      val primaryDesc = coalesce(
        trim(get(filter(descs, dsc => dsc.getField("lang") === "en"), lit(0)).getField("val")),
        get(descs, lit(0)).getField("val"),
        lit("")
      )
      val urls = concat(
        filter(transform(ids, trim(_)), i => i.rlike("^https?")),
        filter(vls(f, "description"), dsc => trim(dsc).rlike("^https?"))
      )

      // Staged selects: createSortTitle mentions its input ~3000× (two
      // stripLeadingArticle passes of ~31 mentions over a 3-mention
      // stripPunctuation), so feeding it the mainTitle tree directly
      // inlines multiplicatively (~4.6 MiB task binary). Stage the
      // f-dependent trees once; derived columns then reference cheap
      // attributes.
      val l1 = doc.select(
        col("record_id"),
        mainTitle.as("main_title"),
        array_join(titleAlt, "|").as("title_alt"),
        creators.as("creators"),
        array_join(transform(vls(f, "contributor"), stripTrailingPunctuation(_)), "|")
          .as("author2"),
        format.as("format"),
        publishYear.as("publish_year"),
        array_join(uniqueIds, "|").as("unique_ids"),
        array_join(isbns, "|").as("isbns"),
        array_join(issns, "|").as("issns"),
        array_join(dois, "|").as("dois"),
        array_join(langs, "|").as("langs"),
        primaryDesc.as("description"),
        array_join(transform(descs, _.getField("val")), "|").as("contents"),
        array_join(urls, "|").as("urls"),
        trim(get(vls(f, "publisher"), lit(0))).as("publisher")
      )
      val mt = col("main_title")
      val titleParts2 = split(mt, " : ")
      l1.select(
        col("record_id"),
        mt.as("title"),
        element_at(titleParts2, 1).as("title_short"),
        coalesce(get(titleParts2, lit(1)), lit("")).as("title_sub"),
        col("title_alt"),
        createSortTitle(mt).as("title_sort"),
        array_join(col("creators"), "|").as("author"),
        coalesce(get(col("creators"), lit(0)), lit("")).as("author_sort"),
        col("author2"),
        col("format"),
        col("publish_year"),
        col("unique_ids"),
        col("isbns"),
        col("issns"),
        col("dois"),
        col("langs"),
        col("description"),
        col("contents"),
        col("urls"),
        col("publisher")
      )
  }

  private def qdcOracle: Option[String] = Some {
      val isbnB = "lpad(cast(p_partkey*7919 % 1000000000 as varchar), 9, '0')"
      s"""WITH base0 AS (
         |  SELECT p_partkey AS k, p_name AS name,
         |    string_split(p_name, ' ') AS w, $isbnB AS ib
         |  FROM part),
         |base AS (
         |  SELECT k, name, w, 'qdc' || cast(k as varchar) AS record_id,
         |    ib || ${isbn10CheckCharSql("ib")} AS isbn10,
         |    (CASE WHEN k % 4 = 0 THEN name || '.' ELSE name || ' : a study /' END) AS rawtitle,
         |    w[2] || ', ' || w[1] || ',' AS rawc1,
         |    'Company of ' || w[2] AS rawc2,
         |    w[1] || ' ed.' AS rawc3
         |  FROM base0),
         |${stripTrailStagesSql("base", "rawc1", "c1_s", "sa")},
         |${stripTrailStagesSql("sa4", "rawc2", "c2_s", "sb")},
         |${stripTrailStagesSql("sb4", "rawc3", "c3_s", "sc")},
         |${sortTitleStagesSql("sc4", "rawtitle", "title_sort_s", "st")}
         |SELECT record_id,
         |  rawtitle AS title,
         |  (CASE WHEN strpos(rawtitle, ' : ') > 0 THEN substr(rawtitle, 1, strpos(rawtitle, ' : ') - 1) ELSE rawtitle END) AS title_short,
         |  (CASE WHEN strpos(rawtitle, ' : ') > 0 THEN 'a study /' ELSE '' END) AS title_sub,
         |  'Alt ' || name AS title_alt,
         |  title_sort_s AS title_sort,
         |  c1_s || '|' || c2_s AS author,
         |  c1_s AS author_sort,
         |  c3_s AS author2,
         |  (CASE WHEN k % 3 = 0 THEN 'Video' WHEN k % 11 = 0 THEN 'Unknown' ELSE 'Text' END) AS format,
         |  (CASE WHEN k % 7 = 0 THEN cast(1800 + k % 100 as varchar) ELSE cast(1900 + k % 100 as varchar) END) AS publish_year,
         |  '(urn)' || ${nkSql("'urn:nbn:fi-' || cast(k as varchar)")} AS unique_ids,
         |  (CASE WHEN k % 5 = 0 OR k % 10 = 0 THEN ${isbn10to13Sql("isbn10")} ELSE '' END) AS isbns,
         |  '1234-' || lpad(cast(k % 10000 as varchar), 4, '0') || '|2345-' || lpad(cast(k*7 % 10000 as varchar), 4, '0') AS issns,
         |  (CASE WHEN k % 3 = 0 THEN '10.123/x' || cast(k as varchar) ELSE 'ex-doi-' || cast(k as varchar) END) AS dois,
         |  (CASE WHEN k % 3 = 0 THEN 'fin|swe' ELSE 'eng|swe' END) AS langs,
         |  (CASE WHEN k % 2 = 0 THEN 'English text ' || cast(k as varchar) ELSE 'Svensk text ' || cast(k as varchar) END) AS description,
         |  'Svensk text ' || cast(k as varchar)
         |    || (CASE WHEN k % 2 = 0 THEN '|English text ' || cast(k as varchar) ELSE '' END)
         |    || (CASE WHEN k % 5 = 0 THEN '' ELSE '|plain note' END) AS contents,
         |  'https://ex.org/' || cast(k as varchar)
         |    || (CASE WHEN k % 3 = 0 THEN '|https://doi.org/10.123/x' || cast(k as varchar) || '?utm=1' ELSE '' END)
         |    || (CASE WHEN k % 2 = 0 THEN '' ELSE '|https://desc.ex/' || cast(k as varchar) END) AS urls,
         |  'House of ' || w[2] || ' Ltd.' AS publisher
         |FROM st3""".stripMargin
  }

  private val lrmi = Q(
    "lrmi_extract",
    (s, d) => {
      val k = col("c_custkey")
      val cname = col("c_name")
      val authors = array(
        struct(lit("person").as("kind"), concat(lit("P1 "), cname).as("name")),
        struct(lit("person").as("kind"),
          when(k % 2 === 0, concat(lit("P2 "), cname)).otherwise(lit(null: String)).as("name")),
        struct(lit("org").as("kind"),
          when(k % 3 === 0, concat(lit("Org "), cname)).otherwise(lit(null: String)).as("name"))
      )
      val about = array(
        struct(concat(lit("Topic A"), (k % 10).cast("string")).as("name"),
          when(k % 2 === 0, concat(lit("https://ex.org/t/"), k.cast("string")))
            .otherwise(lit("not-a-url")).as("id")),
        struct(
          when(k % 5 === 0, lit(null: String)).otherwise(lit("Topic B")).as("name"),
          concat(lit("http://ex.org/u/"), k.cast("string")).as("id"))
      )
      val materials = array(
        lit("fi"),
        when(k % 2 === 0, lit("EN")).otherwise(lit(null: String))
      )
      val doc = Tables
        .customer(s, d)
        .select(
          concat(lit("lrmi"), k.cast("string")).as("record_id"),
          when(k % 4 === 0, concat(lit("Course "), cname, lit(".")))
            .otherwise(concat(lit("Course "), cname)).as("rawtitle"),
          authors.as("authors"),
          about.as("about"),
          materials.as("materials"),
          array(lit(" sv-FI")).as("in_language")
        )
      lrmiSolrFrame(doc)
    },
    lrmiOracle
  )

  /** The LRMI toSolrArray derivation over any `(record_id, rawtitle,
    * authors<kind,name>, about<name,id>, materials, in_language)` frame —
    * shared between the registered query and ReferenceParitySpec's
    * lrmi1.xml fixture run (`Record/Lrmi.php` getters; languages follow
    * getLanguages:251 = material languages then inLanguage, uniqued).
    */
  def lrmiSolrFrame(doc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def byKind(kind: String): Column =
        filter(
          transform(
            filter(col("authors"), a => a.getField("kind") === kind),
            a => trim(a.getField("name"))
          ),
          n => n.isNotNull
        )
      val persons = byKind("person")
      // Topic entries without a thing name are skipped entirely; ids keep
      // only http(s) URLs, normalized to the http scheme.
      val abouts = filter(col("about"), a => a.getField("name").isNotNull)
      val topicIds = filter(
        transform(
          abouts,
          a => {
            val m = regexp_extract(a.getField("id"), "(http|https)://(.+)", 2)
            when(m =!= "", concat(lit("http://"), m)).otherwise(lit(null: String))
          }
        ),
        x => x.isNotNull
      )
      val langs = array_distinct(
        filter(
          transform(concat(col("materials"), col("in_language")), l => lower(trim(l))),
          l => l.isNotNull && l =!= ""
        )
      )
      doc.select(
        col("record_id"),
        col("rawtitle").as("title"),
        createSortTitle(col("rawtitle")).as("title_sort"),
        lit("LearningMaterial").as("format"),
        coalesce(get(persons, lit(0)), lit("")).as("author"),
        array_join(persons, "|").as("author2"),
        array_join(byKind("org"), "|").as("author_corporate"),
        array_join(transform(abouts, _.getField("name")), "|").as("topics"),
        array_join(topicIds, "|").as("topic_ids"),
        array_join(langs, "|").as("langs")
      )
  }

  private def lrmiOracle: Option[String] = Some {
      s"""WITH base AS (
         |  SELECT c_custkey AS k, 'lrmi' || cast(c_custkey as varchar) AS record_id,
         |    (CASE WHEN c_custkey % 4 = 0 THEN 'Course ' || c_name || '.' ELSE 'Course ' || c_name END) AS rawtitle,
         |    c_name AS cname
         |  FROM customer),
         |${sortTitleStagesSql("base", "rawtitle", "title_sort_s", "st")}
         |SELECT record_id,
         |  rawtitle AS title,
         |  title_sort_s AS title_sort,
         |  'LearningMaterial' AS format,
         |  'P1 ' || cname AS author,
         |  'P1 ' || cname || (CASE WHEN k % 2 = 0 THEN '|P2 ' || cname ELSE '' END) AS author2,
         |  (CASE WHEN k % 3 = 0 THEN 'Org ' || cname ELSE '' END) AS author_corporate,
         |  'Topic A' || cast(k % 10 as varchar) || (CASE WHEN k % 5 = 0 THEN '' ELSE '|Topic B' END) AS topics,
         |  (CASE WHEN k % 2 = 0 AND k % 5 = 0 THEN 'http://ex.org/t/' || cast(k as varchar)
         |        WHEN k % 2 = 0 THEN 'http://ex.org/t/' || cast(k as varchar) || '|http://ex.org/u/' || cast(k as varchar)
         |        WHEN k % 5 = 0 THEN ''
         |        ELSE 'http://ex.org/u/' || cast(k as varchar) END) AS topic_ids,
         |  'fi|' || (CASE WHEN k % 2 = 0 THEN 'en|' ELSE '' END) || 'sv-fi' AS langs
         |FROM st3""".stripMargin
  }

  private val ese = Q(
    "ese_extract",
    (s, d) => {
      val k = col("s_suppkey")
      val sname = col("s_name")
      val isbnBase = lpad((k * 104729 % 1000000000).cast("string"), 9, "0")
      val isbn10 = concat(isbnBase, isbn10CheckChar(isbnBase))
      val doc = Tables
        .supplier(s, d)
        .select(
          concat(lit("ese"), k.cast("string")).as("record_id"),
          when(k % 2 === 0, concat(sname, lit(" : annual report")))
            .otherwise(sname).as("rawtitle"),
          array(
            when(k % 3 === 0, lit("1999-2000"))
              .otherwise((lit(1900) + k % 100).cast("string")),
            lit("n.d.")
          ).as("dates"),
          array(
            // Unanchored candidate: the digits may sit mid-string.
            when(k % 4 === 0, concat(lit("isbn:"), isbn10))
              .otherwise(concat(lit("oai:ese:"), k.cast("string"))),
            when(k % 2 === 0, concat(lit("https://ese.ex/"), k.cast("string")))
              .otherwise(concat(lit("id-"), k.cast("string")))
          ).as("identifiers"),
          array(
            when(k % 3 === 0, concat(lit("https://ese.ex/d/"), k.cast("string")))
              .otherwise(lit("a plain description"))
          ).as("descriptions"),
          when(k % 2 === 0, lit("FIN swe")).otherwise(lit("engfin")).as("language"),
          when(k % 6 === 0, lit("")).otherwise(lit("IMAGE")).as("typ"),
          array(concat(lit("Contributor "), sname, lit(",")),
            concat(lit("Second "), sname)).as("contributors"),
          array(concat(lit("subject "), (k % 13).cast("string"))).as("subjects")
        )
      val titleParts = split(col("rawtitle"), " : ")
      def lastHttp(arr: Column): Column =
        get(reverse(filter(arr, v => v.rlike("^https?"))), lit(0))
      val year = coalesce(
        get(filter(col("dates"), dt => dt.rlike("^\\d{4}$")), lit(0)),
        lit("")
      )
      val isbns = array_distinct(
        filter(
          transform(
            col("identifiers"),
            i =>
              normalizeIsbn(
                regexp_extract(regexp_replace(i, "-", ""), "([0-9]{9,12}[0-9xX])", 1)
              )
          ),
          x => x =!= ""
        )
      )
      doc.select(
        col("record_id"),
        col("rawtitle").as("title"),
        element_at(titleParts, 1).as("title_short"),
        coalesce(get(titleParts, lit(1)), lit("")).as("title_sub"),
        createSortTitle(trim(col("rawtitle"))).as("title_sort"),
        col("typ").as("format"),
        when(col("typ") === "", lit("Unknown")).otherwise(col("typ")).as("dedup_format"),
        year.as("publish_year"),
        array_join(isbns, "|").as("isbns"),
        // ESE keeps language words whole: no 3-char chunking.
        array_join(
          filter(transform(split(col("language"), " "), wd => lower(trim(wd))), x => x =!= ""),
          "|"
        ).as("langs"),
        array_join(col("contributors"), "|").as("author2"),
        array_join(col("subjects"), "|").as("topics"),
        coalesce(lastHttp(col("descriptions")), lastHttp(col("identifiers")), lit(""))
          .as("url")
      )
    },
    Some {
      val isbnB = "lpad(cast(k*104729 % 1000000000 as varchar), 9, '0')"
      s"""WITH base0 AS (SELECT s_suppkey AS k, s_name AS sname FROM supplier),
         |base AS (
         |  SELECT k, sname, 'ese' || cast(k as varchar) AS record_id,
         |    $isbnB AS ib,
         |    (CASE WHEN k % 2 = 0 THEN sname || ' : annual report' ELSE sname END) AS rawtitle
         |  FROM base0),
         |isb AS (SELECT *, ib || ${isbn10CheckCharSql("ib")} AS isbn10 FROM base),
         |${sortTitleStagesSql("isb", "rawtitle", "title_sort_s", "st")}
         |SELECT record_id,
         |  rawtitle AS title,
         |  (CASE WHEN k % 2 = 0 THEN sname ELSE rawtitle END) AS title_short,
         |  (CASE WHEN k % 2 = 0 THEN 'annual report' ELSE '' END) AS title_sub,
         |  title_sort_s AS title_sort,
         |  (CASE WHEN k % 6 = 0 THEN '' ELSE 'IMAGE' END) AS format,
         |  (CASE WHEN k % 6 = 0 THEN 'Unknown' ELSE 'IMAGE' END) AS dedup_format,
         |  (CASE WHEN k % 3 = 0 THEN '' ELSE cast(1900 + k % 100 as varchar) END) AS publish_year,
         |  (CASE WHEN k % 4 = 0 THEN ${isbn10to13Sql("isbn10")} ELSE '' END) AS isbns,
         |  (CASE WHEN k % 2 = 0 THEN 'fin|swe' ELSE 'engfin' END) AS langs,
         |  'Contributor ' || sname || ',|Second ' || sname AS author2,
         |  'subject ' || cast(k % 13 as varchar) AS topics,
         |  (CASE WHEN k % 3 = 0 THEN 'https://ese.ex/d/' || cast(k as varchar)
         |        WHEN k % 2 = 0 THEN 'https://ese.ex/' || cast(k as varchar)
         |        ELSE '' END) AS url
         |FROM st3""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(qdc, lrmi, ese)
}
