package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import MetadataQueries._

/** XML metadata-profile extraction, part 2: DOAJ articles, EAC-CPF
  * authority entities and Forward (EN 15907) film records.
  *
  * Reference semantics (re-expressed, not ported):
  *   - `Record/Doaj.php` — punctuation-preserving title strip:241 (a
  *     punctuation-only title survives), two-part `explode(' : ', 2)` title
  *     split where the remainder keeps inner colons:195, author/keyword
  *     wrapper structures with empty entries filtered:185-216, strict
  *     `substr(date,1,4)` years:308, constant 'Article' format.
  *   - `Record/Eaccpf.php` — TONI1/TONI4 heading assembly with
  *     nameEntryParallel fallback:251, RDA-URI-typed birth/death dates
  *     (P50121/P50120):137,:176 via extractYear, birth/death/related place
  *     partitioning (P50119/P50118 vs the rest):157,:196,:330, TJ37
  *     activity notes joined with '. ':227, entityType default
  *     'undefined':358.
  *   - `Record/Forward.php` — agent extraction by normalized relator code
  *     with the class-default primary/secondary relator sets:60, the
  *     directors-first primary ordering (relator d02):392, language-
  *     preferred Synopsis / Content description selection with fallback to
  *     all languages:422-466, Title vs IdentifyingTitle alternates:168,
  *     IDTypeName-prefixed record ids:138, main-author Last,First
  *     conversion:232.
  *
  * Same design as [[ProfileQueries]]: deterministic `array<struct<...>>`
  * models from the testdata tables, extraction as pure column expressions,
  * oracle recomputation through the shared SQL templates.
  */
object ProfileQueries2 {

  private val doaj = Q(
    "doaj_extract",
    (s, d) => {
      val k = col("c_custkey")
      val cname = col("c_name")
      val doc = Tables
        .customer(s, d)
        .select(
          concat(lit("doaj"), k.cast("string")).as("record_id"),
          when(k % 25 === 0, lit("/:"))
            .when(k % 7 === 0, concat(cname, lit(" : part one : part two /")))
            .otherwise(concat(cname, lit(" : study /"))).as("rawtitle"),
          array(
            struct(concat(lit("A "), cname).as("name")),
            struct(when(k % 3 === 0, lit("")).otherwise(concat(lit("B "), cname)).as("name"))
          ).as("authors"),
          array(
            struct(concat(lit("kw"), (k % 10).cast("string")).as("keyword")),
            struct(when(k % 2 === 0, lit("")).otherwise(lit("kwB")).as("keyword"))
          ).as("keywords"),
          concat(lit("Pub "), cname, lit(",")).as("rawpublisher"),
          when(k % 3 === 0, concat((lit(1980) + k % 40).cast("string"), lit("-05-01")))
            .when(k % 11 === 0, lit("15"))
            .otherwise((lit(1980) + k % 40).cast("string")).as("pubdate"),
          when(k % 5 === 0, lit("engfinswe")).otherwise(lit("eng FIN")).as("language"),
          concat(lit("https://doaj.ex/"), k.cast("string")).as("fulltexturl")
        )
      val title = stripTrailingPunctuationPreserve(trim(col("rawtitle")))
      // explode(' : ', 2): the remainder keeps any further ' : ' intact.
      val titleParts = split(title, " : ", 2)
      val yearCand = substring(col("pubdate"), 1, 4)
      def langChunks(w: Column): Column =
        transform(
          sequence(lit(0), floor((length(w) - 1) / 3).cast("int")),
          i => lower(w.substr(i * 3 + 1, lit(3)))
        )
      doc.select(
        col("record_id"),
        title.as("title"),
        element_at(titleParts, 1).as("title_short"),
        coalesce(get(titleParts, lit(1)), lit("")).as("title_sub"),
        createSortTitle(trim(col("rawtitle"))).as("title_sort"),
        array_join(
          filter(transform(col("authors"), _.getField("name")), n => n =!= ""),
          "|"
        ).as("author"),
        stripTrailingPunctuation(trim(col("rawpublisher"))).as("publisher"),
        when(yearCand.rlike("^\\d{4}$"), yearCand).otherwise(lit("")).as("publish_year"),
        array_join(
          filter(transform(col("keywords"), _.getField("keyword")), x => x =!= ""),
          "|"
        ).as("topics"),
        array_join(
          flatten(transform(split(trim(col("language")), " "), langChunks(_))),
          "|"
        ).as("langs"),
        lit("Article").as("format"),
        col("fulltexturl").as("url")
      )
    },
    Some {
      s"""WITH base AS (
         |  SELECT c_custkey AS k, c_name AS cname,
         |    'doaj' || cast(c_custkey as varchar) AS record_id,
         |    (CASE WHEN c_custkey % 25 = 0 THEN '/:'
         |          WHEN c_custkey % 7 = 0 THEN c_name || ' : part one : part two /'
         |          ELSE c_name || ' : study /' END) AS rawtitle,
         |    'Pub ' || c_name || ',' AS rawpublisher
         |  FROM customer),
         |${stripTrailStagesSql("base", "rawtitle", "title_plain", "dt")},
         |${stripTrailStagesSql("dt4", "rawpublisher", "pub_s", "dp")},
         |${sortTitleStagesSql("dp4", "rawtitle", "title_sort_s", "st")},
         |titled AS (SELECT *,
         |  (CASE WHEN title_plain = '' THEN rawtitle ELSE title_plain END) AS title_s
         |  FROM st3)
         |SELECT record_id,
         |  title_s AS title,
         |  (CASE WHEN strpos(title_s, ' : ') > 0 THEN substr(title_s, 1, strpos(title_s, ' : ') - 1) ELSE title_s END) AS title_short,
         |  (CASE WHEN strpos(title_s, ' : ') > 0 THEN substr(title_s, strpos(title_s, ' : ') + 3) ELSE '' END) AS title_sub,
         |  title_sort_s AS title_sort,
         |  'A ' || cname || (CASE WHEN k % 3 = 0 THEN '' ELSE '|B ' || cname END) AS author,
         |  pub_s AS publisher,
         |  (CASE WHEN k % 3 != 0 AND k % 11 = 0 THEN '' ELSE cast(1980 + k % 40 as varchar) END) AS publish_year,
         |  'kw' || cast(k % 10 as varchar) || (CASE WHEN k % 2 = 0 THEN '' ELSE '|kwB' END) AS topics,
         |  (CASE WHEN k % 5 = 0 THEN 'eng|fin|swe' ELSE 'eng|fin' END) AS langs,
         |  'Article' AS format,
         |  'https://doaj.ex/' || cast(k as varchar) AS url
         |FROM titled""".stripMargin
    }
  )

  private val RdaBirthDate = "http://rdaregistry.info/Elements/a/P50121"
  private val RdaDeathDate = "http://rdaregistry.info/Elements/a/P50120"
  private val RdaBirthPlace = "http://rdaregistry.info/Elements/a/P50119"
  private val RdaDeathPlace = "http://rdaregistry.info/Elements/a/P50118"

  private val eaccpf = Q(
    "eaccpf_extract",
    (s, d) => {
      val k = col("c_custkey")
      val ks = k.cast("string")
      val e = lit("")
      val doc = Tables
        .customer(s, d)
        .select(
          concat(lit("eac"), ks).as("record_id"),
          // nameEntry parts, TONI1 = family-ish, TONI4 = given-ish.
          when(k % 4 === 0,
            array(struct(lit("TONI1").as("typ"), concat(lit("Family"), ks).as("val")),
              struct(lit("TONI4").as("typ"), concat(lit("Given"), ks).as("val"))))
            .when(k % 4 === 1,
              array(struct(lit("TONI1").as("typ"), concat(lit("Family"), ks).as("val"))))
            .when(k % 4 === 2,
              array(struct(lit("TONI4").as("typ"), concat(lit("Given"), ks).as("val"))))
            .otherwise(array(struct(lit("TONIX").as("typ"), lit("X").as("val"))))
            .as("parts"),
          array(
            when(k % 2 === 0, struct(concat(lit("Alt"), ks).as("p1"), concat(lit("AltG"), ks).as("p4")))
              .otherwise(struct(e.as("p1"), e.as("p4"))),
            struct(concat(lit("Par"), ks).as("p1"), e.as("p4"))
          ).as("parallels"),
          array(
            struct(lit(RdaBirthDate).as("typ"),
              concat(lit("18"), lpad((k % 100).cast("string"), 2, "0"), lit("-05-02")).as("std")),
            struct(lit(RdaDeathDate).as("typ"),
              when(k % 6 === 0, lit("n.d."))
                .otherwise(concat(lit("19"), lpad((k % 50).cast("string"), 2, "0"))).as("std"))
          ).as("dates"),
          array(
            struct(lit(RdaBirthPlace).as("typ"), concat(lit("BCity"), (k % 50).cast("string")).as("entry")),
            struct(lit(RdaDeathPlace).as("typ"),
              when(k % 3 === 0, e).otherwise(concat(lit("DCity"), (k % 50).cast("string"))).as("entry")),
            struct(lit("assoc").as("typ"), concat(lit("RCity"), (k % 50).cast("string")).as("entry"))
          ).as("places"),
          array(concat(lit("Occ"), (k % 5).cast("string")),
            when(k % 2 === 0, e).otherwise(lit("Baker"))).as("occupations"),
          array(
            struct(lit("TJ37").as("typ"),
              when(k % 9 === 0, array().cast("array<string>"))
                .otherwise(array(lit("Note one"), lit("Note two"))).as("notes")),
            struct(lit("XX").as("typ"), array(lit("Nope")).as("notes"))
          ).as("funcs"),
          when(k % 2 === 0, lit("person")).otherwise(lit(null: String)).as("entity_type"),
          lit(" fi ").as("lang_code")
        )
      eaccpfSolrFrame(doc)
    },
    eaccpfOracle
  )

  /** The EAC-CPF toSolrArray derivation over any `(record_id,
    * parts<typ,val>, parallels<p1,p4>, dates<typ,std>, places<typ,entry>,
    * occupations, funcs<typ,notes>, entity_type, lang_code)` frame —
    * shared between the registered query and ReferenceParitySpec's
    * eaccpf1.xml fixture run (`Record/Eaccpf.php` getters).
    */
  def eaccpfSolrFrame(doc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def partOf(typ: String): Column =
        coalesce(
          get(
            transform(
              filter(col("parts"), p => p.getField("typ") === typ),
              _.getField("val")
            ),
            lit(0)
          ),
          lit("")
        )
      val name1 = partOf("TONI1")
      val name2 = partOf("TONI4")
      val useFor = filter(
        transform(col("parallels"), p =>
          trim(concat(p.getField("p1"), lit(" "), p.getField("p4")))),
        x => x =!= ""
      )
      val heading = when(name1 === "" && name2 === "", coalesce(get(useFor, lit(0)), lit("")))
        .when(name1 =!= "" && name2 =!= "", trim(concat(name1, lit(" "), name2)))
        .otherwise(when(name1 =!= "", name1).otherwise(name2))
      def dateOf(typ: String): Column =
        coalesce(
          get(
            filter(
              transform(
                filter(col("dates"), dt => dt.getField("typ") === typ),
                dt => extractYear(dt.getField("std"))
              ),
              y => y =!= ""
            ),
            lit(0)
          ),
          lit("")
        )
      def placeOf(typ: String): Column =
        coalesce(
          get(
            filter(
              transform(
                filter(col("places"), p => p.getField("typ") === typ),
                _.getField("entry")
              ),
              x => x =!= ""
            ),
            lit(0)
          ),
          lit("")
        )
      val related = filter(
        transform(
          filter(
            col("places"),
            p => p.getField("typ") =!= RdaBirthPlace && p.getField("typ") =!= RdaDeathPlace
          ),
          _.getField("entry")
        ),
        x => x =!= ""
      )
      val activity = array_join(
        transform(
          filter(
            col("funcs"),
            fn => fn.getField("typ") === "TJ37" && size(fn.getField("notes")) > 0
          ),
          fn => array_join(fn.getField("notes"), ". ")
        ),
        "|"
      )
      doc.select(
        col("record_id"),
        coalesce(col("entity_type"), lit("undefined")).as("record_type"),
        heading.as("heading"),
        array_join(useFor, "|").as("use_for"),
        dateOf(RdaBirthDate).as("birth_date"),
        dateOf(RdaDeathDate).as("death_date"),
        placeOf(RdaBirthPlace).as("birth_place"),
        placeOf(RdaDeathPlace).as("death_place"),
        array_join(related, "|").as("related_place"),
        array_join(filter(col("occupations"), o => o =!= ""), "|").as("occupation"),
        activity.as("field_of_activity"),
        trim(col("lang_code")).as("language")
      )
  }

  private def eaccpfOracle: Option[String] = Some {
      s"""SELECT
         |  'eac' || cast(c_custkey as varchar) AS record_id,
         |  (CASE WHEN c_custkey % 2 = 0 THEN 'person' ELSE 'undefined' END) AS record_type,
         |  (CASE WHEN c_custkey % 4 = 0 THEN 'Family' || cast(c_custkey as varchar) || ' Given' || cast(c_custkey as varchar)
         |        WHEN c_custkey % 4 = 1 THEN 'Family' || cast(c_custkey as varchar)
         |        WHEN c_custkey % 4 = 2 THEN 'Given' || cast(c_custkey as varchar)
         |        ELSE 'Par' || cast(c_custkey as varchar) END) AS heading,
         |  (CASE WHEN c_custkey % 2 = 0
         |        THEN 'Alt' || cast(c_custkey as varchar) || ' AltG' || cast(c_custkey as varchar) || '|Par' || cast(c_custkey as varchar)
         |        ELSE 'Par' || cast(c_custkey as varchar) END) AS use_for,
         |  '18' || lpad(cast(c_custkey % 100 as varchar), 2, '0') AS birth_date,
         |  (CASE WHEN c_custkey % 6 = 0 THEN '' ELSE '19' || lpad(cast(c_custkey % 50 as varchar), 2, '0') END) AS death_date,
         |  'BCity' || cast(c_custkey % 50 as varchar) AS birth_place,
         |  (CASE WHEN c_custkey % 3 = 0 THEN '' ELSE 'DCity' || cast(c_custkey % 50 as varchar) END) AS death_place,
         |  'RCity' || cast(c_custkey % 50 as varchar) AS related_place,
         |  'Occ' || cast(c_custkey % 5 as varchar) || (CASE WHEN c_custkey % 2 = 0 THEN '' ELSE '|Baker' END) AS occupation,
         |  (CASE WHEN c_custkey % 9 = 0 THEN '' ELSE 'Note one. Note two' END) AS field_of_activity,
         |  'fi' AS language
         |FROM customer""".stripMargin
  }

  private val PrimaryRelators = Seq("d02", "a00", "a03", "a06", "a50", "a99")
  private val SecondaryRelators = Seq("d01", "e01", "f01", "f02")

  private val forward = Q(
    "forward_extract",
    (s, d) => {
      val k = col("p_partkey")
      val name = col("p_name")
      val w = split(name, " ")
      val doc = Tables
        .part(s, d)
        .select(
          k.as("k"),
          name.as("name"),
          when(k % 2 === 0, concat(lit("elonet_"), k.cast("string")))
            .otherwise(k.cast("string")).as("record_id"),
          concat(name, lit(" elokuva")).as("ident_title"),
          array(concat(name, lit(" elokuva")), concat(lit("Alt "), name)).as("title_texts"),
          array(
            struct(concat(lit("Lead "), element_at(w, 1)).as("name"), lit("A00.").as("activity")),
            struct(concat(lit("Dir "), element_at(w, 2)).as("name"), lit("D02").as("activity")),
            struct(concat(lit("Actor "), element_at(w, 1)).as("name"), lit("E01").as("activity")),
            struct(concat(lit("Org "), element_at(w, 2)).as("name"),
              when(k % 3 === 0, lit("A99")).otherwise(lit("XYZ")).as("activity"))
          ).as("agents"),
          array(
            struct(lit("Synopsis").as("dtype"), lit("en").as("lang"),
              when(k % 2 === 0, concat(lit("An English synopsis "), k.cast("string")))
                .otherwise(lit("")).as("text")),
            struct(lit("Synopsis").as("dtype"), lit("fi").as("lang"),
              concat(lit("Fi synopsis "), k.cast("string")).as("text")),
            struct(lit("Content description").as("dtype"), lit("en").as("lang"),
              when(k % 4 === 0, concat(lit("English contents "), k.cast("string")))
                .otherwise(lit("")).as("text")),
            struct(lit("Content description").as("dtype"), lit("fi").as("lang"),
              concat(lit("Fi contents "), k.cast("string")).as("text"))
          ).as("contents"),
          array(
            struct(array(concat(lit("T"), (k % 7).cast("string")), lit("T2")).as("terms")),
            struct(array(lit("T3")).as("terms"))
          ).as("subjects"),
          array(
            concat(lit("Region "), (k % 5).cast("string")),
            when(k % 2 === 0, lit("")).otherwise(lit("Region X"))
          ).as("regions"),
          (lit(1920) + k % 90).cast("string").as("year_ref")
        )
      val withRel = transform(
        col("agents"),
        a => struct(
          a.getField("name").as("name"),
          normalizeRelator(a.getField("activity")).as("rel")
        )
      )
      def byRel(rels: Seq[String]): Column =
        filter(withRel, a => a.getField("rel").isin(rels.map(lit(_)): _*))
      val primaryUnsorted = byRel(PrimaryRelators)
      // Directors (relator d02) lead the primary author list.
      val primary = concat(
        filter(primaryUnsorted, a => a.getField("rel") === "d02"),
        filter(primaryUnsorted, a => a.getField("rel") =!= "d02")
      )
      val secondary = byRel(SecondaryRelators)
      def names(arr: Column): Column = transform(arr, _.getField("name"))
      def rels(arr: Column): Column = transform(arr, _.getField("rel"))
      val mainAuthor = {
        val a = coalesce(get(names(primary), lit(0)), lit(""))
        when(a =!= "" && !a.contains(","), convertAuthorLastFirst(a)).otherwise(a)
      }
      def descsOf(dtype: String): Column = {
        val typed = filter(
          col("contents"),
          c => c.getField("dtype") === dtype && c.getField("text") =!= ""
        )
        val en = filter(typed, c => c.getField("lang") === "en")
        transform(when(size(en) > 0, en).otherwise(typed), _.getField("text"))
      }
      doc.select(
        col("record_id"),
        col("ident_title").as("title"),
        array_join(filter(col("title_texts"), t => t =!= col("ident_title")), "|")
          .as("title_alt"),
        createSortTitle(col("ident_title")).as("title_sort"),
        array_join(names(primary), "|").as("author"),
        array_join(rels(primary), "|").as("author_role"),
        coalesce(get(names(primary), lit(0)), lit("")).as("author_sort"),
        mainAuthor.as("main_author"),
        array_join(names(secondary), "|").as("author2"),
        array_join(rels(secondary), "|").as("author2_role"),
        array_join(concat(descsOf("Synopsis"), descsOf("Content description")), " ")
          .as("description"),
        array_join(flatten(transform(col("subjects"), _.getField("terms"))), "|")
          .as("topics"),
        array_join(filter(col("regions"), r => r =!= ""), "|").as("geographic"),
        col("year_ref").as("publish_year"),
        lit("MotionPicture").as("format")
      )
    },
    Some {
      s"""WITH base AS (
         |  SELECT p_partkey AS k, p_name AS name, string_split(p_name, ' ') AS w,
         |    (CASE WHEN p_partkey % 2 = 0 THEN 'elonet_' || cast(p_partkey as varchar)
         |          ELSE cast(p_partkey as varchar) END) AS record_id,
         |    p_name || ' elokuva' AS rawtitle
         |  FROM part),
         |${sortTitleStagesSql("base", "rawtitle", "title_sort_s", "st")}
         |SELECT record_id,
         |  rawtitle AS title,
         |  'Alt ' || name AS title_alt,
         |  title_sort_s AS title_sort,
         |  'Dir ' || w[2] || '|Lead ' || w[1]
         |    || (CASE WHEN k % 3 = 0 THEN '|Org ' || w[2] ELSE '' END) AS author,
         |  'd02|a00' || (CASE WHEN k % 3 = 0 THEN '|a99' ELSE '' END) AS author_role,
         |  'Dir ' || w[2] AS author_sort,
         |  w[2] || ', Dir' AS main_author,
         |  'Actor ' || w[1] AS author2,
         |  'e01' AS author2_role,
         |  (CASE WHEN k % 2 = 0 THEN 'An English synopsis ' || cast(k as varchar)
         |        ELSE 'Fi synopsis ' || cast(k as varchar) END)
         |    || ' '
         |    || (CASE WHEN k % 4 = 0 THEN 'English contents ' || cast(k as varchar)
         |             ELSE 'Fi contents ' || cast(k as varchar) END) AS description,
         |  'T' || cast(k % 7 as varchar) || '|T2|T3' AS topics,
         |  'Region ' || cast(k % 5 as varchar)
         |    || (CASE WHEN k % 2 = 0 THEN '' ELSE '|Region X' END) AS geographic,
         |  cast(1920 + k % 90 as varchar) AS publish_year,
         |  'MotionPicture' AS format
         |FROM st3""".stripMargin
    }
  )

  /** Forward authority records (reference: Record/ForwardAuthority.php):
    * AgentDate entries typed by AgentDateEventType (51 = birth, 52 =
    * death) carrying date text + place:196, with `extractYear` applied at
    * indexing time:83; PersonName → CorporateName heading fallback:231;
    * occupation label assembly `Affiliation: Position`:258; AgentPlace
    * related place:285; IDTypeName-prefixed id and record type:56,:311.
    */
  private val forwardAuthority = Q(
    "forward_authority",
    (s, d) => {
      val k = col("c_custkey")
      val ks = k.cast("string")
      val e = lit("")
      val doc = Tables
        .customer(s, d)
        .select(
          concat(lit("elonet_henkilo_"), ks).as("record_id"),
          array(
            struct(lit(51).as("etype"),
              concat(lit("noin 18"), lpad((k % 100).cast("string"), 2, "0")).as("dtext"),
              concat(lit("BP"), (k % 30).cast("string")).as("place")),
            when(k % 4 === 0, struct(lit(53).as("etype"), lit("other").as("dtext"), lit("X").as("place")))
              .otherwise(struct(lit(52).as("etype"),
                concat(lit("19"), lpad((k % 50).cast("string"), 2, "0"), lit("-01-01")).as("dtext"),
                concat(lit("DP"), (k % 30).cast("string")).as("place")))
          ).as("agent_dates"),
          when(k % 3 === 0, lit(null: String)).otherwise(concat(lit("Person "), ks))
            .as("person_name"),
          concat(lit("Corp "), ks).as("corporate_name"),
          when(k % 2 === 0, lit("University")).otherwise(e).as("affiliation"),
          when(k % 3 === 0, lit("Professor")).otherwise(e).as("position"),
          when(k % 5 === 0, lit(null: String)).otherwise(concat(lit("RPlace"), (k % 20).cast("string")))
            .as("agent_place"),
          lit("elonet_henkilo").as("id_type")
        )
      def agentDate(etype: Int): Column =
        get(filter(col("agent_dates"), dt => dt.getField("etype") === etype), lit(0))
      val heading = coalesce(col("person_name"), col("corporate_name"))
      val occupation = when(
        col("affiliation") =!= "" && col("position") =!= "",
        concat(col("affiliation"), lit(": "), col("position"))
      ).when(col("affiliation") =!= "", col("affiliation"))
        .otherwise(col("position"))
      doc.select(
        col("record_id"),
        col("id_type").as("record_type"),
        heading.as("heading"),
        heading.as("use_for"),
        coalesce(extractYear(agentDate(51).getField("dtext")), lit("")).as("birth_date"),
        coalesce(extractYear(agentDate(52).getField("dtext")), lit("")).as("death_date"),
        coalesce(agentDate(51).getField("place"), lit("")).as("birth_place"),
        coalesce(agentDate(52).getField("place"), lit("")).as("death_place"),
        coalesce(col("agent_place"), lit("")).as("related_place"),
        occupation.as("occupation")
      )
    },
    Some {
      s"""SELECT
         |  'elonet_henkilo_' || cast(c_custkey as varchar) AS record_id,
         |  'elonet_henkilo' AS record_type,
         |  (CASE WHEN c_custkey % 3 = 0 THEN 'Corp ' || cast(c_custkey as varchar)
         |        ELSE 'Person ' || cast(c_custkey as varchar) END) AS heading,
         |  (CASE WHEN c_custkey % 3 = 0 THEN 'Corp ' || cast(c_custkey as varchar)
         |        ELSE 'Person ' || cast(c_custkey as varchar) END) AS use_for,
         |  '18' || lpad(cast(c_custkey % 100 as varchar), 2, '0') AS birth_date,
         |  (CASE WHEN c_custkey % 4 = 0 THEN '' ELSE '19' || lpad(cast(c_custkey % 50 as varchar), 2, '0') END) AS death_date,
         |  'BP' || cast(c_custkey % 30 as varchar) AS birth_place,
         |  (CASE WHEN c_custkey % 4 = 0 THEN '' ELSE 'DP' || cast(c_custkey % 30 as varchar) END) AS death_place,
         |  (CASE WHEN c_custkey % 5 = 0 THEN '' ELSE 'RPlace' || cast(c_custkey % 20 as varchar) END) AS related_place,
         |  (CASE WHEN c_custkey % 6 = 0 THEN 'University: Professor'
         |        WHEN c_custkey % 2 = 0 THEN 'University'
         |        WHEN c_custkey % 3 = 0 THEN 'Professor'
         |        ELSE '' END) AS occupation
         |FROM customer""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(doaj, eaccpf, forward, forwardAuthority)
}
