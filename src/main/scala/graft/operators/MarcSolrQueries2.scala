package graft.operators

import graft.{Q, Tables}
import graft.functions.CallNumbers._
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The remaining MARC `toSolrArray` title/display projections — the last
  * block of the reference's Solr-document surface with no repo
  * counterpart after MarcSolrQueries (work keys, building, DOIs, …).
  *
  * Reference anchors (Record/Marc.php):
  *  - title_sub/old/new + the 240 fallback for title_short/title_full —
  *    toSolrArray:400-438, getShortTitle:1552, getFullTitle:1756;
  *  - series — getSeries:2536 (440$a / 490$a / 800 / 830);
  *  - author_variant — getAuthorVariants:2382 (authorInitials over $a),
  *    author_sort first-primary-else-secondary (:376,:386),
  *    author_additional 505$r (:393);
  *  - publisher 260$b with the 264-ind2=1 fallback (:430-449), physical
  *    300/530 (:455), dateSpan 362$a (:461), edition 250$a (:464),
  *    contents 505$a/$t (:465);
  *  - lccn 010$a (:355), ctrlnum 035$a (:359), url 856$u (:560);
  *  - topic/genre/geographic/era facets — getTopicFacets:2089,
  *    getGenreFacets:2114 (ucFirst), getGeographicFacets:2141,
  *    getEraFacets:2166 (subfield order per getter);
  *  - the dewey 082/083 loop (:568-584): hundreds/tens/ones/full/raw from
  *    the LAST field (loop overwrite), sort key from the FIRST;
  *  - linking id with the 003-source prefix — getLinkingIDs:619,
  *    createLinkingId:1567.
  *
  * Everything is a codegen'd column expression over a deterministic
  * synthesized record (house style of this registry: the oracle SQL
  * mirrors the same synthesis), so the projections parallelize per-row
  * with no shuffle at any scale. 880-linked twins (GET_BOTH) are covered
  * by marc_subjects_880 and excluded from the synthesis here.
  */
object MarcSolrQueries2 {

  private def joinNonEmpty(sep: String, cs: Column*): Column =
    array_join(filter(array(cs: _*), c => c =!= ""), sep)

  private val titles = Q(
    "marc_solr_titles",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val e = lit("")
      val ws = split(col("p_name"), " ")
      def w(i: Int) = element_at(ws, i)

      // 245 present unless k%11==10 — those rows exercise the 240 fallback.
      val has245 = k % 11 =!= 10
      val a245 =
        concat(lit("Title "), w(1), lit(" "), ks, when(k % 4 === 0, lit(" /")).otherwise(e))
      val b245 = when(k % 3 === 0, concat(lit("a subtitle of "), w(2))).otherwise(e)
      val n245 = when(k % 5 === 0, concat(lit("Part "), (k % 4).cast("string"))).otherwise(e)
      val p245 = when(k % 10 === 0, concat(lit("Section "), (k % 3).cast("string"))).otherwise(e)
      val title240 =
        joinNonEmpty(" ", concat(lit("Uniform "), w(2)), when(k % 2 === 0, lit("No. 1")).otherwise(e))

      val titleSub = when(has245, joinNonEmpty(" ", b245, n245, p245)).otherwise(e)
      val titleOld = when(k % 7 === 0, concat(lit("Old "), w(1), lit(" Former title"))).otherwise(e)
      val titleNew = when(k % 8 === 0, concat(lit("New "), w(2))).otherwise(e)

      // getSeries field order: 440, 490, 800, 830.
      val series = joinNonEmpty(
        "|",
        when(k % 4 === 0, concat(lit("Series A "), (k % 9).cast("string"))).otherwise(e),
        when(k % 6 === 0, concat(lit("Unnumbered series "), (k % 7).cast("string"))).otherwise(e),
        when(k % 9 === 0, concat(lit("Author "), w(1), lit(" Collected works"))).otherwise(e),
        when(k % 12 === 0, concat(lit("Main series Subseries "), (k % 3).cast("string"))).otherwise(e)
      )

      // 100$a in both personal ("Last, First") and direct-order forms; 700$a
      // as the secondary fallback for author_sort.
      val a100 = when(
        k % 7 =!= 6,
        when(k % 2 === 0, concat(w(2), lit(", "), w(1))).otherwise(concat(w(1), lit(" "), w(2)))
      ).otherwise(e)
      val a700 = when(k % 3 === 1, concat(lit("Secondary "), w(2))).otherwise(e)
      val additional = when(k % 10 === 0, concat(lit("Foreword by "), w(2))).otherwise(e)

      // Staged selects: the strip-preserve combinator re-references its
      // operand ~600×, so it runs over aliased attributes, not over the
      // assembled 245 trees (the single-select form inlined ~65k nodes).
      val l1 = Tables
        .part(s, d)
        .select(
          k.as("record_id"),
          has245.as("has245"),
          a245.as("a245"),
          joinNonEmpty(" ", a245, b245, n245, p245).as("full_raw"),
          title240.as("title240"),
          titleSub.as("title_sub"),
          titleOld.as("title_old"),
          titleNew.as("title_new"),
          series.as("series"),
          a100.as("a100"),
          a700.as("a700"),
          additional.as("author_additional")
        )
      l1.select(
        col("record_id"),
        col("title_sub"),
        when(col("has245"), stripTrailingPunctuationPreserve(col("a245")))
          .otherwise(col("title240")).as("title_short"),
        when(col("has245"), stripTrailingPunctuationPreserve(col("full_raw")))
          .otherwise(col("title240")).as("title_full"),
        col("title_old"),
        col("title_new"),
        col("series"),
        when(col("a100") =!= "", MetadataQueries2.authorInitials(col("a100")))
          .otherwise(lit("")).as("author_variant"),
        when(col("a100") =!= "", col("a100")).otherwise(col("a700")).as("author_sort"),
        col("author_additional")
      )
    },
    Some {
      // For the synthesized 2-word names, authorInitials reduces to
      // "i1 i2 i1i2" in both the personal and direct-order forms (the
      // personal rotation restores first-last order); the general formula
      // is oracle-checked by the author_initials query.
      s"""WITH t AS (SELECT p_partkey AS k,
         |  string_split(p_name, ' ')[1] AS w1, string_split(p_name, ' ')[2] AS w2 FROM part),
         |c AS (SELECT *,
         |  (k % 11 != 10) AS has245,
         |  'Title ' || w1 || ' ' || cast(k as varchar) || (CASE WHEN k % 4 = 0 THEN ' /' ELSE '' END) AS ta,
         |  (CASE WHEN k % 3 = 0 THEN 'a subtitle of ' || w2 ELSE '' END) AS tb,
         |  (CASE WHEN k % 5 = 0 THEN 'Part ' || cast(k % 4 as varchar) ELSE '' END) AS tn,
         |  (CASE WHEN k % 10 = 0 THEN 'Section ' || cast(k % 3 as varchar) ELSE '' END) AS tp,
         |  'Uniform ' || w2 || (CASE WHEN k % 2 = 0 THEN ' No. 1' ELSE '' END) AS t240,
         |  (CASE WHEN k % 7 != 6
         |        THEN (CASE WHEN k % 2 = 0 THEN w2 || ', ' || w1 ELSE w1 || ' ' || w2 END)
         |        ELSE '' END) AS a100
         |  FROM t)
         |SELECT k AS record_id,
         |  (CASE WHEN has245 THEN coalesce(array_to_string(list_filter([tb, tn, tp], x -> x != ''), ' '), '') ELSE '' END) AS title_sub,
         |  (CASE WHEN has245 THEN rtrim(ta, ' /') ELSE t240 END) AS title_short,
         |  (CASE WHEN has245 THEN rtrim(coalesce(array_to_string(list_filter([ta, tb, tn, tp], x -> x != ''), ' '), ''), ' /') ELSE t240 END) AS title_full,
         |  (CASE WHEN k % 7 = 0 THEN 'Old ' || w1 || ' Former title' ELSE '' END) AS title_old,
         |  (CASE WHEN k % 8 = 0 THEN 'New ' || w2 ELSE '' END) AS title_new,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN k % 4 = 0 THEN 'Series A ' || cast(k % 9 as varchar) ELSE '' END),
         |    (CASE WHEN k % 6 = 0 THEN 'Unnumbered series ' || cast(k % 7 as varchar) ELSE '' END),
         |    (CASE WHEN k % 9 = 0 THEN 'Author ' || w1 || ' Collected works' ELSE '' END),
         |    (CASE WHEN k % 12 = 0 THEN 'Main series Subseries ' || cast(k % 3 as varchar) ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS series,
         |  (CASE WHEN a100 != ''
         |        THEN substr(w1,1,1) || ' ' || substr(w2,1,1) || ' ' || substr(w1,1,1) || substr(w2,1,1)
         |        ELSE '' END) AS author_variant,
         |  (CASE WHEN a100 != '' THEN a100
         |        WHEN k % 3 = 1 THEN 'Secondary ' || w2
         |        ELSE '' END) AS author_sort,
         |  (CASE WHEN k % 10 = 0 THEN 'Foreword by ' || w2 ELSE '' END) AS author_additional
         |FROM c""".stripMargin
    }
  )

  private val display = Q(
    "marc_solr_display",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val e = lit("")
      val ws = split(col("p_name"), " ")
      def w(i: Int) = element_at(ws, i)

      // publisher: 260$b wins; else the first 264 with ind2=1.
      val b260 =
        when(k % 3 === 0, concat(lit("Pub House "), (k % 50).cast("string"), lit(","))).otherwise(e)
      val b264 = concat(lit("Printer "), w(2), lit("."))
      val publisher = when(b260 =!= "", stripTrailingPunctuation(b260))
        .when(k % 3 === 1, stripTrailingPunctuation(b264))
        .otherwise(e)

      val dateSpan = when(
        k % 9 === 0,
        concat((lit(1900) + k % 80).cast("string"), lit("-"), (lit(1910) + k % 80).cast("string"))
      ).otherwise(e)
      val edition = when(k % 6 === 0, concat((k % 5 + 1).cast("string"), lit(". ed."))).otherwise(e)
      val p300 = concat(
        lit("xii, "),
        (k % 400 + 10).cast("string"),
        lit(" pages illustrations "),
        (k % 15 + 16).cast("string"),
        lit(" cm")
      )
      val p530 = when(k % 10 === 0, lit("Also available online")).otherwise(e)
      val physical = joinNonEmpty("|", p300, p530)
      val c505a = when(k % 7 === 0, concat(lit("Chapter one -- Chapter "), w(1))).otherwise(e)
      val c505t = when(k % 14 === 0, lit("Introduction ; Conclusion")).otherwise(e)
      val contents = joinNonEmpty("|", c505a, c505t)
      val lccn = when(k % 5 === 0, (k % 99999).cast("string")).otherwise(e)
      val ctrlnum = joinNonEmpty(
        "|",
        concat(lit("(XX)"), ks),
        when(k % 4 === 0, concat(lit("ocm"), (k % 9999).cast("string"))).otherwise(e)
      )
      val url = when(k % 3 =!= 2, concat(lit("http://example.org/rec/"), ks)).otherwise(e)

      // Facet getters, subfield order per the reference getter specs
      // (600x before 650a/650x; 650v before 655a; 648a before 650y; 650z
      // before 651a).
      val topicFacet = joinNonEmpty(
        "|",
        when(k % 10 === 0, concat(lit("Person topic "), (k % 9).cast("string"))).otherwise(e),
        when(k % 2 === 0, concat(lit("Topic "), (k % 40).cast("string"))).otherwise(e),
        when(k % 6 === 0, concat(lit("Subdivision "), (k % 15).cast("string"))).otherwise(e)
      )
      val genreFacet = joinNonEmpty(
        "|",
        ucFirst(when(k % 8 === 0, lit("fiction")).otherwise(e)),
        ucFirst(when(k % 5 === 0, lit("electronic books")).otherwise(e))
      )
      val eraFacet = joinNonEmpty(
        "|",
        when(k % 7 === 0, concat((k % 20 + 1).cast("string"), lit("th century"))).otherwise(e),
        when(
          k % 11 === 0,
          concat(
            (lit(1800) + (k % 3) * 100).cast("string"),
            lit("-"),
            (lit(1899) + (k % 3) * 100).cast("string")
          )
        ).otherwise(e)
      )
      val geoFacet = joinNonEmpty(
        "|",
        when(k % 9 === 0, concat(lit("Region "), (k % 6).cast("string"))).otherwise(e),
        when(k % 3 === 0, concat(lit("Country "), (k % 12).cast("string"))).otherwise(e)
      )

      // The 082/083 loop: last field wins for hundreds/tens/ones/full/raw;
      // the sort key comes from the first.
      val n1 = (k % 1000).cast("string")
      val d1 = when(k % 4 === 0, n1)
        .when(k % 4 === 1, concat(n1, lit("."), (k % 100).cast("string")))
        .otherwise(e)
      val d2 = when(k % 8 <= 1, ((k * 7) % 1000).cast("string")).otherwise(e)
      val lastD = when(d2 =!= "", d2).otherwise(d1)
      val firstD = when(d1 =!= "", d1).otherwise(d2)

      val id001 = concat(lit("rec"), ks)
      val f003 = when(k % 2 === 0, lit("FI-NL")).otherwise(e)
      val linkingId = when(f003 =!= "", concat(lit("("), f003, lit(")"), id001)).otherwise(id001)

      Tables
        .part(s, d)
        .select(
          k.as("record_id"),
          publisher.as("publisher"),
          dateSpan.as("date_span"),
          edition.as("edition"),
          physical.as("physical"),
          contents.as("contents"),
          lccn.as("lccn"),
          ctrlnum.as("ctrlnum"),
          url.as("url"),
          topicFacet.as("topic_facet"),
          genreFacet.as("genre_facet"),
          eraFacet.as("era_facet"),
          geoFacet.as("geographic_facet"),
          deweyNumber(lastD, 100).as("dewey_hundreds"),
          deweyNumber(lastD, 10).as("dewey_tens"),
          deweyNumber(lastD, 1).as("dewey_ones"),
          deweySearchString(lastD).as("dewey_full"),
          deweySortKey(firstD).as("dewey_sort"),
          lastD.as("dewey_raw"),
          linkingId.as("linking_id")
        )
    },
    Some {
      // The synthesized dewey values are pure "N" / "N.M" forms (no cutter
      // or suffix), so the sort key reduces to len(digits)||digits||dec
      // plus the reference's always-appended empty-suffix segment (a
      // trailing space — DeweyCallNumber.php:165, pinned by its unit
      // test) and the search string to the raw value; the general
      // formulas are oracle-checked by dewey_callnum.
      def bucket(prec: Int) =
        s"lpad(cast(cast(floor(cast(lastd as double) / $prec) * $prec as bigint) as varchar), 3, '0')"
      s"""WITH t AS (SELECT p_partkey AS k,
         |  string_split(p_name, ' ')[1] AS w1, string_split(p_name, ' ')[2] AS w2 FROM part),
         |dw AS (SELECT *,
         |  (CASE WHEN k % 4 = 0 THEN cast(k % 1000 as varchar)
         |        WHEN k % 4 = 1 THEN cast(k % 1000 as varchar) || '.' || cast(k % 100 as varchar)
         |        ELSE '' END) AS d1,
         |  (CASE WHEN k % 8 <= 1 THEN cast((k * 7) % 1000 as varchar) ELSE '' END) AS d2
         |  FROM t),
         |dd AS (SELECT *,
         |  (CASE WHEN d2 != '' THEN d2 ELSE d1 END) AS lastd,
         |  (CASE WHEN d1 != '' THEN d1 ELSE d2 END) AS firstd
         |  FROM dw)
         |SELECT k AS record_id,
         |  (CASE WHEN k % 3 = 0 THEN 'Pub House ' || cast(k % 50 as varchar)
         |        WHEN k % 3 = 1 THEN 'Printer ' || w2
         |        ELSE '' END) AS publisher,
         |  (CASE WHEN k % 9 = 0 THEN cast(1900 + k % 80 as varchar) || '-' || cast(1910 + k % 80 as varchar) ELSE '' END) AS date_span,
         |  (CASE WHEN k % 6 = 0 THEN cast(k % 5 + 1 as varchar) || '. ed.' ELSE '' END) AS edition,
         |  'xii, ' || cast(k % 400 + 10 as varchar) || ' pages illustrations ' || cast(k % 15 + 16 as varchar) || ' cm'
         |    || (CASE WHEN k % 10 = 0 THEN '|Also available online' ELSE '' END) AS physical,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN k % 7 = 0 THEN 'Chapter one -- Chapter ' || w1 ELSE '' END),
         |    (CASE WHEN k % 14 = 0 THEN 'Introduction ; Conclusion' ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS contents,
         |  (CASE WHEN k % 5 = 0 THEN cast(k % 99999 as varchar) ELSE '' END) AS lccn,
         |  '(XX)' || cast(k as varchar) || (CASE WHEN k % 4 = 0 THEN '|ocm' || cast(k % 9999 as varchar) ELSE '' END) AS ctrlnum,
         |  (CASE WHEN k % 3 != 2 THEN 'http://example.org/rec/' || cast(k as varchar) ELSE '' END) AS url,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN k % 10 = 0 THEN 'Person topic ' || cast(k % 9 as varchar) ELSE '' END),
         |    (CASE WHEN k % 2 = 0 THEN 'Topic ' || cast(k % 40 as varchar) ELSE '' END),
         |    (CASE WHEN k % 6 = 0 THEN 'Subdivision ' || cast(k % 15 as varchar) ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS topic_facet,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN k % 8 = 0 THEN 'Fiction' ELSE '' END),
         |    (CASE WHEN k % 5 = 0 THEN 'Electronic books' ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS genre_facet,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN k % 7 = 0 THEN cast(k % 20 + 1 as varchar) || 'th century' ELSE '' END),
         |    (CASE WHEN k % 11 = 0 THEN cast(1800 + (k % 3) * 100 as varchar) || '-' || cast(1899 + (k % 3) * 100 as varchar) ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS era_facet,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN k % 9 = 0 THEN 'Region ' || cast(k % 6 as varchar) ELSE '' END),
         |    (CASE WHEN k % 3 = 0 THEN 'Country ' || cast(k % 12 as varchar) ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS geographic_facet,
         |  (CASE WHEN lastd = '' THEN '' ELSE ${bucket(100)} END) AS dewey_hundreds,
         |  (CASE WHEN lastd = '' THEN '' ELSE ${bucket(10)} END) AS dewey_tens,
         |  (CASE WHEN lastd = '' THEN '' ELSE ${bucket(1)} END) AS dewey_ones,
         |  lastd AS dewey_full,
         |  (CASE WHEN firstd = '' THEN ''
         |        ELSE cast(length(string_split(firstd, '.')[1]) as varchar) || firstd || ' ' END) AS dewey_sort,
         |  lastd AS dewey_raw,
         |  (CASE WHEN k % 2 = 0 THEN '(FI-NL)rec' || cast(k as varchar) ELSE 'rec' || cast(k as varchar) END) AS linking_id
         |FROM dd""".stripMargin
    }
  )

  /** Reusable allfields rollup over an array<struct<tag,code,val>> column
    * (Record/Marc.php:1946 getAllFields) — apply to any record-model
    * column; the registered query below exercises it on a synthesized
    * distribution. Returns the deduplicated value array (first
    * occurrences kept, record order).
    */
  def allFieldsRollup(fields: Column): Column = {
    val included = filter(
      fields,
      x => {
        val tag = x.getField("tag")
        val t = tag.cast("int")
        val excluded = when(tag === "650", array(lit("0"), lit("2"), lit("6"), lit("8")))
          .when(tag === "773", array(lit("6"), lit("7"), lit("8"), lit("w")))
          .when(tag === "856", array(lit("6"), lit("8"), lit("q")))
          .otherwise(array(lit("0"), lit("6"), lit("8")))
        ((t >= 100 && t < 841) || tag === "856" || tag === "880") &&
        !array_contains(excluded, x.getField("code"))
      }
    )
    array_distinct(
      transform(
        included,
        x => stripTrailingPunctuation(stripLeadingPunctuation(x.getField("val")))
      )
    )
  }

  /** The `allfields` free-text rollup (Record/Marc.php:1946 getAllFields):
    * fields with numeric tag in [100, 841) plus 856/880, minus per-tag
    * excluded subfield codes (default $0/$6/$8; 650 adds $2; 773 excludes
    * $6/$7/$8/$w; 856 excludes $6/$8/$q), each value
    * stripLeading+stripTrailing-punctuated, deduplicated keeping first
    * occurrences. Runs as filter/transform over the columnar
    * array<struct<tag,code,val>> record model — per-row, no shuffle.
    */
  private val allfields = Q(
    "marc_allfields",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val ws = split(col("p_name"), " ")
      def w(i: Int) = element_at(ws, i)
      def f(tag: String, code: String, v: Column) =
        struct(lit(tag).as("tag"), lit(code).as("code"), v.as("val"))
      val fields = array(
        f("035", "a", concat(lit("(XX)"), ks)),
        f("100", "a", concat(lit("Author, "), w(1), lit("."))),
        f("100", "0", lit("(id)123")),
        f("245", "a", concat(lit(":Title "), w(2), lit(" /"))),
        f("500", "a", when(k % 2 === 0, concat(lit("Topic "), (k % 40).cast("string"))).otherwise(lit("General note"))),
        f("650", "a", concat(lit("Topic "), (k % 40).cast("string"))),
        f("650", "2", lit("fast")),
        f("773", "t", lit("Host journal")),
        f("773", "w", concat(lit("(FI)"), ks)),
        f("856", "u", concat(lit("http://example.org/r"), ks)),
        f("856", "q", lit("text/html")),
        f("880", "a", lit("[Alt script title]")),
        f("900", "a", lit("Local note"))
      )
      Tables
        .part(s, d)
        .select(
          k.as("record_id"),
          array_join(allFieldsRollup(fields), "|").as("allfields")
        )
    },
    Some {
      s"""SELECT p_partkey AS record_id,
         |  'Author, ' || string_split(p_name, ' ')[1]
         |  || '|Title ' || string_split(p_name, ' ')[2]
         |  || (CASE WHEN p_partkey % 2 = 1 THEN '|General note' ELSE '' END)
         |  || '|Topic ' || cast(p_partkey % 40 as varchar)
         |  || '|Host journal'
         |  || '|http://example.org/r' || cast(p_partkey as varchar)
         |  || '|Alt script title' AS allfields
         |FROM part""".stripMargin
    }
  )

  /** The last Marc.php getters with no repo counterpart: getLanguages:2188
    * (008/35-37 control-field code first, then 041 $a/$d/$h/$j in spec
    * order, each trailing-punctuation-stripped then normalized via
    * normalizeLanguageStrings — trim + lowercase + drop empties, no
    * dedupe), getSeriesISSN:1037 (first 490$x) and getSeriesNumbering:1047
    * (first 490$v) via getFieldSubfield's trailing-punctuation strip,
    * getContainerReference:783 (first 773$g, stripped), and the enrichment
    * id harvests getRawTopicIds:1481 (650$0 verbatim) and
    * getRawGeographicTopicIds:1491 (651$0 verbatim). Pure per-row column
    * expressions — no shuffle at any scale.
    */
  private val langSeries = Q(
    "marc_lang_series",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val e = lit("")

      // 008/35-37 fixed-width code; all-blank (no code) trims to empty and
      // is dropped. The uppercase row exercises the lowercase path.
      val l008 = when(k % 4 === 0, lit("fin"))
        .when(k % 4 === 1, lit("SWE"))
        .when(k % 4 === 2, lit("eng"))
        .otherwise(lit("   "))
      val a1 = when(k % 3 === 0, lit("eng")).otherwise(e)
      val a2 = when(k % 6 === 0, lit("GER")).otherwise(e)
      val d1 = when(k % 5 === 0, lit("fre ")).otherwise(e)
      val h1 = when(k % 7 === 0, lit("lat")).otherwise(e)
      val j1 = when(k % 9 === 0, lit("swe")).otherwise(e)
      val languages = array_join(
        filter(
          transform(
            array(l008, a1, a2, d1, h1, j1),
            v => normalizeLanguageString(stripTrailingPunctuation(v))
          ),
          v => v =!= ""
        ),
        "|"
      )

      val issn = when(
        k % 5 === 0,
        concat(lit("0355-40"), lpad((k % 90).cast("string"), 2, "0"), lit(" ;"))
      ).otherwise(e)
      val numbering =
        when(k % 4 === 1, concat(lit("vol "), (k % 30).cast("string"))).otherwise(e)
      val container = when(
        k % 3 < 2,
        concat(
          lit("Vol. "),
          (k % 50).cast("string"),
          lit(", no. "),
          (k % 12).cast("string"),
          lit(", pages "),
          (k % 300 + 1).cast("string"),
          lit("-"),
          (k % 300 + 20).cast("string"),
          lit(" ;")
        )
      ).otherwise(e)

      val topicIds = array_join(
        filter(
          array(
            when(k % 2 === 0, concat(lit("(fast)fst"), (k % 100000).cast("string"))).otherwise(e),
            concat(lit("http://id.loc.gov/authorities/subjects/sh"), ks)
          ),
          v => v =!= ""
        ),
        "|"
      )
      val geoIds =
        when(k % 3 === 0, concat(lit("http://id.loc.gov/authorities/names/n"), ks)).otherwise(e)

      Tables
        .part(s, d)
        .select(
          k.as("record_id"),
          languages.as("languages"),
          stripTrailingPunctuation(issn).as("series_issn"),
          stripTrailingPunctuation(numbering).as("series_numbering"),
          stripTrailingPunctuation(container).as("container_reference"),
          topicIds.as("raw_topic_ids"),
          geoIds.as("raw_geo_topic_ids")
        )
    },
    Some {
      // The synthesized suffixes are all " ;"-form, so the reference's
      // trailing-punctuation strip reduces to rtrim(x, ' ;') here; the
      // general formula is oracle-checked by strip_trail_punct.
      s"""WITH c AS (SELECT p_partkey AS k,
         |  (CASE WHEN p_partkey%4=0 THEN 'fin' WHEN p_partkey%4=1 THEN 'swe'
         |        WHEN p_partkey%4=2 THEN 'eng' ELSE '' END) AS l008,
         |  (CASE WHEN p_partkey%3=0 THEN 'eng' ELSE '' END) AS a1,
         |  (CASE WHEN p_partkey%6=0 THEN 'ger' ELSE '' END) AS a2,
         |  (CASE WHEN p_partkey%5=0 THEN 'fre' ELSE '' END) AS d1,
         |  (CASE WHEN p_partkey%7=0 THEN 'lat' ELSE '' END) AS h1,
         |  (CASE WHEN p_partkey%9=0 THEN 'swe' ELSE '' END) AS j1
         |  FROM part)
         |SELECT k AS record_id,
         |  coalesce(array_to_string(list_filter([l008,a1,a2,d1,h1,j1], x -> x != ''), '|'), '') AS languages,
         |  (CASE WHEN k%5=0 THEN '0355-40' || lpad(cast(k%90 as varchar),2,'0') ELSE '' END) AS series_issn,
         |  (CASE WHEN k%4=1 THEN 'vol ' || cast(k%30 as varchar) ELSE '' END) AS series_numbering,
         |  (CASE WHEN k%3<2 THEN 'Vol. ' || cast(k%50 as varchar) || ', no. ' || cast(k%12 as varchar)
         |     || ', pages ' || cast(k%300+1 as varchar) || '-' || cast(k%300+20 as varchar)
         |   ELSE '' END) AS container_reference,
         |  (CASE WHEN k%2=0 THEN '(fast)fst' || cast(k%100000 as varchar) || '|' ELSE '' END)
         |    || 'http://id.loc.gov/authorities/subjects/sh' || cast(k as varchar) AS raw_topic_ids,
         |  (CASE WHEN k%3=0 THEN 'http://id.loc.gov/authorities/names/n' || cast(k as varchar) ELSE '' END) AS raw_geo_topic_ids
         |FROM c""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(titles, display, allfields, langSeries)
}
