package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The remaining MARC `toSolrArray` getters (reference: Record/Marc.php).
  *
  *   - getWorkIdentificationData:1173 — work keys for VuFind work
  *     grouping: authors from 100/110/111/700/710/711 ($a$b or $a$c),
  *     titles from 130/730 (uniform, ind1 non-filing), 240/245/246/247
  *     (title; ind2 non-filing except 246), each emitted in its
  *     non-filing-stripped form plus the original when they differ;
  *     alternate-script twins via 880 links; 7xx fields with ind2=2 become
  *     separate *analytical* work entries (title from $t$n$p$m$r, author
  *     from the field's own $a$b); no titles at all → no work data.
  *   - getBuilding:1585 — 852$b (+ optional sub-location subfield)
  *     locations.
  *   - getDOIs:1773 — 024 entries whose $2 is "doi" plus DOIs extracted
  *     from 856$u via the urn:doi:/doi.org/dx.doi.org URL forms (query /
  *     fragment cut off).
  *   - getOclcNumbers:2489 — 035$a values gated on the (ocolc)/ocm/ocn/on
  *     prefixes, then the first of four digit-extraction patterns with
  *     leading zeros dropped.
  *   - getPublisherNumbers:1536 — 028 $a (id) + $b (source).
  *   - getMusicIds:1501 — only for leader/06 = j: 024 with ind1 in
  *     {0,1,2,3,7} typed isrc/upc/ismn/ian or $2 for ind1=7.
  *   - getAltTitles:1670 — unique list of the 880-linked 245$ab plus
  *     130/240/246/730/740 title variants.
  *   - getIllustrated:1697 — leader/06 a|t with an 008/18-21 (or 006/1-4)
  *     illustration code a-m,o,p, or any 300$b containing "ill."/"illus.",
  *     → "Illustrated", else "Not Illustrated".
  *
  * The record content is synthesized deterministically from `p_partkey`
  * so every branch is exercised; the getter logic itself is the real
  * column program under oracle test.
  */
object MarcSolrQueries {

  private val workKeys = Q(
    "marc_work_keys",
    (s, d) => {
      val k = col("p_partkey")
      val e = lit("")

      // 100 $a (+$b) main author, optionally 880-linked alt-script twin.
      val a100 = when(k % 3 =!= 2, concat(lit("Author "), (k % 50).cast("string"))).otherwise(e)
      val b100 = when(k % 2 === 0, lit("Jr.")).otherwise(e)
      val author100 = when(a100 === "", e)
        .when(b100 === "", a100)
        .otherwise(concat(a100, lit(" "), b100))
      // 700 with ind2 != 2: a regular secondary author.
      val author700 =
        when(k % 7 === 0, concat(lit("Second Author "), (k % 20).cast("string"))).otherwise(e)
      val altAuthor = when(k % 10 === 0 && a100 =!= "", concat(lit("Alt100 "), (k % 15).cast("string")))
        .otherwise(e)

      // 130 uniform title (ind1 non-filing = 0 here).
      val t130 = when(k % 6 === 0, concat(lit("Uniform title "), (k % 25).cast("string"))).otherwise(e)
      // 245 $a [$b], ind2 non-filing 4 for "The " rows.
      val has245 = k % 11 =!= 0
      val a245 = concat(
        when(k % 4 === 0, lit("The ")).otherwise(e),
        lit("Title "),
        (k % 100).cast("string")
      )
      val b245 = when(k % 2 === 1, concat(lit("Subtitle "), (k % 10).cast("string"))).otherwise(e)
      val nonfiling = when(k % 4 === 0, lit(4)).otherwise(lit(0))
      val full245 = when(b245 === "", a245).otherwise(concat(a245, lit(" "), b245))
      val stripped245 =
        when(nonfiling > 0, full245.substr(nonfiling + 1, length(full245))).otherwise(full245)
      // 246 variant title (no non-filing indicator).
      val t246 = when(k % 8 === 0, concat(lit("Variant title "), (k % 35).cast("string"))).otherwise(e)
      // 880 linked to 245: alternate-script title.
      val alt245 =
        when((k % 9 === 0) && has245, concat(lit("Alt245 "), (k % 45).cast("string"))).otherwise(e)

      // 700 ind2=2 analytical entry: title $t, author $a.
      val anaTitle =
        when(k % 5 === 0, concat(lit("Analytical title "), (k % 40).cast("string"))).otherwise(e)
      val anaAuthor =
        when(k % 5 === 0, concat(lit("Ana Author "), (k % 30).cast("string"))).otherwise(e)

      // Title-field iteration order (130, 730, 240, 245, 246, 247): the
      // stripped form first, then the original when non-filing changed it.
      val titlesArr = filter(
        array(
          when(t130 =!= "", concat(lit("uniform="), t130)).otherwise(e),
          when(has245, concat(lit("title="), stripped245)).otherwise(e),
          when(has245 && stripped245 =!= full245, concat(lit("title="), full245)).otherwise(e),
          when(t246 =!= "", concat(lit("title="), t246)).otherwise(e)
        ),
        x => x =!= ""
      )
      // Reference returns [] when no titles were collected — analytical
      // entries included.
      val hasWork = size(titlesArr) > 0
      val authorsArr = filter(array(author100, author700), x => x =!= "")
      val analytical = when(anaTitle === "", e).otherwise(concat(anaAuthor, lit("~"), anaTitle))

      Tables
        .part(s, d)
        .select(
          concat(lit("w"), k.cast("string")).as("record_id"),
          hasWork.as("has_work"),
          when(hasWork, array_join(authorsArr, "|")).otherwise(e).as("authors"),
          when(hasWork, altAuthor).otherwise(e).as("authors_alt"),
          when(hasWork, array_join(titlesArr, "|")).otherwise(e).as("titles"),
          when(hasWork, when(alt245 === "", e).otherwise(concat(lit("title="), alt245)))
            .otherwise(e)
            .as("titles_alt"),
          when(hasWork, analytical).otherwise(e).as("analytical_works")
        )
    },
    Some {
      s"""WITH b AS (
         |  SELECT p_partkey AS k,
         |    (CASE WHEN p_partkey % 3 != 2 THEN 'Author ' || cast(p_partkey % 50 as varchar)
         |       || (CASE WHEN p_partkey % 2 = 0 THEN ' Jr.' ELSE '' END) ELSE '' END) AS author100,
         |    (CASE WHEN p_partkey % 7 = 0 THEN 'Second Author ' || cast(p_partkey % 20 as varchar) ELSE '' END) AS author700,
         |    (CASE WHEN p_partkey % 10 = 0 AND p_partkey % 3 != 2
         |       THEN 'Alt100 ' || cast(p_partkey % 15 as varchar) ELSE '' END) AS alt_author,
         |    (CASE WHEN p_partkey % 6 = 0 THEN 'uniform=Uniform title ' || cast(p_partkey % 25 as varchar) ELSE '' END) AS t130,
         |    (p_partkey % 11 != 0) AS has245,
         |    (CASE WHEN p_partkey % 4 = 0 THEN 'The ' ELSE '' END) || 'Title ' || cast(p_partkey % 100 as varchar)
         |      || (CASE WHEN p_partkey % 2 = 1 THEN ' Subtitle ' || cast(p_partkey % 10 as varchar) ELSE '' END) AS full245,
         |    (p_partkey % 4 = 0) AS nf,
         |    (CASE WHEN p_partkey % 8 = 0 THEN 'title=Variant title ' || cast(p_partkey % 35 as varchar) ELSE '' END) AS t246,
         |    (CASE WHEN p_partkey % 9 = 0 AND p_partkey % 11 != 0
         |       THEN 'title=Alt245 ' || cast(p_partkey % 45 as varchar) ELSE '' END) AS alt245,
         |    (CASE WHEN p_partkey % 5 = 0 THEN 'Ana Author ' || cast(p_partkey % 30 as varchar)
         |       || '~Analytical title ' || cast(p_partkey % 40 as varchar) ELSE '' END) AS ana
         |  FROM part),
         |c AS (
         |  SELECT *,
         |    (CASE WHEN nf THEN substr(full245, 5) ELSE full245 END) AS strip245,
         |    (t130 != '' OR has245 OR t246 != '') AS has_work
         |  FROM b)
         |SELECT 'w' || cast(k as varchar) AS record_id,
         |  has_work,
         |  (CASE WHEN has_work THEN coalesce(array_to_string(list_filter([author100, author700], x -> x != ''), '|'), '') ELSE '' END) AS authors,
         |  (CASE WHEN has_work THEN alt_author ELSE '' END) AS authors_alt,
         |  (CASE WHEN has_work THEN coalesce(array_to_string(list_filter([
         |      t130,
         |      (CASE WHEN has245 THEN 'title=' || strip245 ELSE '' END),
         |      (CASE WHEN has245 AND nf THEN 'title=' || full245 ELSE '' END),
         |      t246], x -> x != ''), '|'), '') ELSE '' END) AS titles,
         |  (CASE WHEN has_work THEN alt245 ELSE '' END) AS titles_alt,
         |  (CASE WHEN has_work THEN ana ELSE '' END) AS analytical_works
         |FROM c""".stripMargin
    }
  )

  private val solrFields = Q(
    "marc_solr_fields",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val e = lit("")

      // getBuilding: 852$b (+ sub-location), possibly several 852s.
      val loc852 = when(k % 3 === 0, concat(lit("LOC"), (k % 7).cast("string"))).otherwise(e)
      val sub852 = when(k % 6 === 0, concat(lit("S"), (k % 4).cast("string"))).otherwise(e)
      val b1 = when(loc852 === "", e)
        .when(sub852 === "", loc852)
        .otherwise(concat(loc852, lit("/"), sub852))
      val b2 = when(k % 12 === 0, lit("ANNEX")).otherwise(e)
      val building = array_join(filter(array(b1, b2), x => x =!= ""), "|")

      // getDOIs: 024 $2=doi entries plus 856$u URL forms.
      val doi024 = when(k % 4 === 1, concat(lit("10.1234/x"), ks)).otherwise(e)
      val u856 = when(k % 10 === 0, concat(lit("https://doi.org/10.5678/y"), ks, lit("?utm=z")))
        .otherwise(concat(lit("https://example.com/p"), ks))
      val doiUrl =
        regexp_extract(u856, "(urn:doi:|https?://doi\\.org/|https?://dx\\.doi\\.org/)([^?#]+)", 2)
      val dois = array_join(filter(array(doi024, doiUrl), x => x =!= ""), "|")

      // getOclcNumbers: prefix gate + first-matching digit pattern.
      val n035 = (k % 9000 + 1).cast("string")
      val f035a = when(k % 4 === 0, concat(lit("(OCoLC)00"), n035))
        .when(k % 4 === 1, concat(lit("ocm0"), n035, lit(" 456")))
        .when(k % 4 === 2, concat(lit("ocn"), n035, lit("x")))
        .otherwise(concat(lit("local"), ks))
      val oclcGate = Seq("(ocolc)", "ocm", "ocn", "on")
        .map(p => lower(f035a).startsWith(p))
        .reduce(_ || _)
      def firstMatch(re: String): Column = {
        val x = regexp_extract(f035a, re, 1)
        when(x =!= "", x)
      }
      val oclcNum = coalesce(
        firstMatch("\\([Oo][Cc][Oo][Ll][Cc]\\)[^0-9]*0*([0-9]+)"),
        firstMatch("ocm0*([0-9]+) *[0-9]*"),
        firstMatch("ocn0*([0-9]+).*"),
        firstMatch("on0*([0-9]+).*"),
        e
      )
      val oclc = when(oclcGate, oclcNum).otherwise(e)

      // getPublisherNumbers: 028 $a + $b.
      val a028 = when(k % 5 =!= 4, concat(lit("PN"), (k % 100).cast("string"))).otherwise(e)
      val b028 = concat(lit("Pub"), (k % 10).cast("string"))
      val publisherNumbers = when(a028 === "", e).otherwise(concat(a028, lit("~"), b028))

      // getMusicIds: leader/06 must be 'j'; 024 ind1 selects the type.
      val leader6 = element_at(array(lit("a"), lit("j"), lit("t"), lit("m")), (k % 4 + 1).cast("int"))
      val ind1 = element_at(
        array(lit("0"), lit("1"), lit("2"), lit("3"), lit("7"), lit("5")),
        (k % 6 + 1).cast("int")
      )
      val a024m = concat(lit("MID"), (k % 500).cast("string"))
      val typ024 = when(ind1 === "0", lit("isrc"))
        .when(ind1 === "1", lit("upc"))
        .when(ind1 === "2", lit("ismn"))
        .when(ind1 === "3", lit("ian"))
        .when(ind1 === "7", lit("mbid")) // ind1=7 falls back to $2
        .otherwise(e)
      val musicIds = when(leader6 === "j" && ind1.isin("0", "1", "2", "3", "7"),
        concat(a024m, lit("~"), typ024)
      ).otherwise(e)

      // getAltTitles: unique 880-245$ab + 130/240/246/730/740 variants.
      val altT245 = when(k % 9 === 0, concat(lit("Alt245 "), (k % 45).cast("string"))).otherwise(e)
      val t130 = when(k % 6 === 0, concat(lit("Uniform title "), (k % 25).cast("string"))).otherwise(e)
      val t240 = when(k % 7 === 0, concat(lit("240 val "), (k % 5).cast("string"))).otherwise(e)
      val t246 = when(k % 8 === 0, concat(lit("Variant title "), (k % 35).cast("string"))).otherwise(e)
      val t740 = when(k % 10 === 0,
        // Sometimes equals the 130 value so uniqueness is exercised.
        when(k % 30 === 0, concat(lit("Uniform title "), (k % 25).cast("string")))
          .otherwise(concat(lit("Related title "), (k % 12).cast("string")))
      ).otherwise(e)
      val altTitles =
        array_join(array_distinct(filter(array(altT245, t130, t240, t246, t740), x => x =!= "")), "|")

      // getIllustrated: leader a|t + 008/18-21 code, or 300$b strings.
      val block008 = when(k % 3 === 0, lit("a   ")).otherwise(lit("||||"))
      val b300 = when(k % 5 === 0, lit("col. ill., maps")).otherwise(lit("maps only"))
      val ill008 = block008.rlike("[a-mop]")
      val ill300 = b300.contains("ill.") || b300.contains("illus.")
      val illustrated = when((leader6.isin("a", "t") && ill008) || ill300, lit("Illustrated"))
        .otherwise(lit("Not Illustrated"))

      Tables
        .part(s, d)
        .select(
          concat(lit("s"), ks).as("record_id"),
          building.as("building"),
          dois.as("dois"),
          oclc.as("oclc_numbers"),
          publisherNumbers.as("publisher_numbers"),
          musicIds.as("music_ids"),
          altTitles.as("alt_titles"),
          illustrated.as("illustrated")
        )
    },
    Some {
      s"""SELECT 's' || cast(p_partkey as varchar) AS record_id,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN p_partkey % 3 = 0 THEN 'LOC' || cast(p_partkey % 7 as varchar)
         |       || (CASE WHEN p_partkey % 6 = 0 THEN '/S' || cast(p_partkey % 4 as varchar) ELSE '' END) ELSE '' END),
         |    (CASE WHEN p_partkey % 12 = 0 THEN 'ANNEX' ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS building,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN p_partkey % 4 = 1 THEN '10.1234/x' || cast(p_partkey as varchar) ELSE '' END),
         |    (CASE WHEN p_partkey % 10 = 0 THEN '10.5678/y' || cast(p_partkey as varchar) ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS dois,
         |  (CASE WHEN p_partkey % 4 = 3 THEN '' ELSE cast(p_partkey % 9000 + 1 as varchar) END) AS oclc_numbers,
         |  (CASE WHEN p_partkey % 5 != 4 THEN 'PN' || cast(p_partkey % 100 as varchar)
         |     || '~Pub' || cast(p_partkey % 10 as varchar) ELSE '' END) AS publisher_numbers,
         |  (CASE WHEN p_partkey % 4 = 1 AND p_partkey % 6 != 5 THEN 'MID' || cast(p_partkey % 500 as varchar) || '~'
         |     || (CASE p_partkey % 6 WHEN 0 THEN 'isrc' WHEN 1 THEN 'upc' WHEN 2 THEN 'ismn'
         |         WHEN 3 THEN 'ian' ELSE 'mbid' END)
         |   ELSE '' END) AS music_ids,
         |  coalesce(array_to_string(list_filter([
         |    (CASE WHEN p_partkey % 9 = 0 THEN 'Alt245 ' || cast(p_partkey % 45 as varchar) ELSE '' END),
         |    (CASE WHEN p_partkey % 6 = 0 THEN 'Uniform title ' || cast(p_partkey % 25 as varchar) ELSE '' END),
         |    (CASE WHEN p_partkey % 7 = 0 THEN '240 val ' || cast(p_partkey % 5 as varchar) ELSE '' END),
         |    (CASE WHEN p_partkey % 8 = 0 THEN 'Variant title ' || cast(p_partkey % 35 as varchar) ELSE '' END),
         |    (CASE WHEN p_partkey % 10 = 0 AND p_partkey % 30 != 0
         |       THEN 'Related title ' || cast(p_partkey % 12 as varchar) ELSE '' END)
         |  ], x -> x != ''), '|'), '') AS alt_titles,
         |  (CASE WHEN (p_partkey % 4 IN (0, 2) AND p_partkey % 3 = 0) OR p_partkey % 5 = 0
         |     THEN 'Illustrated' ELSE 'Not Illustrated' END) AS illustrated
         |FROM part""".stripMargin
    }
  )

  /** MARC 034 geographic locations (reference: Record/Marc.php:2422
    * getGeographicLocations): subfields d/e/f/g (west/east/north/south)
    * through coordinateToDecimal; invalid or out-of-range coordinates are
    * discarded; east+south present and distinct → an ENVELOPE with the
    * reference's weird-order swap (emitting min/max as
    * ENVELOPE(minX, maxX, maxY, minY), the Solr order), else a POINT.
    */
  private val geoLocations = Q(
    "marc_geo_locations",
    (s, d) => {
      import graft.functions.MetadataFunctions.coordinateToDecimal
      val k = col("p_partkey")
      val lonS = (k % 170).cast("string")
      val latS = (k % 80).cast("string")
      val b = k % 6
      val d034 = when(b === 3, lit(""))
        .when(b === 4, lit("W190.5")) // west out of range -> discarded
        .otherwise(concat(lit("W"), lonS, lit(".5")))
      val e034 = when(b === 0, concat(lit("E"), lonS, lit(".25")))
        .when(b === 2, concat(lit("W"), lonS, lit(".5"))) // east == west -> point
        .when(b === 5, lit("E185.5")) // east out of range -> discarded
        .otherwise(lit(""))
      val f034 = when(b === 3, lit("")).otherwise(concat(lit("N"), latS, lit(".5")))
      val g034 = when(b === 0, concat(lit("S"), latS, lit(".25")))
        .when(b === 2, concat(lit("N"), latS, lit(".5")))
        .when(b === 5, lit("S10.25"))
        .otherwise(lit(""))

      val w = coordinateToDecimal(d034)
      val e = coordinateToDecimal(e034)
      val n = coordinateToDecimal(f034)
      val so = coordinateToDecimal(g034)

      val wnValid = !isnan(w) && !isnan(n)
      val wnRange = w >= -180 && w <= 180 && n >= -90 && n <= 90
      val esPresent = !isnan(e) && !isnan(so) && (e =!= w || n =!= so)
      val esRange = e >= -180 && e <= 180 && so >= -90 && so <= 90
      // "Cope with weird coordinate order": the reference swaps so the
      // emitted 3rd/4th slots are max/min latitude (Solr's maxY, minY).
      val loc = when(!wnValid || !wnRange, lit(""))
        .when(esPresent && !esRange, lit(""))
        .when(
          esPresent,
          concat(
            lit("ENVELOPE("), least(w, e).cast("string"),
            lit(", "), greatest(w, e).cast("string"),
            lit(", "), greatest(n, so).cast("string"),
            lit(", "), least(n, so).cast("string"), lit(")")
          )
        )
        .otherwise(concat(lit("POINT("), w.cast("string"), lit(" "), n.cast("string"), lit(")")))

      Tables.part(s, d).select(k.as("p_partkey"), loc.as("location"))
    },
    Some {
      val lon = "cast(p_partkey % 170 as varchar)"
      val lat = "cast(p_partkey % 80 as varchar)"
      s"""SELECT p_partkey,
         |  (CASE p_partkey % 6
         |     WHEN 0 THEN 'ENVELOPE(-' || $lon || '.5, ' || $lon || '.25, ' || $lat || '.5, -' || $lat || '.25)'
         |     WHEN 1 THEN 'POINT(-' || $lon || '.5 ' || $lat || '.5)'
         |     WHEN 2 THEN 'POINT(-' || $lon || '.5 ' || $lat || '.5)'
         |     ELSE '' END) AS location
         |FROM part""".stripMargin
    }
  )

  /** Processing-warnings collection (reference: AbstractRecord.php:581
    * storeWarning + the Marc.php call sites): each 020 $a that fails ISBN
    * normalization stores "Invalid ISBN '<original>'" (Marc.php:477,
    * :1006 — empty subfields are skipped silently), and 034 coordinate
    * assembly stores 'invalid coordinates in 034' when the west/north
    * pair parses but is out of range, or when a distinct east/south pair
    * parses out of range (Marc.php:2443, :2463; an unparseable pair is
    * skipped silently). Warnings ride along in toSolrArray order — the
    * ingest diagnostics a pipeline surfaces per record. Map-only, inside
    * the scan's codegen stage; the oracle recomputes the expected
    * warnings in closed form from the generator branches.
    */
  private val warnings = Q(
    "records_warnings",
    (s, d) => {
      import graft.functions.MetadataFunctions.{coordinateToDecimal, normalizeIsbn}
      val k = col("p_partkey")
      val isbnBase = lpad((k * 7919 % 1000000000).cast("string"), 9, "0")
      val isbn1 = when(k % 5 === 0, lit("12345"))
        .otherwise(concat(isbnBase, graft.functions.MetadataFunctions.isbn10CheckChar(isbnBase)))
      val isbn2 = when(k % 4 === 0, lit("0-123-45678-Z")).otherwise(lit(""))

      val b = k % 6
      val lonS = (k % 170).cast("string")
      val latS = (k % 80).cast("string")
      val d034 = when(b === 3, lit(""))
        .when(b === 4, lit("W190.5"))
        .otherwise(concat(lit("W"), lonS, lit(".5")))
      val e034 = when(b === 0, concat(lit("E"), lonS, lit(".25")))
        .when(b === 2, concat(lit("W"), lonS, lit(".5")))
        .when(b === 5, lit("E185.5"))
        .otherwise(lit(""))
      val f034 = when(b === 3, lit("")).otherwise(concat(lit("N"), latS, lit(".5")))
      val g034 = when(b === 0, concat(lit("S"), latS, lit(".25")))
        .when(b === 2, concat(lit("N"), latS, lit(".5")))
        .when(b === 5, lit("S10.25"))
        .otherwise(lit(""))
      def isbnWarning(original: Column): Column =
        when(
          original =!= "" && normalizeIsbn(original) === "",
          concat(lit("Invalid ISBN '"), original, lit("'"))
        ).otherwise(lit(""))

      // Staged selects: normalizeIsbn (checksum chain) and
      // coordinateToDecimal re-reference their operands heavily, so they
      // run over aliased attributes — the single-select form inlined
      // ~67k expression nodes (PlanSpec's plan-size guard caught it).
      val l1 = Tables
        .part(s, d)
        .select(
          k.as("record_id"),
          isbn1.as("isbn1"),
          isbn2.as("isbn2"),
          coordinateToDecimal(d034).as("w"),
          coordinateToDecimal(e034).as("e"),
          coordinateToDecimal(f034).as("n"),
          coordinateToDecimal(g034).as("so")
        )
      val (w, e, n, so) = (col("w"), col("e"), col("n"), col("so"))
      val wnValid = !isnan(w) && !isnan(n)
      val wnRange = w >= -180 && w <= 180 && n >= -90 && n <= 90
      val esPresent = !isnan(e) && !isnan(so) && (e =!= w || n =!= so)
      val esRange = e >= -180 && e <= 180 && so >= -90 && so <= 90
      val badCoords = (wnValid && !wnRange) ||
        (wnValid && wnRange && esPresent && !esRange)
      // array_distinct mirrors AbstractRecord::storeWarning's in_array
      // dedupe: identical warnings (e.g. two 020s carrying the same
      // invalid ISBN) are stored once.
      val l2 = l1.select(
        col("record_id"),
        array_distinct(
          filter(
            array(
              isbnWarning(col("isbn1")),
              isbnWarning(col("isbn2")),
              when(badCoords, lit("invalid coordinates in 034")).otherwise(lit(""))
            ),
            v => v =!= ""
          )
        ).as("warnings_arr")
      )
      l2.select(
        col("record_id"),
        array_join(col("warnings_arr"), "|").as("warnings"),
        size(col("warnings_arr")).cast("long").as("n_warnings")
      )
    },
    Some {
      s"""WITH t AS (SELECT p_partkey AS k,
         |  (CASE WHEN p_partkey % 5 = 0 THEN 'Invalid ISBN ''12345''' ELSE '' END) AS w1,
         |  (CASE WHEN p_partkey % 4 = 0 THEN 'Invalid ISBN ''0-123-45678-Z''' ELSE '' END) AS w2,
         |  (CASE WHEN p_partkey % 6 IN (4, 5) THEN 'invalid coordinates in 034' ELSE '' END) AS w3
         |  FROM part),
         |j AS (SELECT k, list_filter([w1, w2, w3], x -> x != '') AS ws FROM t)
         |-- no list_distinct here: DuckDB's reorders elements, and the
         |-- generator never emits duplicate warnings, so the Spark-side
         |-- order-preserving array_distinct is a no-op on this corpus
         |SELECT k AS record_id, coalesce(array_to_string(ws, '|'), '') AS warnings,
         |  cast(len(ws) as bigint) AS n_warnings
         |FROM j""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(workKeys, solrFields, geoLocations, warnings)
}
