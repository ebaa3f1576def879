package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** LIDO toSolrArray tail (reference: Record/Lido.php) — the getters beyond
  * the event model covered by [[LidoQueries]]:
  *
  *  - `lido_titles`: the titleWrap titleSet algorithm (getTitles:442) under
  *    the driver defaults (mergeTitleValues=true, mergeTitleSets=true,
  *    allowTitleToMatchFormat=false, defaultDisplayLanguage='en'): per-set
  *    per-language preferred/alternate partitioning with pref-attr
  *    defaulting, value merge ("; "), order-preserving set dedupe, the
  *    default-language→first-language→alternates preferred fallback chain,
  *    leftover-preferred unshift into the alternate map, and the
  *    work-type-equals-title description substitution (Lido.php:536 — note
  *    the faithful quirk that an empty work type matches an empty title).
  *  - `lido_solr_fields`: description:651 (blanked when it equals the
  *    title), object work type:678 (first non-empty term), legal body
  *    name:623 (repositorySet → recordSource fallback), record info
  *    ids:1258 (`(type)id`, untyped skipped), identifier:1462 (first
  *    non-empty workID), URLs/thumbnail:696 (first non-empty link),
  *    subject terms:844 (type-lowercased iconclass exclusion per
  *    getSubjectNodes:1161), subject places:917 (trailing-punctuation strip
  *    with '.' as an additional char, MetadataUtils.php:572), and
  *    collection:1448 via the related-work display object.
  *  - `lido_locations`: the geocoding location assembly (getLocations:236):
  *    any gml present vetoes the whole record; a place name with a resolved
  *    sublocation emits "name sub", without one it explodes on '/', and a
  *    display place splits on '[/;]'.
  *
  * All three are pure per-record column expressions over
  * `array<struct<...>>` inputs — zero shuffle; at 100 TB this is a
  * map-only, codegen'd stage that scales with input splits.
  */
object LidoQueries2 {

  private val BIG = 1000000

  /** Trailing-punctuation strip with additional chars '.'
    * (MetadataUtils.php:572 `stripTrailingPunctuation($str, '.')`): one
    * regex pass over the class ` /:;,=([.`; the abbreviation re-check can
    * never fire because the period itself is stripped.
    */
  private def stripTrailDot(c: Column): Column =
    regexp_replace(c, "[ /:;,=(\\[.]*$", "")
  private def stripTrailDotSql(x: String): String =
    s"regexp_replace($x, '[ /:;,=(\\[.]*$$', '')"

  // ---------------------------------------------------------------- titles

  /** An empty pref attribute defaults to 'preferred'
    * (Lido.php:466 `(string)$appellationValue['pref'] ?: 'preferred'`).
    */
  private def entryPred(x: Column, s: Int, lang: String, isPref: Boolean): Column = {
    val isPreferred = x.getField("pref") === "preferred" || x.getField("pref") === ""
    val prefOk = if (isPref) isPreferred else !isPreferred
    x.getField("set_id") === s && x.getField("lang") === lang && prefOk &&
      trim(x.getField("val")) =!= ""
  }

  private def entryPredSql(s: Int, lang: String, isPref: Boolean): String = {
    val p = "(x.pref = 'preferred' OR x.pref = '')"
    val prefOk = if (isPref) p else s"NOT $p"
    s"x.set_id = $s AND x.lang = '$lang' AND $prefOk AND trim(x.val) <> ''"
  }

  private def vals(ent: Column, s: Int, lang: String, isPref: Boolean): Column =
    transform(filter(ent, x => entryPred(x, s, lang, isPref)), x => trim(x.getField("val")))
  private def valsSql(s: Int, lang: String, isPref: Boolean): String =
    s"list_transform(list_filter(entries, x -> ${entryPredSql(s, lang, isPref)}), x -> trim(x.val))"

  private def minPos(ent: Column, s: Int, lang: String, isPref: Boolean): Column =
    array_min(transform(filter(ent, x => entryPred(x, s, lang, isPref)), x => x.getField("pos")))
  private def minPosSql(s: Int, lang: String, isPref: Boolean): String =
    s"list_min(list_transform(list_filter(entries, x -> ${entryPredSql(s, lang, isPref)}), x -> x.pos))"

  /** Set-level preferred string: mergeTitleValues appends the set's
    * alternate parts after the preferred ones (Lido.php:479).
    */
  private def pstr(ent: Column, s: Int, lang: String): Column = {
    val p = vals(ent, s, lang, isPref = true)
    val a = vals(ent, s, lang, isPref = false)
    when(size(p) > 0, array_join(concat(p, a), "; "))
  }
  private def pstrSql(s: Int, lang: String): String = {
    val p = valsSql(s, lang, isPref = true)
    val a = valsSql(s, lang, isPref = false)
    s"(CASE WHEN len($p) > 0 THEN array_to_string($p || $a, '; ') END)"
  }

  /** Set-level alternate string: only sets with no preferred part in this
    * language keep alternates (mergeTitleValues consumes them otherwise).
    */
  private def astr(ent: Column, s: Int, lang: String): Column = {
    val p = vals(ent, s, lang, isPref = true)
    val a = vals(ent, s, lang, isPref = false)
    when(size(p) === 0 && size(a) > 0, array_join(a, "; "))
  }
  private def astrSql(s: Int, lang: String): String = {
    val p = valsSql(s, lang, isPref = true)
    val a = valsSql(s, lang, isPref = false)
    s"(CASE WHEN len($p) = 0 AND len($a) > 0 THEN array_to_string($a, '; ') END)"
  }

  /** mergeTitleSets: order-preserving unique join of the two set strings
    * (Lido.php:492) — with two sets, explicit equality dedupe.
    */
  private def mergeSets(v1: Column, v2: Column): Column =
    when(v1.isNotNull && v2.isNotNull, when(v1 === v2, v1).otherwise(concat(v1, lit("; "), v2)))
      .when(v1.isNotNull, v1)
      .otherwise(v2)
  private def mergeSetsSql(v1: String, v2: String): String =
    s"""(CASE WHEN $v1 IS NOT NULL AND $v2 IS NOT NULL
       | THEN (CASE WHEN $v1 = $v2 THEN $v1 ELSE $v1 || '; ' || $v2 END)
       | WHEN $v1 IS NOT NULL THEN $v1 ELSE $v2 END)""".stripMargin.replace("\n", " ")

  /** Map-insertion rank of a language: the first (set, position) that
    * contributed an entry of this kind — PHP array key order re-expressed
    * as an ordinal.
    */
  private def langRank(str1: Column, mp1: Column, str2: Column, mp2: Column): Column =
    least(
      coalesce(when(str1.isNotNull, lit(100) + mp1), lit(BIG)),
      coalesce(when(str2.isNotNull, lit(200) + mp2), lit(BIG))
    )
  private def langRankSql(str1: String, mp1: String, str2: String, mp2: String): String =
    s"""least(coalesce(CASE WHEN $str1 IS NOT NULL THEN 100 + $mp1 END, $BIG),
       | coalesce(CASE WHEN $str2 IS NOT NULL THEN 200 + $mp2 END, $BIG))""".stripMargin
      .replace("\n", " ")

  val all: Seq[Q] = Seq(
    Q(
      "lido_titles",
      (s, d) => {
        val k = col("c_custkey")
        val m = k % 8
        val ks = k.cast("string")
        val base = concat(lit("Title "), ks)
        val altV = concat(lit("Alt "), ks)
        val en2 = concat(lit("Second "), ks)
        val paint = concat(lit("Painting "), ks)
        def e(set: Int, pos: Int, pref: String, lang: String, v: Column) =
          struct(
            lit(set).as("set_id"),
            lit(pos).as("pos"),
            lit(pref).as("pref"),
            lit(lang).as("lang"),
            v.as("val")
          )
        // m=0 exercises the empty-pref default ('' counts as preferred).
        val entries = when(m === 0, array(e(1, 1, "", "en", base), e(1, 2, "alternative", "en", altV)))
          .when(m === 1, array(e(1, 1, "preferred", "fi", base), e(1, 2, "alternative", "en", altV)))
          .when(m === 2, array(e(1, 1, "preferred", "fi", base), e(2, 3, "preferred", "fi", base)))
          .when(m === 3, array(e(1, 1, "preferred", "en", base), e(2, 3, "preferred", "en", en2)))
          .when(m === 4, array(e(1, 1, "alternative", "fi", altV)))
          .when(m === 5, array(e(1, 1, "preferred", "en", lit("  "))))
          .when(m === 6, array(e(1, 1, "preferred", "en", paint)))
          .otherwise(
            array(
              e(1, 1, "preferred", "fi", base),
              e(1, 2, "preferred", "en", en2),
              e(1, 3, "alternative", "fi", altV)
            )
          )
        val workType = when(m === 6, concat(lit("PAINTING "), ks))
          .when(m === 5, lit(""))
          .otherwise(lit("veistos"))
        val descs = array(
          struct(lit("provenance").as("typ"), concat(lit("Prov "), ks).as("val")),
          struct(lit("").as("typ"), concat(lit("Kuvaus "), ks).as("val")),
          struct(lit("").as("typ"), when(k % 2 === 0, lit("Lisa")).otherwise(lit("")).as("val"))
        )
        val base0 = Tables
          .customer(s, d)
          .select(
            concat(lit("lido"), ks).as("record_id"),
            entries.as("entries"),
            workType.as("work_type"),
            descs.as("descs")
          )
        val ent = col("entries")
        // Staged selects (mirroring the oracle's nested subqueries): each
        // level references the previous level's ALIASED columns, so the
        // plan stays linear. Building the whole algorithm as one nested
        // expression duplicated the entries CASE multiplicatively through
        // every level — a 50 MiB serialized plan for what is a per-row
        // scalar computation.
        val descJoin = array_join(
          transform(
            filter(col("descs"), x => x.getField("typ") =!= "provenance" && trim(x.getField("val")) =!= ""),
            x => trim(x.getField("val"))
          ),
          "; "
        )
        def lvl1Cols(lang: String) = Seq(
          pstr(ent, 1, lang).as(s"p1_$lang"),
          pstr(ent, 2, lang).as(s"p2_$lang"),
          astr(ent, 1, lang).as(s"a1_$lang"),
          astr(ent, 2, lang).as(s"a2_$lang"),
          minPos(ent, 1, lang, isPref = true).as(s"mpp1_$lang"),
          minPos(ent, 2, lang, isPref = true).as(s"mpp2_$lang"),
          minPos(ent, 1, lang, isPref = false).as(s"mpa1_$lang"),
          minPos(ent, 2, lang, isPref = false).as(s"mpa2_$lang")
        )
        val keep = Seq(col("record_id"), col("work_type"))
        val l1 = base0.select(
          keep ++ Seq(descJoin.as("descjoin")) ++ lvl1Cols("en") ++ lvl1Cols("fi"): _*
        )
        // Per-language merged strings + insertion ranks (mergeTitleSets).
        def lvl2Cols(lang: String) = Seq(
          mergeSets(col(s"p1_$lang"), col(s"p2_$lang")).as(s"p_$lang"),
          mergeSets(col(s"a1_$lang"), col(s"a2_$lang")).as(s"a_$lang"),
          langRank(col(s"p1_$lang"), col(s"mpp1_$lang"), col(s"p2_$lang"), col(s"mpp2_$lang"))
            .as(s"rp_$lang"),
          langRank(col(s"a1_$lang"), col(s"mpa1_$lang"), col(s"a2_$lang"), col(s"mpa2_$lang"))
            .as(s"ra_$lang")
        )
        val l2 = l1.select(
          keep ++ Seq(col("descjoin")) ++ lvl2Cols("en") ++ lvl2Cols("fi"): _*
        )
        // Preferred fallback chain: default lang 'en' preferred → other
        // preferred → default alternates → other alternates (Lido.php:505).
        val pEn = col("p_en"); val pFi = col("p_fi")
        val aEn = col("a_en"); val aFi = col("a_fi")
        val chosenAEn = pEn.isNull && pFi.isNull && aEn.isNotNull
        val chosenAFi = pEn.isNull && pFi.isNull && aEn.isNull && aFi.isNotNull
        // Leftover preferred strings (not consumed by the shift) are
        // unshifted into the alternate map (Lido.php:520). With 'en'
        // default, an existing P_en is always the chosen one, so only the
        // fi leftover can survive.
        val l3 = l2.select(
          keep ++ Seq(
            col("descjoin"),
            coalesce(pEn, pFi, aEn, aFi, lit("")).as("preferred0"),
            when(!chosenAEn, aEn).as("v_en"),
            coalesce(when(pEn.isNotNull, pFi), when(!chosenAFi, aFi)).as("v_fi"),
            when(aEn.isNotNull, col("ra_en")).otherwise(lit(BIG) + col("rp_en")).as("key_en"),
            when(aFi.isNotNull, col("ra_fi")).otherwise(lit(BIG) + col("rp_fi")).as("key_fi")
          ): _*
        )
        val vEn = col("v_en"); val vFi = col("v_fi")
        val altList = when(
          vEn.isNotNull && vFi.isNotNull,
          when(col("key_en") <= col("key_fi"), array(vEn, vFi)).otherwise(array(vFi, vEn))
        ).when(vEn.isNotNull, array(vEn))
          .when(vFi.isNotNull, array(vFi))
          .otherwise(lit(Array.empty[String]))
        val l4 = l3.select(
          keep ++ Seq(col("descjoin"), col("preferred0"), altList.as("altlist")): _*
        )
        val altUniq = when(
          size(col("altlist")) === 2 &&
            element_at(col("altlist"), 1) === element_at(col("altlist"), 2),
          slice(col("altlist"), 1, 1)
        ).otherwise(col("altlist"))
        val title = when(
          lower(col("work_type")) === lower(col("preferred0")) && col("descjoin") =!= "",
          col("descjoin")
        ).otherwise(col("preferred0"))
        l4.select(
          col("record_id"),
          title.as("title"),
          array_join(altUniq, "|").as("title_alt"),
          size(altUniq).cast("int").as("n_alt")
        )
      },
      Some {
        val m = "(c_custkey % 8)"
        val ks = "cast(c_custkey as varchar)"
        val base = s"'Title ' || $ks"
        val altV = s"'Alt ' || $ks"
        val en2 = s"'Second ' || $ks"
        val paint = s"'Painting ' || $ks"
        def e(set: Int, pos: Int, pref: String, lang: String, v: String) =
          s"struct_pack(set_id := $set, pos := $pos, pref := '$pref', lang := '$lang', val := $v)"
        val entries =
          s"""(CASE WHEN $m = 0 THEN [${e(1, 1, "", "en", base)}, ${e(1, 2, "alternative", "en", altV)}]
             | WHEN $m = 1 THEN [${e(1, 1, "preferred", "fi", base)}, ${e(1, 2, "alternative", "en", altV)}]
             | WHEN $m = 2 THEN [${e(1, 1, "preferred", "fi", base)}, ${e(2, 3, "preferred", "fi", base)}]
             | WHEN $m = 3 THEN [${e(1, 1, "preferred", "en", base)}, ${e(2, 3, "preferred", "en", en2)}]
             | WHEN $m = 4 THEN [${e(1, 1, "alternative", "fi", altV)}]
             | WHEN $m = 5 THEN [${e(1, 1, "preferred", "en", "'  '")}]
             | WHEN $m = 6 THEN [${e(1, 1, "preferred", "en", paint)}]
             | ELSE [${e(1, 1, "preferred", "fi", base)}, ${e(1, 2, "preferred", "en", en2)}, ${e(
              1,
              3,
              "alternative",
              "fi",
              altV
            )}] END)""".stripMargin.replace("\n", " ")
        val workType =
          s"(CASE WHEN $m = 6 THEN 'PAINTING ' || $ks WHEN $m = 5 THEN '' ELSE 'veistos' END)"
        val descs =
          s"""[struct_pack(typ := 'provenance', val := 'Prov ' || $ks),
             | struct_pack(typ := '', val := 'Kuvaus ' || $ks),
             | struct_pack(typ := '', val := (CASE WHEN c_custkey % 2 = 0 THEN 'Lisa' ELSE '' END))]"""
            .stripMargin.replace("\n", " ")
        def lvl1(lang: String) =
          s"""${pstrSql(1, lang)} AS p1_$lang, ${pstrSql(2, lang)} AS p2_$lang,
             | ${astrSql(1, lang)} AS a1_$lang, ${astrSql(2, lang)} AS a2_$lang,
             | ${minPosSql(1, lang, isPref = true)} AS mpp1_$lang, ${minPosSql(2, lang, isPref = true)} AS mpp2_$lang,
             | ${minPosSql(1, lang, isPref = false)} AS mpa1_$lang, ${minPosSql(2, lang, isPref = false)} AS mpa2_$lang"""
            .stripMargin.replace("\n", " ")
        def lvl2(lang: String) =
          s"""${mergeSetsSql(s"p1_$lang", s"p2_$lang")} AS p_$lang,
             | ${mergeSetsSql(s"a1_$lang", s"a2_$lang")} AS a_$lang,
             | ${langRankSql(s"p1_$lang", s"mpp1_$lang", s"p2_$lang", s"mpp2_$lang")} AS rp_$lang,
             | ${langRankSql(s"a1_$lang", s"mpa1_$lang", s"a2_$lang", s"mpa2_$lang")} AS ra_$lang"""
            .stripMargin.replace("\n", " ")
        s"""SELECT record_id, title, title_alt, cast(n_alt as int) AS n_alt FROM (
           |  SELECT record_id,
           |    (CASE WHEN lower(work_type) = lower(preferred0) AND descjoin <> '' THEN descjoin
           |          ELSE preferred0 END) AS title,
           |    coalesce(array_to_string(CASE WHEN len(altlist) = 2 AND altlist[1] = altlist[2]
           |                         THEN [altlist[1]] ELSE altlist END, '|'), '') AS title_alt,
           |    len(CASE WHEN len(altlist) = 2 AND altlist[1] = altlist[2]
           |             THEN [altlist[1]] ELSE altlist END) AS n_alt
           |  FROM (
           |    SELECT record_id, work_type, descjoin, preferred0,
           |      (CASE WHEN v_en IS NOT NULL AND v_fi IS NOT NULL
           |            THEN (CASE WHEN key_en <= key_fi THEN [v_en, v_fi] ELSE [v_fi, v_en] END)
           |            WHEN v_en IS NOT NULL THEN [v_en]
           |            WHEN v_fi IS NOT NULL THEN [v_fi]
           |            ELSE CAST([] AS VARCHAR[]) END) AS altlist
           |    FROM (
           |      SELECT record_id, work_type, descjoin,
           |        coalesce(p_en, p_fi, a_en, a_fi, '') AS preferred0,
           |        (CASE WHEN NOT (p_en IS NULL AND p_fi IS NULL AND a_en IS NOT NULL)
           |              THEN a_en END) AS v_en,
           |        coalesce(CASE WHEN p_en IS NOT NULL THEN p_fi END,
           |                 CASE WHEN NOT (p_en IS NULL AND p_fi IS NULL AND a_en IS NULL AND a_fi IS NOT NULL)
           |                      THEN a_fi END) AS v_fi,
           |        (CASE WHEN a_en IS NOT NULL THEN ra_en ELSE $BIG + rp_en END) AS key_en,
           |        (CASE WHEN a_fi IS NOT NULL THEN ra_fi ELSE $BIG + rp_fi END) AS key_fi
           |      FROM (
           |        SELECT record_id, work_type, descjoin, ${lvl2("en")}, ${lvl2("fi")}
           |        FROM (
           |          SELECT record_id, work_type, descjoin, ${lvl1("en")}, ${lvl1("fi")}
           |          FROM (
           |            SELECT 'lido' || $ks AS record_id,
           |              $entries AS entries,
           |              $workType AS work_type,
           |              array_to_string(list_transform(
           |                list_filter($descs, x -> x.typ <> 'provenance' AND trim(x.val) <> ''),
           |                x -> trim(x.val)), '; ') AS descjoin
           |            FROM customer) _b) _l1) _l2) _l3) _l4) _l5""".stripMargin
      }
    ),
    Q(
      "lido_solr_fields",
      (s, d) => {
        val k = col("c_custkey")
        val ks = k.cast("string")
        val d1 = concat(lit("Desc A "), ks)
        val d2 = when(k % 4 === 0, lit("")).otherwise(lit("Desc B"))
        val descs = array(d1, d2)
        val semi = array_join(descs, "; ")
        val title = when(k % 9 === 0, semi).otherwise(concat(lit("Obj "), ks))
        val workTypes = array(
          when(k % 5 === 0, lit("")).otherwise(lit("maalaus")),
          when(k % 15 === 0, lit("")).otherwise(lit("veistos"))
        )
        val repoNames = array(
          when(k % 3 === 0, lit("")).otherwise(concat(lit("Museo "), (k % 7).cast("string"))),
          lit("")
        )
        val sourceNames = array(
          when(k % 15 === 0, lit("")).otherwise(concat(lit("Lahde "), (k % 5).cast("string")))
        )
        val subjects = array(
          struct(lit("aihe").as("typ"), concat(lit("Taide "), (k % 20).cast("string")).as("term")),
          struct(
            when(k % 2 === 0, lit("iconclass")).otherwise(lit("Iconclass")).as("typ"),
            lit("49M32").as("term")
          ),
          struct(lit("").as("typ"), when(k % 4 === 0, lit(" ")).otherwise(lit("Historia")).as("term"))
        )
        val subjPlaces = array(
          lit("Helsinki."),
          when(k % 6 === 0, lit("")).otherwise(lit("Turku /")),
          lit(" . ")
        )
        val urls = array(
          when(k % 2 === 0, lit("")).otherwise(concat(lit("https://img.ex/"), ks)),
          concat(lit("https://img.ex/alt/"), ks)
        )
        val recInfo = array(
          struct(
            when(k % 2 === 0, lit("objectId")).otherwise(lit("")).as("typ"),
            concat(lit("RI"), ks).as("id")
          ),
          struct(lit("local").as("typ"), concat(lit("L"), (k % 10).cast("string")).as("id"))
        )
        val workIds = array(
          when(k % 7 === 0, lit("")).otherwise(concat(lit("W"), ks)),
          concat(lit("W2-"), ks)
        )
        val collectionRaw = when(k % 8 === 0, lit(""))
          .otherwise(concat(lit("  Kokoelma "), (k % 9).cast("string"), lit(" ")))
        def firstNonEmpty(arr: Column): Column =
          coalesce(get(filter(arr, x => x =!= ""), lit(0)), lit(""))
        Tables
          .customer(s, d)
          .select(
            concat(lit("lido"), ks).as("record_id"),
            title.as("title"),
            // getDescription:651 — blank when it equals the title.
            when(title === semi, lit("")).otherwise(trim(array_join(descs, " ")))
              .as("description"),
            firstNonEmpty(workTypes).as("format"),
            coalesce(
              get(filter(repoNames, x => x =!= ""), lit(0)),
              get(filter(sourceNames, x => x =!= ""), lit(0)),
              lit("")
            ).as("institution"),
            array_join(
              filter(
                transform(
                  filter(
                    subjects,
                    x => x.getField("typ") === "" || lower(x.getField("typ")) =!= "iconclass"
                  ),
                  x => trim(x.getField("term"))
                ),
                t => t =!= ""
              ),
              "|"
            ).as("topic"),
            array_join(
              filter(transform(subjPlaces, p => trim(stripTrailDot(p))), p => p =!= ""),
              "|"
            ).as("places"),
            firstNonEmpty(urls).as("thumbnail"),
            array_join(
              transform(
                filter(recInfo, r => r.getField("typ") =!= ""),
                r => concat(lit("("), r.getField("typ"), lit(")"), r.getField("id"))
              ),
              "|"
            ).as("ctrlnum"),
            firstNonEmpty(workIds).as("identifier"),
            trim(collectionRaw).as("collection")
          )
      },
      Some {
        val ks = "cast(c_custkey as varchar)"
        val d1 = s"'Desc A ' || $ks"
        val d2 = "(CASE WHEN c_custkey % 4 = 0 THEN '' ELSE 'Desc B' END)"
        val descs = s"[$d1, $d2]"
        val semi = s"array_to_string($descs, '; ')"
        val title = s"(CASE WHEN c_custkey % 9 = 0 THEN $semi ELSE 'Obj ' || $ks END)"
        val workTypes =
          "[(CASE WHEN c_custkey % 5 = 0 THEN '' ELSE 'maalaus' END), (CASE WHEN c_custkey % 15 = 0 THEN '' ELSE 'veistos' END)]"
        val repoNames =
          "[(CASE WHEN c_custkey % 3 = 0 THEN '' ELSE 'Museo ' || cast(c_custkey % 7 as varchar) END), '']"
        val sourceNames =
          "[(CASE WHEN c_custkey % 15 = 0 THEN '' ELSE 'Lahde ' || cast(c_custkey % 5 as varchar) END)]"
        val subjects =
          s"""[struct_pack(typ := 'aihe', term := 'Taide ' || cast(c_custkey % 20 as varchar)),
             | struct_pack(typ := (CASE WHEN c_custkey % 2 = 0 THEN 'iconclass' ELSE 'Iconclass' END), term := '49M32'),
             | struct_pack(typ := '', term := (CASE WHEN c_custkey % 4 = 0 THEN ' ' ELSE 'Historia' END))]"""
            .stripMargin.replace("\n", " ")
        val subjPlaces =
          "['Helsinki.', (CASE WHEN c_custkey % 6 = 0 THEN '' ELSE 'Turku /' END), ' . ']"
        val urls =
          s"[(CASE WHEN c_custkey % 2 = 0 THEN '' ELSE 'https://img.ex/' || $ks END), 'https://img.ex/alt/' || $ks]"
        val recInfo =
          s"""[struct_pack(typ := (CASE WHEN c_custkey % 2 = 0 THEN 'objectId' ELSE '' END), id := 'RI' || $ks),
             | struct_pack(typ := 'local', id := 'L' || cast(c_custkey % 10 as varchar))]"""
            .stripMargin.replace("\n", " ")
        val workIds =
          s"[(CASE WHEN c_custkey % 7 = 0 THEN '' ELSE 'W' || $ks END), 'W2-' || $ks]"
        val collectionRaw =
          "(CASE WHEN c_custkey % 8 = 0 THEN '' ELSE '  Kokoelma ' || cast(c_custkey % 9 as varchar) || ' ' END)"
        def firstNonEmpty(arr: String) =
          s"coalesce(list_filter($arr, x -> x <> '')[1], '')"
        s"""SELECT 'lido' || $ks AS record_id,
           |  $title AS title,
           |  (CASE WHEN $title = $semi THEN '' ELSE trim(array_to_string($descs, ' ')) END) AS description,
           |  ${firstNonEmpty(workTypes)} AS format,
           |  coalesce(list_filter($repoNames, x -> x <> '')[1],
           |           list_filter($sourceNames, x -> x <> '')[1], '') AS institution,
           |  array_to_string(list_filter(list_transform(
           |    list_filter($subjects, x -> x.typ = '' OR lower(x.typ) <> 'iconclass'),
           |    x -> trim(x.term)), t -> t <> ''), '|') AS topic,
           |  array_to_string(list_filter(list_transform($subjPlaces,
           |    p -> trim(${stripTrailDotSql("p")})), p -> p <> ''), '|') AS places,
           |  ${firstNonEmpty(urls)} AS thumbnail,
           |  array_to_string(list_transform(list_filter($recInfo, r -> r.typ <> ''),
           |    r -> '(' || r.typ || ')' || r.id), '|') AS ctrlnum,
           |  ${firstNonEmpty(workIds)} AS identifier,
           |  trim($collectionRaw) AS collection
           |FROM customer""".stripMargin
      }
    ),
    Q(
      "lido_locations",
      (s, d) => {
        val k = col("c_custkey")
        val p1 = struct(
          when(k % 11 === 0, lit("<gml:Point/>")).otherwise(lit("")).as("gml"),
          when(k % 3 === 0, lit("Helsinki/Uusimaa"))
            .when(k % 3 === 1, lit("Turku"))
            .otherwise(lit("")).as("name"),
          when(k % 3 === 1 && k % 4 === 0, lit("Linnankatu 1")).otherwise(lit("")).as("sub"),
          lit("").as("display")
        )
        val p2 = struct(
          lit("").as("gml"),
          lit("").as("name"),
          lit("").as("sub"),
          when(k % 5 === 0, lit("Espoo/Kauniainen; Vantaa"))
            .when(k % 5 === 1, lit(""))
            .otherwise(lit("Tampere.")).as("display")
        )
        val places = array(p1, p2)
        val locations = when(
          exists(places, p => p.getField("gml") =!= ""),
          lit(Array.empty[String])
        ).otherwise(
          flatten(
            transform(
              places,
              p =>
                when(
                  p.getField("name") =!= "",
                  when(
                    p.getField("sub") =!= "",
                    array(concat(p.getField("name"), lit(" "), p.getField("sub")))
                  ).otherwise(split(p.getField("name"), "/"))
                ).when(p.getField("display") =!= "", split(p.getField("display"), "[/;]"))
                  .otherwise(lit(Array.empty[String]))
            )
          )
        )
        Tables
          .customer(s, d)
          .select(
            concat(lit("lido"), k.cast("string")).as("record_id"),
            array_join(locations, "|").as("locations"),
            size(locations).cast("int").as("n_locations")
          )
      },
      Some {
        val p1 =
          s"""struct_pack(
             | gml := (CASE WHEN c_custkey % 11 = 0 THEN '<gml:Point/>' ELSE '' END),
             | name := (CASE WHEN c_custkey % 3 = 0 THEN 'Helsinki/Uusimaa'
             |               WHEN c_custkey % 3 = 1 THEN 'Turku' ELSE '' END),
             | sub := (CASE WHEN c_custkey % 3 = 1 AND c_custkey % 4 = 0 THEN 'Linnankatu 1' ELSE '' END),
             | display := '')""".stripMargin.replace("\n", " ")
        val p2 =
          s"""struct_pack(gml := '', name := '', sub := '',
             | display := (CASE WHEN c_custkey % 5 = 0 THEN 'Espoo/Kauniainen; Vantaa'
             |                  WHEN c_custkey % 5 = 1 THEN '' ELSE 'Tampere.' END))"""
            .stripMargin.replace("\n", " ")
        s"""SELECT record_id, coalesce(array_to_string(locations, '|'), '') AS locations,
           |  cast(len(locations) as int) AS n_locations FROM (
           |  SELECT 'lido' || cast(c_custkey as varchar) AS record_id,
           |    (CASE WHEN len(list_filter(places, p -> p.gml <> '')) > 0 THEN CAST([] AS VARCHAR[])
           |          ELSE flatten(list_transform(places, p ->
           |            CASE WHEN p.name <> '' THEN
           |                   (CASE WHEN p.sub <> '' THEN [p.name || ' ' || p.sub]
           |                         ELSE string_split(p.name, '/') END)
           |                 WHEN p.display <> '' THEN string_split_regex(p.display, '[/;]')
           |                 ELSE CAST([] AS VARCHAR[]) END)) END) AS locations
           |  FROM (SELECT c_custkey, [$p1, $p2] AS places FROM customer) _p) _l""".stripMargin
      }
    )
  )
}
