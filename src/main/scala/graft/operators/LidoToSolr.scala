package graft.operators

import graft.functions.{MetadataFunctions => MF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The COMPLETE `Record/Lido.php toSolrArray` (Lido.php:143) over the
  * flattened LIDO model ([[graft.sources.LidoXml]]), as one map-only
  * Column program. Field-by-field parity with the reference is asserted
  * on the reference's own lido1/lido2/lido3 fixtures (LidoTest.php) in
  * LidoFixtureSpec, including the title merge driver params and the
  * title-equals-work-type replacement.
  *
  * Getter map: getTitles:442 (per-set per-language preferred/alternate
  * merge, default-language selection, remaining-preferred push-down),
  * getDescription:651, getObjectWorkType:678, getLegalBodyName:623,
  * getActors:722 via getEventNodes:1101 (priority map + ksort on
  * "priority/index" string keys), getSubjectTerms:844,
  * getEventMaterials:952, getDisplayDates/Places:1418/1432,
  * getRecordInfoIDs:1258, getISBNs:355, getISSNs:379,
  * getRelatedWorkDisplayObject:806, getHierarchyFields:1488,
  * getAllFields:982.
  */
object LidoToSolr {

  private val E = lit("")
  private def emptyArr: Column = array().cast("array<string>")

  /** Driver params + the Lido driver's configurable event/relation
    * terminology (Lido.php:62-116 defaults).
    */
  final case class Params(
      mergeTitleValues: Boolean = true,
      mergeTitleSets: Boolean = true,
      allowTitleToMatchFormat: Boolean = false,
      defaultLanguage: String = "en",
      mainEvents: Seq[(String, Int)] = Seq("design" -> 0, "creation" -> 1),
      placeEvents: Seq[(String, Int)] = Seq("usage" -> 0),
      secondaryAuthorEvents: Seq[(String, Int)] = Seq.empty,
      relatedWorkRelationTypes: Seq[String] =
        Seq("Collection", "belongs to collection", "collection"),
      descriptionTypesExcludedFromTitle: Seq[String] = Seq("provenance")
  )

  /** stripTrailingPunctuation($str, '.') — one regex pass, the period in
    * the additional set (LidoQueries2's certified form).
    */
  private def stripTrailDot(c: Column): Column =
    regexp_replace(c, "[ /:;,=(\\[.]*$", "")

  // -------------------------------------------------------------- events

  /** getEventNodes with a priority map (Lido.php:1101): keep events whose
    * FIRST matching type term is in the map, key them "priority/index"
    * and ksort — string comparison, faithfully — returning event structs
    * in that order.
    */
  def eventsByPriority(events: Column, prio: Seq[(String, Int)]): Column = {
    val indexed = transform(events, (e, i) => struct(e.as("e"), (i + 1).as("i")))
    val withP = transform(
      indexed,
      x => {
        val perTerm = transform(
          x("e")("types"),
          t =>
            prio
              .foldLeft(when(lit(false), lit(0))) { case (acc, (name, p)) =>
                acc.when(t === name, p)
              }
              .otherwise(lit(null).cast("int"))
        )
        val p = get(filter(perTerm, v => v.isNotNull), lit(0))
        struct(x("e").as("e"), x("i").as("i"), p.as("p"))
      }
    )
    val kept = filter(withP, x => x("p").isNotNull)
    val sorted = array_sort(
      kept,
      (l, r) => {
        val kl = concat(l("p").cast("string"), lit("/"), l("i").cast("string"))
        val kr = concat(r("p").cast("string"), lit("/"), r("i").cast("string"))
        when(kl < kr, -1).when(kl > kr, 1).otherwise(0)
      }
    )
    transform(sorted, x => x("e"))
  }

  /** getActors over the given (already selected/sorted) events. */
  def actorNames(events: Column): Column =
    filter(
      flatten(transform(events, e => transform(e("actors"), a => trim(a("name"))))),
      v => v =!= ""
    )

  // -------------------------------------------------------------- titles

  /** getTitles (Lido.php:442): returns struct(preferred, alternate). */
  def titleData(rec: Column, p: Params): Column = {
    val dl = lit(p.defaultLanguage)
    def langOf(l: Column) = when(l === "", dl).otherwise(l)

    val perSet = transform(
      rec("titleSets"),
      s => {
        val prefLangs = transform(s("prefG"), g => langOf(g("lang")))
        val prefT = transform(
          s("prefG"),
          g => {
            val altParts = coalesce(
              get(
                transform(
                  filter(s("altG"), a => langOf(a("lang")) === langOf(g("lang"))),
                  a => a("parts")
                ),
                lit(0)
              ),
              emptyArr
            )
            val parts =
              if (p.mergeTitleValues) concat(g("parts"), altParts) else g("parts")
            struct(langOf(g("lang")).as("lang"), array_join(parts, "; ").as("t"))
          }
        )
        val altKept =
          if (p.mergeTitleValues)
            filter(s("altG"), a => !array_contains(prefLangs, langOf(a("lang"))))
          else s("altG")
        val altT = transform(
          altKept,
          a => struct(langOf(a("lang")).as("lang"), array_join(a("parts"), "; ").as("t"))
        )
        struct(prefT.as("p"), altT.as("a"))
      }
    )

    def accum(side: String): Column = {
      val entries = flatten(transform(perSet, s => s(side)))
      val langs = array_distinct(transform(entries, e => e("lang")))
      transform(
        langs,
        lang => {
          val l = transform(filter(entries, e => e("lang") === lang), e => e("t"))
          val titles =
            if (p.mergeTitleSets) array(array_join(array_distinct(l), "; "))
            else l
          struct(lang.as("lang"), titles.as("ts"))
        }
      )
    }

    MF.bindOnce(struct(accum("p").as("pp"), accum("a").as("aa"))) { b =>
      val prefPL = b("pp")
      val altPL = b("aa")
      def listFor(pl: Column, lang: Column) =
        coalesce(
          get(transform(filter(pl, g => g("lang") === lang), g => g("ts")), lit(0)),
          emptyArr
        )
      val usePref = size(prefPL) > 0
      val selPrefLang = when(size(listFor(prefPL, dl)) > 0, dl)
        .otherwise(get(transform(prefPL, g => g("lang")), lit(0)))
      val selAltLang = when(size(listFor(altPL, dl)) > 0, dl)
        .otherwise(get(transform(altPL, g => g("lang")), lit(0)))
      val preferred0 = when(usePref, get(listFor(prefPL, selPrefLang), lit(0)))
        .otherwise(coalesce(get(listFor(altPL, selAltLang), lit(0)), E))
      def dropFirst(ts: Column) = slice(ts, lit(2), greatest(size(ts) - 1, lit(0)))
      val prefShifted = transform(
        prefPL,
        g =>
          struct(
            g("lang").as("lang"),
            when(usePref && g("lang") === selPrefLang, dropFirst(g("ts")))
              .otherwise(g("ts"))
              .as("ts")
          )
      )
      val altShifted = transform(
        altPL,
        g =>
          struct(
            g("lang").as("lang"),
            when(!usePref && g("lang") === selAltLang, dropFirst(g("ts")))
              .otherwise(g("ts"))
              .as("ts")
          )
      )
      // Push remaining preferred titles into the alternates (unshift per
      // title → the surviving FRONT element per language is the last
      // remaining preferred title, else the original first alternate).
      def remFor(lang: Column) =
        coalesce(
          get(
            transform(filter(prefShifted, g => g("lang") === lang), g => g("ts")),
            lit(0)
          ),
          emptyArr
        )
      val altLangs = transform(altShifted, g => g("lang"))
      val fronts1 = transform(
        altShifted,
        g => {
          val rem = remFor(g("lang"))
          when(size(rem) > 0, try_element_at(rem, lit(-1)))
            .otherwise(get(g("ts"), lit(0)))
        }
      )
      val newLangs = filter(
        transform(filter(prefShifted, g => size(g("ts")) > 0), g => g("lang")),
        l => !array_contains(altLangs, l)
      )
      val fronts2 = transform(newLangs, l => try_element_at(remFor(l), lit(-1)))
      val alternate =
        array_distinct(filter(concat(fronts1, fronts2), v => v.isNotNull))
      struct(
        preferredTitle(rec, p, preferred0).as("preferred"),
        alternate.as("alternate")
      )
    }
  }

  /** The title-equals-work-type replacement — INSIDE getTitles
    * (Lido.php:529), so it also reaches work identification data.
    */
  private def preferredTitle(rec: Column, p: Params, preferredRaw: Column): Column =
    if (p.allowTitleToMatchFormat) preferredRaw
    else {
      val workType = coalesce(get(rec("workTypes"), lit(0)), E)
      val excluded = p.descriptionTypesExcludedFromTitle
      val repl = array_join(
        filter(
          flatten(
            transform(
              filter(
                rec("descriptions"),
                d => d("typ") === "" || !lower(d("typ")).isin(excluded: _*)
              ),
              d => d("values")
            )
          ),
          v => v =!= ""
        ),
        "; "
      )
      MF.bindOnce(preferredRaw) { pr =>
        when(lower(workType) === lower(pr) && repl =!= "", repl).otherwise(pr)
      }
    }

  // ------------------------------------------------------------ assembly

  def solrColumns(rec: Column, p: Params = Params()): Seq[(String, Column)] = {
    val td = titleData(rec, p)
    val title = td("preferred")

    val mainEvs = eventsByPriority(rec("events"), p.mainEvents)
    val authors = actorNames(mainEvs)
    val author2 =
      if (p.secondaryAuthorEvents.isEmpty) emptyArr
      else actorNames(eventsByPriority(rec("events"), p.secondaryAuthorEvents))

    val descAll = flatten(transform(rec("descriptions"), d => d("values")))
    val description = MF.bindOnce(title) { t =>
      when(t === array_join(descAll, "; "), E)
        .otherwise(trim(array_join(descAll, " ")))
    }

    val institution = coalesce(
      get(rec("repoLegalNames"), lit(0)),
      get(rec("sourceLegalNames"), lit(0)),
      E
    )

    // subjects — iconclass excluded by type (lowercased)
    val subjIncluded =
      filter(rec("subjects"), s => s("typ") === "" || lower(s("typ")) =!= "iconclass")
    val topics = flatten(transform(subjIncluded, s => s("terms")))

    val materials = MF.bindOnce(mainEvs) { evs =>
      val terms = flatten(transform(evs, e => e("matTerms")))
      val display = flatten(transform(evs, e => e("matDisplay")))
      when(size(terms) > 0, terms).otherwise(display)
    }

    val allSubjects = rec("subjects")
    val subjDates = filter(
      transform(
        flatten(transform(allSubjects, s => s("dispDates"))),
        d => trim(stripTrailDot(d))
      ),
      v => v =!= ""
    )
    val evDate = coalesce(
      get(
        filter(transform(mainEvs, e => trim(coalesce(get(e("displayDates"), lit(0)), E))), v => v =!= ""),
        lit(0)
      ),
      E
    )
    val era = when(size(subjDates) > 0, subjDates)
      .when(evDate =!= "", array(evDate))
      .otherwise(emptyArr)

    val placeEvs = eventsByPriority(rec("events"), p.placeEvents)
    val evPlaces = filter(
      transform(
        flatten(transform(placeEvs, e => e("displayPlaces"))),
        v => trim(stripTrailDot(v))
      ),
      v => v =!= ""
    )
    val subjDispPlaces = filter(
      transform(
        flatten(transform(allSubjects, s => s("dispPlaces"))),
        v => trim(stripTrailDot(v))
      ),
      v => v =!= ""
    )
    val subjPlaces = filter(
      transform(
        flatten(transform(allSubjects, s => s("places"))),
        v => trim(stripTrailDot(v))
      ),
      v => v =!= ""
    )
    val geographic = concat(evPlaces, subjDispPlaces)

    val relTypesLc = p.relatedWorkRelationTypes
    val collection = coalesce(
      get(
        filter(
          transform(
            filter(
              rec("relWorks"),
              w => trim(lower(w("relType"))).isin(relTypesLc: _*)
            ),
            w => w("displayObject")
          ),
          v => v =!= ""
        ),
        lit(0)
      ),
      E
    )

    val thumbnail = coalesce(get(rec("resourceLinks"), lit(0)), E)

    val ctrlnum = transform(
      filter(rec("recordInfoIds"), i => i("typ") =!= ""),
      i => concat(lit("("), i("typ"), lit(")"), i("v"))
    )

    val isbn = {
      val raw = transform(
        filter(rec("workIds"), w => w("typ") === "isbn"),
        w => regexp_extract(replace(trim(w("v")), lit("-"), E), "^([0-9]{9,12}[0-9xX])", 1)
      )
      array_distinct(
        filter(
          transform(filter(raw, v => v =!= ""), v => MF.normalizeIsbn(v)),
          v => v.isNotNull && v =!= ""
        )
      )
    }
    val issn =
      transform(filter(rec("workIds"), w => w("typ") === "issn"), w => w("v"))

    // hierarchy (getHierarchyFields:1488); last matching set wins
    val partOf = filter(
      rec("relWorks"),
      w =>
        trim(lower(w("relType"))) === "is part of" &&
          w("objId") =!= "" && w("displayObject") =!= ""
    )
    def lastOf(typ: String, fld: String): Column =
      coalesce(
        try_element_at(
          transform(filter(partOf, w => w("objType") === typ), w => w(fld)),
          lit(-1)
        ),
        E
      )
    val topId = lastOf("collection", "objId")
    val topTitle = lastOf("collection", "displayObject")
    val parentAll = filter(partOf, w => w("objType") === "parent")
    def lastParent(own: Boolean, fld: String): Column =
      coalesce(
        try_element_at(
          transform(
            filter(
              parentAll,
              w =>
                if (own) w("objId") === rec("id") else w("objId") =!= rec("id")
            ),
            w => w(fld)
          ),
          lit(-1)
        ),
        E
      )
    val parentId = lastParent(own = false, "objId")
    val parentTitle = lastParent(own = false, "displayObject")
    val isHierId0 = lastParent(own = true, "objId")
    val isHierTitle0 = lastParent(own = true, "displayObject")
    val isHierId =
      when(isHierId0 === "" && topId =!= "" && parentId === "", topId)
        .otherwise(isHierId0)
    val isHierTitle =
      when(isHierId0 === "" && topId =!= "" && parentId === "", topTitle)
        .otherwise(isHierTitle0)
    val identifier = coalesce(
      get(transform(rec("workIds"), w => w("v")), lit(0)),
      E
    )
    // hierarchy_sequence: digit runs zero-padded to 9 chars
    val sequence = when(
      parentId =!= "",
      array_join(
        transform(
          regexp_extract_all(identifier, lit("([0-9]+|[^0-9]+)"), lit(0)),
          tk => when(tk.rlike("^[0-9]+$"), lpad(tk, 9, "0")).otherwise(tk)
        ),
        ""
      )
    ).otherwise(E)
    val titleInHierarchy = MF.bindOnce(title) { t =>
      when(parentId =!= "", trim(concat(identifier, lit(" "), t))).otherwise(E)
    }

    val allfields = MF.bindOnce(
      struct(
        isHierTitle.as("iht"),
        parentTitle.as("pt"),
        topTitle.as("tt"),
        titleInHierarchy.as("tih")
      )
    ) { h =>
      concat(
        rec("allText"),
        filter(array(h("iht"), h("pt"), h("tt"), h("tih")), v => v =!= "")
      )
    }

    Seq(
      "record_format" -> lit("lido"),
      "title" -> title,
      "title_short" -> title,
      "title_full" -> title,
      "title_sort" -> MF.bindOnce(title)(t => MF.createSortTitle(t)),
      "title_alt" -> td("alternate"),
      "description" -> description,
      "format" -> coalesce(get(rec("workTypes"), lit(0)), E),
      "institution" -> institution,
      "author" -> authors,
      "author_sort" -> coalesce(get(authors, lit(0)), E),
      "author2" -> author2,
      "topic" -> topics,
      "topic_facet" -> topics,
      "material_str_mv" -> materials,
      "era" -> era,
      "era_facet" -> era,
      "geographic" -> geographic,
      "geographic_facet" -> concat(geographic, subjPlaces),
      "collection" -> collection,
      "thumbnail" -> thumbnail,
      "ctrlnum" -> ctrlnum,
      "isbn" -> isbn,
      "issn" -> issn,
      "hierarchy_top_id" -> topId,
      "hierarchy_top_title" -> topTitle,
      "hierarchy_parent_id" -> parentId,
      "hierarchy_parent_title" -> parentTitle,
      "is_hierarchy_id" -> isHierId,
      "is_hierarchy_title" -> isHierTitle,
      "hierarchy_sequence" -> sequence,
      "title_in_hierarchy" -> titleInHierarchy,
      "allfields" -> allfields
    )
  }

  /** getWorkIdentificationData (Lido.php:330): preferred + alternate
    * titles, main-event actors, no alternate script.
    */
  def workIdColumns(rec: Column, p: Params = Params()): Seq[(String, Column)] = {
    val td = titleData(rec, p)
    val titles = MF.bindOnce(td) { t =>
      concat(
        filter(array(t("preferred")), v => v =!= ""),
        t("alternate")
      )
    }
    Seq(
      "wk_titles" -> titles,
      "wk_authors" -> actorNames(eventsByPriority(rec("events"), p.mainEvents))
    )
  }
}
