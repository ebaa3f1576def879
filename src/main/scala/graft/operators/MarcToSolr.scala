package graft.operators

import graft.functions.{CallNumbers, MarcFormat, MetadataFunctions => MF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The COMPLETE `Record/Marc.php toSolrArray` (reference: Marc.php:267)
  * as one map-only columnar projection over the full-fidelity MARC model
  * ([[graft.sources.MarcXmlFull]]: leader + grouped data fields with
  * indicators + ordered subfields). Every getter is a higher-order
  * function over the nested arrays — the whole record-to-Solr transform
  * is a single stage with zero shuffles, so at corpus scale it
  * pipelines with the parquet scan exactly like the narrower extraction
  * operators.
  *
  * Field-by-field parity with the reference is asserted on the
  * reference's own test fixtures (marc1/marc2/marc_geo/marc_dewey.xml,
  * MarcTest.php expected tables) in MarcFixtureSpec.
  *
  * Getter map (all Marc.php): getBuilding:1585, getGeographicLocations
  * :2422, getAllFields:1946, getLanguages:2188, getAuthorsByRelator
  * :2236, getTitle:799, getShortTitle:1552, getFullTitle:1756,
  * getAltTitles:1670, getSeries:2536, getPublicationYear:1067,
  * getDOIs:1773, getTopics..getEraFacets:2015-2181, getIllustrated
  * :1697, getOclcNumbers:2489, getWorkIdentificationData:1173,
  * getUniqueIDs:887, plus the spec evaluator
  * Marc/Marc.php getFieldsSubfieldsBySpecs:110 (GET_NORMAL/ALT/BOTH,
  * splitSubfields, firstOnly, 880 linkage by `$6` occurrence).
  */
object MarcToSolr {

  private val E = lit("")

  // ---------------------------------------------------------------- model

  def flds(fields: Column, tag: String): Column =
    filter(fields, f => f("tag") === tag)

  /** First data field with the tag, or null. */
  def firstFld(fields: Column, tag: String): Column =
    get(flds(fields, tag), lit(0))

  def ctlFirst(controls: Column, tag: String): Column =
    coalesce(get(filter(controls, c => c("tag") === tag), lit(0))("v"), E)

  def ctlAll(controls: Column, tag: String): Column =
    transform(filter(controls, c => c("tag") === tag), c => c("v"))

  /** First value of a subfield code within a field, '' when absent
    * (PHP getSubfield semantics).
    */
  def subFirst(f: Column, code: String): Column =
    coalesce(
      get(transform(filter(f("subs"), s => s("c") === code), s => s("v")), lit(0)),
      E
    )

  /** All values of the listed codes, in subfield order (PHP
    * getSubfieldsArray: iterate subfields, keep members of the set).
    * Empty `codes` means every subfield.
    */
  def subAll(f: Column, codes: Seq[String]): Column =
    if (codes.isEmpty) transform(f("subs"), s => s("v"))
    else transform(filter(f("subs"), s => s("c").isin(codes: _*)), s => s("v"))

  /** PHP's per-field subfield concatenation (space between collected
    * values).
    */
  private def joinSp(vals: Column): Column = array_join(vals, " ")

  // -------------------------------------------------- 880 alternate script

  /** 880 fields linked to `f` (a field of `tag`) via matching `$6`
    * occurrence numbers (MARC linkage: original carries "880-NN", the
    * 880 carries "TAG-NN[/script]").
    */
  def linked880(fields: Column, tag: String, f: Column): Column = {
    val occ = regexp_extract(subFirst(f, "6"), "^880-([0-9]+)", 1)
    filter(
      flds(fields, "880"),
      g =>
        occ =!= "" &&
          regexp_extract(subFirst(g, "6"), "^([0-9]{3})-", 1) === tag &&
          regexp_extract(subFirst(g, "6"), "^[0-9]{3}-([0-9]+)", 1) === occ
    )
  }

  /** First 880 linked to any field of `tag` (VuFind getLinkedField —
    * matches the tag part only).
    */
  def firstLinked880(fields: Column, tag: String): Column =
    get(
      filter(
        flds(fields, "880"),
        g => regexp_extract(subFirst(g, "6"), "^([0-9]{3})-", 1) === tag
      ),
      lit(0)
    )

  // ------------------------------------------------------- spec evaluator

  /** One selector of getFieldsSubfieldsBySpecs: mode 0 = GET_NORMAL,
    * 1 = GET_ALT (880 only), 2 = GET_BOTH.
    */
  final case class Spec(mode: Int, tag: String, codes: Seq[String])
  def N(tag: String, codes: String*): Spec = Spec(0, tag, codes)
  def A(tag: String, codes: String*): Spec = Spec(1, tag, codes)
  def B(tag: String, codes: String*): Spec = Spec(2, tag, codes)

  private def perFieldVals(fields: Column, spec: Spec, split: Boolean): Column =
    flatten(
      transform(
        filter(flds(fields, spec.tag), f => size(f("subs")) > 0),
        f => {
          val normVals =
            if (split) subAll(f, spec.codes)
            else filter(array(joinSp(subAll(f, spec.codes))), x => x =!= "")
          val alt = linked880(fields, spec.tag, f)
          val altVals =
            if (split) flatten(transform(alt, g => subAll(g, spec.codes)))
            else
              filter(transform(alt, g => joinSp(subAll(g, spec.codes))), x => x =!= "")
          spec.mode match {
            case 0 => normVals
            case 1 => altVals
            case _ => concat(normVals, altVals)
          }
        }
      )
    )

  /** The spec-list evaluator (Marc/Marc.php:110). `firstOnly` keeps the
    * first produced value (getFirstFieldSubfields contract).
    */
  def specVals(
      fields: Column,
      specs: Seq[Spec],
      split: Boolean = false,
      strip: Boolean = true,
      firstOnly: Boolean = false
  ): Column = {
    val all =
      if (specs.size == 1) perFieldVals(fields, specs.head, split)
      else concat(specs.map(s => perFieldVals(fields, s, split)): _*)
    val lim = if (firstOnly) slice(all, 1, 1) else all
    if (strip) transform(lim, MF.stripTrailingPunctuation(_)) else lim
  }

  /** Marc.php getFieldSubfields: all fields of one tag, per-field join,
    * fields space-joined, trailing punctuation stripped once at the end.
    */
  def fieldSubfields(
      fields: Column,
      tag: String,
      codes: Seq[String],
      strip: Boolean = true
  ): Column = {
    val joined = array_join(
      filter(
        transform(flds(fields, tag), f => joinSp(subAll(f, codes))),
        x => x =!= ""
      ),
      " "
    )
    if (strip)
      MF.bindOnce(joined)(j => when(j =!= "", MF.stripTrailingPunctuation(j)).otherwise(E))
    else joined
  }

  // ------------------------------------------------------------- authors

  /** getAuthorsByRelator (Marc.php:2236) — names / first relators / $a
    * values for fields whose normalized `$4`/`$e` relators match (or
    * don't, for `invert`).
    */
  final case class AuthorSet(names: Column, relators: Column, subA: Column)

  def authorsByRelator(
      fields: Column,
      fieldSpecs: Seq[(String, Seq[String])],
      relators: Seq[String],
      noRelatorRequired: Seq[String],
      invert: Boolean = false
  ): AuthorSet = {
    val perTag = fieldSpecs.map { case (tag, codes) =>
      val matched = filter(
        flds(fields, tag),
        f => {
          val fieldRel = transform(subAll(f, Seq("4", "e")), MF.normalizeRelator(_))
          val m0 =
            if (relators.isEmpty) lit(true)
            else
              (size(fieldRel) === 0 && lit(noRelatorRequired.contains(tag))) ||
                arrays_overlap(fieldRel, array(relators.map(lit): _*))
          if (invert) !m0 else m0
        }
      )
      val names = transform(
        matched,
        f => {
          val terms = joinSp(subAll(f, codes))
          val altTerms = array_join(
            transform(linked880(fields, tag, f), g => joinSp(subAll(g, codes))),
            " "
          )
          val t =
            when(altTerms =!= "", concat(terms, lit(" "), altTerms)).otherwise(terms)
          MF.stripTrailingPunctuationBound(trim(t))
        }
      )
      val rels = transform(
        matched,
        f => {
          val fieldRel = transform(subAll(f, Seq("4", "e")), MF.normalizeRelator(_))
          coalesce(get(fieldRel, lit(0)), E)
        }
      )
      val subA = filter(transform(matched, f => subFirst(f, "a")), v => v =!= "")
      (names, rels, subA)
    }
    AuthorSet(
      concat(perTag.map(_._1): _*),
      concat(perTag.map(_._2): _*),
      concat(perTag.map(_._3): _*)
    )
  }

  def authorVariants(subA: Column): Column =
    filter(transform(subA, a => MetadataQueries2.authorInitials(a)), v => v =!= "")

  // -------------------------------------------------------------- titles

  /** getTitle (Marc.php:799): 245 then 240; $a (+non-filing strip when
    * filing) then accepted subfields appended with ISBD punctuation
    * unless the accumulator already ends in punctuation.
    */
  def titleOf(fields: Column, forFiling: Boolean): Column = {
    val accept = if (forFiling) Seq("b", "n", "p", "c") else Seq("b", "n", "p")
    def punct(c: Column): Column =
      when(c === "b", " : ").when(c === "n", ". ").when(c === "p", ". ").otherwise(" ")
    def raw(tag: String): Column = {
      val f = firstFld(fields, tag)
      val a = subFirst(f, "a")
      val base =
        if (forFiling) {
          val nfs = f("i2")
          val nf = when(nfs.rlike("^[0-9]$"), nfs.cast("int")).otherwise(lit(0))
          when(nf > 0, substr(a, nf + 1)).otherwise(a)
        } else a
      val built = aggregate(
        filter(f("subs"), s => s("c").isin(accept: _*)),
        base,
        (acc, s) =>
          concat(
            acc,
            when(MetadataQueries2.hasTrailingPunctuation(acc), lit(" "))
              .otherwise(punct(s("c"))),
            s("v")
          )
      )
      val processed =
        if (forFiling) lower(MF.stripPunctuation(built)) else built
      when(f.isNull, lit(null)).otherwise(processed)
    }
    MF.bindOnce(raw("245")) { v245 =>
      MF.bindOnce(raw("240")) { v240 =>
        coalesce(
          nullif(MF.stripTrailingPunctuation(v245), E),
          nullif(MF.stripTrailingPunctuation(v240), E),
          nullif(v245, E),
          nullif(v240, E),
          E
        )
      }
    }
  }

  // ------------------------------------------------------------ geo / etc

  /** PHP `(string)$float` under precision=14
    * ([[graft.plans.PhpFloatStringExpr]] — exact-binary half-even
    * rounding, which Spark's shortest-repr `round()` cannot reproduce).
    */
  def phpFloatStr(d: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.plans.PhpFloatStringExpr(
        org.apache.spark.sql.GraftColumn.exprOf(d.cast("double"))
      )
    )

  /** getGeographicLocations (Marc.php:2422): 034 d/e/f/g →
    * POINT/ENVELOPE strings with coordinate-order repair; invalid
    * coordinates are dropped (the warning side-channel is covered by
    * `records_warnings`).
    */
  def geographicLocations(fields: Column): Column = {
    val locs = transform(
      flds(fields, "034"),
      f => {
        val w = MF.coordinateToDecimal(subFirst(f, "d"))
        val e = MF.coordinateToDecimal(subFirst(f, "e"))
        val n = MF.coordinateToDecimal(subFirst(f, "f"))
        val s = MF.coordinateToDecimal(subFirst(f, "g"))
        val wnOk = !isnan(w) && !isnan(n) &&
          w.between(-180, 180) && n.between(-90, 90)
        val esPresent = !isnan(e) && !isnan(s) && (e =!= w || n =!= s)
        val esOk = e.between(-180, 180) && s.between(-90, 90)
        val env = concat(
          lit("ENVELOPE("),
          phpFloatStr(least(w, e)),
          lit(", "),
          phpFloatStr(greatest(w, e)),
          lit(", "),
          phpFloatStr(greatest(n, s)),
          lit(", "),
          phpFloatStr(least(n, s)),
          lit(")")
        )
        val point =
          concat(lit("POINT("), phpFloatStr(w), lit(" "), phpFloatStr(n), lit(")"))
        when(!wnOk, lit(null))
          .when(esPresent && !esOk, lit(null))
          .when(esPresent, env)
          .otherwise(point)
      }
    )
    filter(locs, x => x.isNotNull)
  }

  /** getCenterCoordinates over the WKT built above (the reference
    * re-parses the precision-14 string, so centers derive from the
    * formatted bounds — reproduced by parsing our own output).
    */
  def centerCoordinates(wkt: Column): Column = {
    val lon = phpFloatStr(MF.envelopeCenterLon(wkt))
    val lat = phpFloatStr(MF.envelopeCenterLat(wkt))
    when(upper(wkt).startsWith("ENVELOPE"), concat(lon, lit(" "), lat))
      .otherwise(regexp_extract(wkt, "POINT\\(([^)]+)\\)", 1))
  }

  def geoDisplay(wkt: Column): Column =
    when(upper(wkt).startsWith("ENVELOPE"), MF.geoDisplayField(wkt))
      .otherwise(regexp_extract(wkt, "POINT\\(([^)]+)\\)", 1))

  /** Marc.php's own extractYear (:2401): bracketed year first, then any
    * 4-digit run.
    */
  def marcYear(c: Column): Column = {
    val br = regexp_extract(regexp_extract(c, "\\[(.+)\\]", 1), "(\\d{4})", 1)
    when(br =!= "", br).otherwise(regexp_extract(c, "(\\d{4})", 1))
  }

  def publicationYear(controls: Column, fields: Column): Column = {
    val y260 = marcYear(subFirst(firstFld(fields, "260"), "c"))
    val y264 = coalesce(
      get(
        filter(
          transform(
            filter(flds(fields, "264"), f => f("i2") === "1"),
            f => marcYear(subFirst(f, "c"))
          ),
          y => y =!= ""
        ),
        lit(0)
      ),
      E
    )
    val raw008 = substring(ctlFirst(controls, "008"), 8, 4)
    val y008 = when(
      raw008 =!= "0000" && raw008 =!= "9999",
      regexp_extract(raw008, "(\\d{4})", 1)
    ).otherwise(E)
    val via260 = when(firstFld(fields, "260").isNotNull && y260 =!= "", y260).otherwise(E)
    when(via260 =!= "", via260).when(y264 =!= "", y264).otherwise(y008)
  }

  // ------------------------------------------------------------ assembly

  /** Every toSolrArray output (minus `fullrecord`, which is the codec's
    * job) as named columns. `geoCenterField`/`geoDisplayField` mirror
    * the driver params (defaults: no center field, long_lat_display).
    */
  def solrColumns(
      leader: Column,
      controls: Column,
      fields: Column,
      geoCenterField: Boolean = false
  ): Seq[(String, Column)] = {
    val f008 = ctlFirst(controls, "008")

    val building =
      filter(transform(flds(fields, "852"), f => subFirst(f, "b")), v => v =!= "")

    val geoLocs = geographicLocations(fields)
    val centers = transform(geoLocs, centerCoordinates(_))
    val display = transform(geoLocs, geoDisplay(_))

    val lccn = trim(fieldSubfields(fields, "010", Seq("a")))
    val ctrlnum = specVals(fields, Seq(N("035", "a")))

    val allfields = {
      val tagOk = (t: Column) =>
        t.rlike("^[0-9]{3}$") &&
          ((t >= "100" && t < "841") || t === "856" || t === "880")
      val raw = flatten(
        transform(
          filter(fields, f => tagOk(f("tag"))),
          f => {
            val excl = when(f("tag") === "650", array(lit("0"), lit("2"), lit("6"), lit("8")))
              .when(f("tag") === "773", array(lit("6"), lit("7"), lit("8"), lit("w")))
              .when(f("tag") === "856", array(lit("6"), lit("8"), lit("q")))
              .otherwise(array(lit("0"), lit("6"), lit("8")))
            transform(filter(f("subs"), s => !array_contains(excl, s("c"))), s => s("v"))
          }
        )
      )
      // stripLeadingPunctuation with preservePunctuationOnly = false
      val stripLead = (v: Column) =>
        regexp_replace(v, "^[ \\t#*!¡?/:;.,=(\\['\"´`”\\x{0308}]*", "")
      array_distinct(transform(raw, v => MF.stripTrailingPunctuation(stripLead(v))))
    }

    val language = {
      val l008 = substring(f008, 36, 3)
      val l041 = specVals(
        fields,
        Seq(N("041", "a"), N("041", "d"), N("041", "h"), N("041", "j")),
        split = true
      )
      filter(
        transform(concat(array(l008), l041), v => lower(trim(v))),
        v => v =!= ""
      )
    }

    val format = MarcFormat.marcFormats(
      leader,
      ctlFirst(controls, "007"),
      f008,
      exists(flds(fields, "773"), f => subFirst(f, "g") =!= ""),
      size(flds(fields, "086")) > 0,
      size(flds(fields, "502")) > 0,
      coalesce(subFirst(firstFld(fields, "245"), "h"), E),
      exists(
        flds(fields, "338"),
        f => MarcFormat.isOnline338(subFirst(f, "a"), subFirst(f, "b"), subFirst(f, "2"))
      ),
      exists(
        flds(fields, "336"),
        f => MarcFormat.isVideo336(subFirst(f, "a"), subFirst(f, "b"), subFirst(f, "2"))
      ),
      size(flds(fields, "111")) > 0 || size(flds(fields, "711")) > 0
    )

    val primaryRelators = Seq("adp", "aut", "cmp", "cre", "dub", "inv")
    val authorSpecs = Seq(
      "100" -> Seq("a", "b", "c", "q", "d"),
      "700" -> Seq("a", "b", "c", "q", "d")
    )
    val primary = authorsByRelator(fields, authorSpecs, primaryRelators, Seq("100"))
    val secondary =
      authorsByRelator(fields, authorSpecs, primaryRelators, Seq("100"), invert = true)
    val corporate = authorsByRelator(
      fields,
      Seq(
        "110" -> Seq("a", "b"),
        "111" -> Seq("a", "b"),
        "710" -> Seq("a", "b"),
        "711" -> Seq("a", "b")
      ),
      Seq.empty,
      Seq("110", "111", "710", "711")
    )
    val authorSort = coalesce(
      get(primary.names, lit(0)),
      get(secondary.names, lit(0)),
      E
    )

    val titleAlt = array_distinct(
      specVals(
        fields,
        Seq(
          A("245", "a", "b"),
          B("130", "a", "d", "f", "g", "k", "l", "n", "p", "s", "t"),
          B("240", "a"),
          B("246", "a", "b", "n", "p"),
          B("730", "a", "d", "f", "g", "k", "l", "n", "p", "s", "t"),
          B("740", "a")
        )
      )
    )

    val titleShort245 = MF.stripTrailingPunctuationPreserveBound(
      fieldSubfields(fields, "245", Seq("a"), strip = false)
    )
    val titleFull245 = MF.stripTrailingPunctuationPreserveBound(
      fieldSubfields(
        fields,
        "245",
        Seq("a", "b", "c", "f", "g", "h", "k", "n", "p", "s"),
        strip = false
      )
    )
    // 240 fallback when 245$a is missing (Marc.php:423)
    val (titleShort, titleFull) = {
      val bound = (f: Column => Column) => MF.bindOnce(titleShort245)(f)
      (
        bound(ts => when(ts =!= "", ts).otherwise(fieldSubfields(fields, "240", Seq("a", "n", "p")))),
        bound(ts => when(ts =!= "", titleFull245).otherwise(fieldSubfields(fields, "240", Seq.empty)))
      )
    }

    val pub260 = specVals(fields, Seq(B("260", "b")))
    val first264i1 = get(filter(flds(fields, "264"), f => f("i2") === "1"), lit(0))
    val publisher = when(size(pub260) > 0, pub260)
      .when(
        first264i1.isNotNull,
        array(MF.stripTrailingPunctuationBound(subFirst(first264i1, "b")))
      )
      .otherwise(array().cast("array<string>"))

    val pubYear = publicationYear(controls, fields)

    val isbnOf = (spec: Spec) =>
      filter(
        transform(
          specVals(fields, Seq(spec), split = true),
          v => MF.normalizeIsbn(v)
        ),
        v => v.isNotNull && v =!= ""
      )
    val isbn = concat(isbnOf(N("020", "a")), isbnOf(N("773", "z")))

    val issn = specVals(
      fields,
      Seq(
        N("022", "a"),
        N("440", "x"),
        N("490", "x"),
        N("730", "x"),
        N("773", "x"),
        N("776", "x"),
        N("780", "x"),
        N("785", "x")
      )
    )

    val dois = {
      val d024 = filter(
        transform(
          filter(flds(fields, "024"), f => lower(subFirst(f, "2")) === "doi"),
          f => trim(subFirst(f, "a"))
        ),
        v => v =!= ""
      )
      val d856 = filter(
        transform(
          flatten(transform(flds(fields, "856"), f => subAll(f, Seq("u")))),
          u => {
            val m = regexp_extract(
              u,
              "(urn:doi:|https?://doi.org/|https?://dx.doi.org/)([^?#]+)",
              2
            )
            when(m =!= "", url_decode(m)).otherwise(lit(null))
          }
        ),
        v => v.isNotNull
      )
      concat(d024, d856)
    }

    val cnFirst = coalesce(
      get(
        specVals(fields, Seq(N("099", "a"), N("090", "a"), N("050", "a")), firstOnly = true),
        lit(0)
      ),
      E
    )
    val cnValue = coalesce(
      get(specVals(fields, Seq(N("090", "a"), N("050", "a")), firstOnly = true), lit(0)),
      E
    )
    val cnSubject = regexp_extract(upper(cnValue), "^([A-Z]+)", 1)
    val cnLabel = upper(element_at(split(cnValue, "\\.", 2), 1))
    val cnRaw = transform(
      specVals(fields, Seq(N("080", "a", "b"), N("084", "a", "b"), N("050", "a", "b"))),
      upper(_)
    )
    val cnSort = {
      val firstAny = coalesce(
        get(filter(transform(cnRaw, CallNumbers.lcSortKey(_)), v => v =!= ""), lit(0)),
        E
      )
      val firstValid = coalesce(
        get(
          filter(
            transform(filter(cnRaw, CallNumbers.lcValid(_)), CallNumbers.lcSortKey(_)),
            v => v =!= ""
          ),
          lit(0)
        ),
        E
      )
      when(firstValid =!= "", firstValid).otherwise(firstAny)
    }

    val topic = specVals(
      fields,
      Seq(
        B("600", "a", "b", "c", "d", "e", "f", "g", "h", "j", "k", "l", "m", "n", "o",
          "p", "q", "r", "s", "t", "u", "v", "x", "y", "z"),
        B("610", "a", "b", "c", "d", "e", "f", "g", "h", "k", "l", "m", "n", "o", "p",
          "r", "s", "t", "u", "v", "x", "y", "z"),
        B("611", "a", "c", "d", "e", "f", "g", "h", "j", "k", "l", "n", "p", "q", "s",
          "t", "u", "v", "x", "y", "z"),
        B("630", "a", "d", "e", "f", "g", "h", "k", "l", "m", "n", "o", "p", "r", "s",
          "t", "v", "x", "y", "z"),
        B("650", "a", "b", "c", "d", "e", "v", "x", "y", "z")
      )
    )
    val genre = specVals(fields, Seq(B("655", "a", "b", "c", "v", "x", "y", "z")))
    val geographic = specVals(fields, Seq(B("651", "a", "e", "v", "x", "y", "z")))
    val era = specVals(fields, Seq(B("648", "a", "v", "x", "y", "z")))

    val topicFacet = specVals(
      fields,
      Seq(
        N("600", "x"), N("610", "x"), N("611", "x"), N("630", "x"), N("648", "x"),
        N("650", "a"), N("650", "x"), N("651", "x"), N("655", "x")
      ),
      split = true
    )
    val genreFacet = transform(
      specVals(
        fields,
        Seq(
          N("600", "v"), N("610", "v"), N("611", "v"), N("630", "v"), N("648", "v"),
          N("650", "v"), N("651", "v"), N("655", "a"), N("655", "v")
        ),
        split = true
      ),
      v => MF.ucFirst(v)
    )
    val geographicFacet = specVals(
      fields,
      Seq(
        N("600", "z"), N("610", "z"), N("611", "z"), N("630", "z"), N("648", "z"),
        N("650", "z"), N("651", "a"), N("651", "z"), N("655", "z")
      ),
      split = true
    )
    val eraFacet = specVals(
      fields,
      Seq(
        N("630", "y"), N("648", "a"), N("648", "y"), N("650", "y"), N("651", "y"),
        N("655", "y")
      ),
      split = true
    )

    val illustrated = {
      val codes = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
        "o", "p")
      val ldr6 = substring(leader, 7, 1)
      val ill008 =
        (18 to 21).map(p => substring(f008, p + 1, 1).isin(codes: _*)).reduce(_ || _)
      val ill006 = exists(
        ctlAll(controls, "006"),
        v => (1 to 4).map(p => substring(v, p + 1, 1).isin(codes: _*)).reduce(_ || _)
      )
      val ill300 = exists(
        flds(fields, "300"),
        f => {
          val b = lower(subFirst(f, "b"))
          b.contains("ill.") || b.contains("illus.")
        }
      )
      when(ldr6.isin("a", "t") && (ill008 || ill006), lit("Illustrated"))
        .when(ill300, lit("Illustrated"))
        .otherwise(lit("Not Illustrated"))
    }

    val deweyFields = specVals(fields, Seq(N("082", "a"), N("083", "a")))
    val deweyLast = coalesce(try_element_at(deweyFields, lit(-1)), E)
    val deweySort = coalesce(
      get(
        filter(transform(deweyFields, CallNumbers.deweySortKey(_)), v => v =!= ""),
        lit(0)
      ),
      E
    )

    val oclc = {
      val pats = Seq(
        "\\([Oo][Cc][Oo][Ll][Cc]\\)[^0-9]*0*([0-9]+)",
        "ocm0*([0-9]+)[ ]*[0-9]*",
        "ocn0*([0-9]+).*",
        "on0*([0-9]+).*"
      )
      filter(
        transform(
          ctrlnum,
          c => {
            val lc = lower(c)
            val pre = lc.startsWith("(ocolc)") || lc.startsWith("ocm") ||
              lc.startsWith("ocn") || lc.startsWith("on")
            val m = coalesce(pats.map(p => nullif(regexp_extract(c, p, 1), E)): _*)
            when(pre, m).otherwise(lit(null))
          }
        ),
        v => v.isNotNull
      )
    }

    Seq(
      "record_format" -> lit("marc"),
      "building" -> building,
      "long_lat" -> geoLocs,
      "long_lat_display" -> display,
      "center_coords" -> (if (geoCenterField) centers
                          else array().cast("array<string>")),
      "lccn" -> lccn,
      "ctrlnum" -> ctrlnum,
      "allfields" -> allfields,
      "language" -> language,
      "format" -> format,
      "author" -> primary.names,
      "author_variant" -> authorVariants(primary.subA),
      "author_role" -> primary.relators,
      "author_sort" -> authorSort,
      "author2" -> secondary.names,
      "author2_variant" -> authorVariants(secondary.subA),
      "author2_role" -> secondary.relators,
      "author_corporate" -> corporate.names,
      "author_corporate_role" -> corporate.relators,
      "author_additional" -> specVals(fields, Seq(B("505", "r")), firstOnly = true),
      "title" -> titleOf(fields, forFiling = false),
      "title_sub" -> fieldSubfields(fields, "245", Seq("b", "n", "p")),
      "title_short" -> titleShort,
      "title_full" -> titleFull,
      "title_alt" -> titleAlt,
      "title_old" -> specVals(fields, Seq(B("780", "a", "s", "t"))),
      "title_new" -> specVals(fields, Seq(B("785", "a", "s", "t"))),
      "title_sort" -> titleOf(fields, forFiling = true),
      "series" -> specVals(
        fields,
        Seq(
          B("440", "a"),
          B("490", "a"),
          B("800", "a", "b", "c", "d", "f", "p", "q", "t"),
          B("830", "a", "p")
        )
      ),
      "publisher" -> publisher,
      "publishDateSort" -> pubYear,
      "publishDate" -> when(pubYear =!= "", array(pubYear))
        .otherwise(array().cast("array<string>")),
      "physical" -> specVals(
        fields,
        Seq(B("300", "a", "b", "c", "e", "f", "g"), B("530", "a", "b", "c", "d"))
      ),
      "dateSpan" -> specVals(fields, Seq(B("362", "a"))),
      "edition" -> fieldSubfields(fields, "250", Seq("a")),
      "contents" -> specVals(fields, Seq(B("505", "a"), B("505", "t"))),
      "isbn" -> isbn,
      "issn" -> issn,
      "doi_str_mv" -> dois,
      "callnumber-first" -> cnFirst,
      "callnumber-subject" -> cnSubject,
      "callnumber-label" -> cnLabel,
      "callnumber-raw" -> cnRaw,
      "callnumber-sort" -> cnSort,
      "topic" -> topic,
      "genre" -> genre,
      "geographic" -> geographic,
      "era" -> era,
      "topic_facet" -> topicFacet,
      "genre_facet" -> genreFacet,
      "geographic_facet" -> geographicFacet,
      "era_facet" -> eraFacet,
      "url" -> specVals(fields, Seq(N("856", "u"))),
      "illustrated" -> illustrated,
      "dewey-hundreds" -> when(deweyLast =!= "", CallNumbers.deweyNumber(deweyLast, 100))
        .otherwise(E),
      "dewey-tens" -> when(deweyLast =!= "", CallNumbers.deweyNumber(deweyLast, 10))
        .otherwise(E),
      "dewey-ones" -> when(deweyLast =!= "", CallNumbers.deweyNumber(deweyLast, 1))
        .otherwise(E),
      "dewey-full" -> when(deweyLast =!= "", CallNumbers.deweySearchString(deweyLast))
        .otherwise(E),
      "dewey-sort" -> deweySort,
      "dewey-raw" -> deweyLast,
      "oclc_num" -> oclc
    )
  }

  // --------------------------------------------- work identification data

  /** getWorkIdentificationData (Marc.php:1173). Emitted as typed nested
    * arrays: titles/authors as struct(type, value) rows, analytical
    * entries as one struct per qualifying 7xx field.
    */
  def workIdColumns(fields: Column): Seq[(String, Column)] = {
    val authorTags = Seq(
      "100" -> Seq("a", "b"),
      "110" -> Seq("a", "b"),
      "111" -> Seq("a", "c"),
      "700" -> Seq("a", "b"),
      "710" -> Seq("a", "b"),
      "711" -> Seq("a", "c")
    )
    val analyticalTags = Set("700", "710", "711")

    def ind2Int(f: Column): Column = {
      val i = f("i2")
      when(i.rlike("^[0-9]$"), i.cast("int")).otherwise(lit(0))
    }

    val perTagAuthors = authorTags.map { case (tag, codes) =>
      val nonAnalytical =
        if (analyticalTags.contains(tag))
          filter(flds(fields, tag), f => ind2Int(f) =!= 2)
        else flds(fields, tag)
      val withName = filter(nonAnalytical, f => joinSp(subAll(f, codes)) =!= "")
      val names = transform(withName, f => joinSp(subAll(f, codes)))
      val alt = flatten(
        transform(
          withName,
          f => transform(linked880(fields, tag, f), g => joinSp(subAll(g, codes)))
        )
      )
      (names, alt)
    }
    val authors = concat(perTagAuthors.map(_._1): _*)
    val authorsAlt = concat(perTagAuthors.map(_._2): _*)

    val titleTags = Seq(
      "130" -> Seq("n", "p"),
      "730" -> Seq("n", "p"),
      "240" -> Seq("n", "p", "m", "r"),
      "245" -> Seq("b", "n"),
      "246" -> Seq("b", "n"),
      "247" -> Seq("b", "n")
    )
    def entriesFor(
        tag: String,
        codes: Seq[String],
        f: Column,
        typ: String
    ): Column = {
      val a = subFirst(f, "a")
      val rest = joinSp(subAll(f, codes))
      val orig = when(rest =!= "", concat(a, lit(" "), rest)).otherwise(a)
      val nfInd: Column = tag match {
        case "130" | "730" =>
          when(f("i1").rlike("^[0-9]$"), f("i1").cast("int")).otherwise(lit(0))
        case "246" => lit(0)
        case _     => ind2Int(f)
      }
      val strippedT = when(nfInd > 0, substr(orig, nfInd + 1)).otherwise(orig)
      filter(
        array(
          when(strippedT =!= "", struct(lit(typ).as("type"), strippedT.as("value"))),
          when(
            strippedT =!= "" && strippedT =!= orig,
            struct(lit(typ).as("type"), orig.as("value"))
          )
        ),
        x => x.isNotNull
      )
    }
    val perTagTitles = titleTags.map { case (tag, codes) =>
      val f = firstFld(fields, tag)
      val typ = if (tag == "130" || tag == "730") "uniform" else "title"
      val main = when(f.isNull, array().cast("array<struct<type:string,value:string>>"))
        .otherwise(entriesFor(tag, codes, f, typ))
      val alt = when(f.isNull, array().cast("array<struct<type:string,value:string>>"))
        .otherwise(
          flatten(
            transform(linked880(fields, tag, f), g => entriesFor(tag, codes, g, typ))
          )
        )
      (main, alt)
    }
    val titles = concat(perTagTitles.map(_._1): _*)
    val titlesAlt = concat(perTagTitles.map(_._2): _*)

    val analytical = {
      val perTag = authorTags.filter(t => analyticalTags.contains(t._1)).map {
        case (tag, codes) =>
          val fs = filter(flds(fields, tag), f => ind2Int(f) === 2)
          val withTitle =
            filter(fs, f => joinSp(subAll(f, Seq("t", "n", "p", "m", "r"))) =!= "")
          transform(
            withTitle,
            f => {
              val altF = firstLinked880(fields, tag)
              val altTitle = coalesce(subFirst(altF, "a"), E)
              val altAuthor =
                when(altTitle =!= "", coalesce(joinSp(subAll(altF, codes)), E))
                  .otherwise(E)
              struct(
                joinSp(subAll(f, codes)).as("author"),
                joinSp(subAll(f, Seq("t", "n", "p", "m", "r"))).as("title"),
                altAuthor.as("alt_author"),
                altTitle.as("alt_title")
              )
            }
          )
      }
      concat(perTag: _*)
    }

    Seq(
      "wk_has_work" -> (size(titles) > 0),
      "wk_authors" -> authors,
      "wk_authors_alt" -> authorsAlt,
      "wk_titles" -> titles,
      "wk_titles_alt" -> titlesAlt,
      "wk_analytical" -> analytical
    )
  }

  // ------------------------------------------------------------ work keys

  /** SolrUpdater::addWorkKeys (SolrUpdater.php:2172) under the default
    * config (main entries only, all authors): `UT <titlekey>` for
    * uniform titles, `AT <authorkey> <titlekey>` per author otherwise,
    * same again for the alternate-script set; keys through the ICU
    * default normalizeKey pipeline. The CreatePreview fixture pins the
    * folded output (`AT hirsjarvisirkka tutkijakirjoita`).
    */
  def workKeys(fields: Column): Column = {
    val m = workIdColumns(fields).toMap
    def keysFor(titles: Column, authors: Column): Column =
      flatten(
        transform(
          titles,
          t =>
            when(
              t("type") === "uniform",
              array(concat(lit("UT "), MF.normalizeKeyRules(t("value"))))
            ).otherwise(
              transform(
                authors,
                a =>
                  concat(
                    lit("AT "),
                    MF.normalizeKeyRules(a),
                    lit(" "),
                    MF.normalizeKeyRules(t("value"))
                  )
              )
            )
        )
      )
    // The title/author derivations are sizable HOF trees; bind each once
    // (titles doubles as the has-work gate).
    MF.bindOnce(struct(
      m("wk_titles").as("t"),
      m("wk_authors").as("a"),
      m("wk_titles_alt").as("ta"),
      m("wk_authors_alt").as("aa")
    )) { w =>
      when(
        size(w("t")) > 0,
        concat(keysFor(w("t"), w("a")), keysFor(w("ta"), w("aa")))
      ).otherwise(array().cast("array<string>"))
    }
  }

  // ------------------------------------------------- holdings normalization

  /** Marc.php normalize() (:1368) — the Koha/Alma item→holdings
    * conversion: 952 item fields group by the
    * branch//c//h//o//8 key (first-occurrence order, later items
    * overwrite content — identical by construction since the content IS
    * the key), each group becomes one holdings 952 with `$9 = 1` when
    * ANY member item is available. Availability: Alma = `$1 == '1'`;
    * Koha = none of $0/$1/$4/$q present AND not-for-loan status `$7` in
    * {'0','1'}. `useHome` switches the branch subfield to `$a`
    * (kohaUseHomeBranch).
    */
  def normalizeHoldings(
      fields: Column,
      alma: Boolean,
      useHome: Boolean = false
  ): Column = {
    val branchCode = if (useHome && !alma) "a" else "b"
    def keyOf(f: Column): Column =
      concat_ws(
        "//",
        subFirst(f, branchCode),
        subFirst(f, "c"),
        subFirst(f, "h"),
        subFirst(f, "o"),
        subFirst(f, "8")
      )
    def availableItem(f: Column): Column =
      if (alma) subFirst(f, "1") === "1"
      else {
        val marked = Seq("0", "1", "4", "q").map(c => subFirst(f, c) =!= "")
        val st = subFirst(f, "7")
        !marked.reduce(_ || _) && (st === "0" || st === "1")
      }
    val items = flds(fields, "952")
    val keys = array_distinct(transform(items, keyOf(_)))
    val holdings = transform(
      keys,
      k => {
        val members = filter(items, f => keyOf(f) === k)
        val first = get(members, lit(0))
        val avail = exists(members, availableItem(_))
        val subs0 = filter(
          array(
            struct(lit("b").as("c"), subFirst(first, branchCode).as("v")),
            struct(lit("c").as("c"), subFirst(first, "c").as("v")),
            struct(lit("h").as("c"), subFirst(first, "h").as("v")),
            struct(lit("o").as("c"), subFirst(first, "o").as("v")),
            struct(lit("8").as("c"), subFirst(first, "8").as("v"))
          ),
          s => s("v") =!= "" || s("c") === "b"
        )
        val subs = when(
          avail,
          concat(subs0, array(struct(lit("9").as("c"), lit("1").as("v"))))
        ).otherwise(subs0)
        struct(
          lit("952").as("tag"),
          lit(" ").as("i1"),
          lit(" ").as("i2"),
          subs.as("subs")
        )
      }
    )
    concat(filter(fields, f => f("tag") =!= "952"), holdings)
  }

  // ------------------------------------------------------------ uniqueIDs

  /** getUniqueIDs (Marc.php:887). The `(nucmc)$lccn` value reproduces
    * the reference's own variable reuse (:904 — $lccn, not $nucmc).
    */
  def uniqueIds(fields: Column): Column = {
    val f010 = firstFld(fields, "010")
    val lccn = MF.normalizeKey(coalesce(subFirst(f010, "a"), E))
    val nucmc = MF.normalizeKey(coalesce(subFirst(f010, "b"), E))
    val id010 = filter(
      array(
        when(lccn =!= "", concat(lit("(lccn)"), lccn)),
        when(nucmc =!= "", concat(lit("(nucmc)"), lccn))
      ),
      x => x.isNotNull
    )
    def numberField(tag: String): Column = {
      val f = firstFld(fields, tag)
      val nr = MF.normalizeKey(coalesce(subFirst(f, "a"), E))
      val src = coalesce(subFirst(f, "2"), E)
      filter(
        array(when(nr =!= "" && src =!= "", concat(lit("("), src, lit(")"), nr))),
        x => x.isNotNull
      )
    }
    val id024 = {
      val f = firstFld(fields, "024")
      val rawNr = coalesce(subFirst(f, "a"), E)
      val i1 = coalesce(f("i1"), E)
      val src = when(i1 === "0", lit("istc"))
        .when(i1 === "1", lit("upc"))
        .when(i1 === "2", lit("ismn"))
        .when(i1 === "3", lit("ian"))
        .when(i1 === "4", lit("sici"))
        .when(i1 === "7", coalesce(subFirst(f, "2"), E))
        .otherwise(E)
      // ind1=3: cut at the first space (strpos > 0)
      val cut = when(
        i1 === "3" && instr(rawNr, " ") > 1,
        substring_index(rawNr, " ", 1)
      ).otherwise(rawNr)
      val nr0 = MF.normalizeKey(cut)
      val nr = when(src === "ismn" && !nr0.rlike("[0-9]{13}"), E).otherwise(nr0)
      filter(
        array(when(nr =!= "" && src =!= "", concat(lit("("), src, lit(")"), nr))),
        x => x.isNotNull
      )
    }
    val scn = {
      val pats = Seq(
        "^\\((CONSER|DLC|OCoLC)\\).+",
        "^\\(EXLCZ\\).+",
        "^\\(EXLNZ-.+\\).+",
        "^\\(\\w\\w-\\w+\\).+"
      )
      val vals = filter(
        flatten(transform(flds(fields, "035"), f => subAll(f, Seq("a")))),
        v => v =!= ""
      )
      transform(
        filter(vals, v => pats.map(p => v.rlike(p)).reduce(_ || _)),
        v => MF.normalizeKey(v)
      )
    }
    concat(id010, numberField("015"), numberField("016"), id024, scn)
  }
}
