package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The SolrUpdater field-processing tail (`Solr/SolrUpdater.php`): the
  * per-document transformations applied between `toSolrArray` and the
  * update buffer — config-driven field rules (copy/move/delete), the
  * institution/building prefixing, field normalization (Unicode form,
  * max-length trimming with wildcard field patterns, non-indexed value
  * removal, order-preserving dedupe), Solr id rewriting, and the
  * merged-record/parent-record field copies. Every operator here is
  * map-only over the document stream except the two copy operators,
  * whose group/parent lookups are bounded joins (dimension-sized side
  * broadcast, or a co-partitionable equi-join at scale).
  */
object SolrUpdateQueries {

  // ---- processFieldRules (SolrUpdater.php:2491) ----

  /** One parsed field rule (SolrUpdater.php:2440 parseFieldRules):
    * `op src dst [match="..."] [default="..."]`; a slash-wrapped match
    * is a regex over the values, anything else an exact value.
    */
  final case class FieldRule(
      op: String, // copy | move | delete
      src: String,
      dst: Option[String],
      matchSpec: Option[String],
      default: Option[String]
  )

  /** parseFieldRules (SolrUpdater.php:2440): `op src [dst] [match="..."]
    * [default="..."] [positional default words...]` — quoted match/default
    * params first, any unquoted remainder becomes the default (the
    * config-file shorthand the reference's own tests use).
    */
  def parseRule(ruleStr: String): FieldRule = {
    val parts = scala.collection.mutable.Queue(ruleStr.split(" ").toIndexedSeq: _*)
    val op = parts.dequeue()
    require(Set("copy", "move", "delete").contains(op), s"bad rule op: $op")
    val src = parts.dequeue()
    val dst = if (op != "delete") Some(parts.dequeue()) else None
    var rest = parts.mkString(" ")
    var matchSpec: Option[String] = None
    var default: Option[String] = None
    val P = """^(match|default)="([^"]*)"\s*""".r
    var m = P.findFirstMatchIn(rest)
    while (m.isDefined) {
      val g = m.get
      if (g.group(1) == "match") matchSpec = Some(g.group(2))
      else default = Some(g.group(2))
      rest = rest.substring(g.matched.length)
      m = P.findFirstMatchIn(rest)
    }
    val extra = rest.trim
    if (extra.nonEmpty && default.isEmpty) default = Some(extra)
    FieldRule(op, src, dst, matchSpec, default)
  }

  /** Apply the rule chain to a document modeled as field-name →
    * nullable array column (null ≙ the PHP key being unset). Field
    * names resolve at plan-build time — the same moment the reference
    * resolves its per-source config — so the whole chain stays inside
    * one codegen'd projection; no shuffle, no UDF.
    *
    * Semantics mirrored from SolrUpdater.php:2491 processFieldRules:
    *  - match present: absent src or no matching values → rule skipped;
    *    otherwise the matching subset becomes the working values.
    *  - match absent: empty/absent src falls back to `default`, and a
    *    rule with neither values nor default is skipped.
    *  - copy/move append working values to dst (no dedupe).
    *  - delete/move with a match remove only the matching values from
    *    src (PHP array_diff — order-preserving, so `filter` rather than
    *    Spark's deduping array_except); without a match they unset src.
    */
  def applyFieldRules(
      doc: Map[String, Column],
      rules: Seq[FieldRule]
  ): Map[String, Column] =
    rules.foldLeft(doc) { (d, r) =>
      val src = d.getOrElse(r.src, lit(null).cast("array<string>"))
      val matching = r.matchSpec.map { spec =>
        val RegexSpec = "(?s)^/(.*)/(i?)$".r
        spec match {
          case RegexSpec(body, flags) if spec.length >= 2 =>
            val p = if (flags.isEmpty) body else s"(?$flags)$body"
            filter(src, v => v.rlike(p))
          case _ => filter(src, v => v === spec)
        }
      }
      val srcNonEmpty = src.isNotNull && coalesce(size(src), lit(0)) > 0
      val active = matching match {
        case Some(m) => src.isNotNull && coalesce(size(m), lit(0)) > 0
        case None =>
          if (r.default.isDefined) lit(true)
          else srcNonEmpty
      }
      val newValues = matching match {
        case Some(m) => m
        case None =>
          r.default match {
            case Some(dflt) => when(srcNonEmpty, src).otherwise(array(lit(dflt)))
            case None       => src
          }
      }
      val afterDst = r.dst match {
        case Some(dstName) if r.op == "copy" || r.op == "move" =>
          val dst = d.getOrElse(dstName, lit(null).cast("array<string>"))
          val appended =
            when(dst.isNull, newValues).otherwise(concat(dst, newValues))
          d.updated(dstName, when(active, appended).otherwise(dst))
        case _ => d
      }
      if (r.op == "delete" || r.op == "move") {
        val afterSrc = matching match {
          case Some(m) =>
            // array_diff: drop every value equal to a matching one.
            val remaining = filter(src, v => !array_contains(m, v))
            when(active,
              when(coalesce(size(remaining), lit(0)) > 0, remaining)
                .otherwise(lit(null).cast("array<string>"))
            ).otherwise(src)
          case None =>
            when(active, lit(null).cast("array<string>")).otherwise(src)
        }
        afterDst.updated(r.src, afterSrc)
      } else afterDst
    }

  // ---- trimFieldLength (SolrUpdater.php:3213) ----

  /** Resolve the max length for a field from a `Solr Field Limits`-style
    * config: exact key first, then wildcard keys in config order
    * (`*key` suffix match, `key*` prefix match, `*key*` contains),
    * then `__default__`; a 0/absent limit means no trim. Field names
    * are static per query, so resolution happens at plan build and the
    * trim compiles to a plain substring.
    */
  def maxLenFor(field: String, limits: Seq[(String, Int)]): Option[Int] = {
    val exact = limits.collectFirst { case (k, v) if k == field => v }
    val wild = limits.collectFirst {
      case (k, v)
          if k != "__default__" && k != field && {
            val left = k.startsWith("*"); val right = k.endsWith("*")
            val core = k.stripPrefix("*").stripSuffix("*")
            (left && right && field.contains(core)) ||
            (left && !right && field.endsWith(core)) ||
            (!left && right && field.startsWith(core))
          } =>
        v
    }
    exact
      .orElse(wild)
      .orElse(limits.collectFirst { case ("__default__", v) => v })
      .filter(_ > 0)
  }

  /** normalizeFields (SolrUpdater.php:2399): per value — Unicode
    * normalization, max-length trim — then strict non-indexed-value
    * removal ('' for strings; the PHP list is `[0, 0.0, '']` compared
    * with ===, so numeric entries never match string values), empty
    * fields unset, survivors deduped preserving first occurrence
    * (array_values(array_unique)). `fullrecord` is exempt.
    */
  def normalizeField(
      field: String,
      values: Column,
      limits: Seq[(String, Int)]
  ): Column = {
    val normalized = transform(values, v => {
      val n = graft.functions.MetadataFunctions.normalizeUnicode(v, "NFC")
      maxLenFor(field, limits).map(l => substring(n, 1, l)).getOrElse(n)
    })
    val kept = filter(normalized, v => v =!= "")
    when(coalesce(size(kept), lit(0)) > 0, array_distinct(kept))
      .otherwise(lit(null).cast("array<string>"))
  }

  /** Order-preserving unique for the DuckDB oracle (list_distinct
    * reorders): keep each element at its first occurrence. DuckDB
    * lambda indexes are 1-based, matching list_position.
    */
  private def sqlUniq(l: String): String =
    s"list_filter($l, (x, i) -> list_position($l, x) = i)"

  val all: Seq[Q] = Seq(
    Q(
      // Config-driven field rules (SolrUpdater.php:2440 parseFieldRules +
      // :2491 processFieldRules). The chain below exercises every branch:
      // plain copy, regex-match move (partial-value removal), exact-match
      // delete, default fallback into an existing dst, and exact-match
      // move of a single value. Rules resolve at plan build; the whole
      // chain is one codegen'd map-only projection.
      "solr_field_rules",
      (s, d) => {
        val k = col("p_partkey")
        val author = array(split(col("p_name"), " ").getItem(0))
        val topic = split(col("p_type"), " ")
        val extra = when(k % 4 === 0, lit(null).cast("array<string>"))
          .otherwise(array(lit("keep"), lit("secret")))
        val doc0 = Map(
          "author" -> author,
          "topic" -> topic.cast("array<string>"),
          "extra" -> extra
        )
        val rules = Seq(
          FieldRule("copy", "author", Some("author_facet"), None, None),
          FieldRule("move", "topic", Some("topic_other"), Some("/^S/"), None),
          FieldRule("delete", "extra", None, Some("secret"), None),
          FieldRule("copy", "phantom", Some("author"), None, Some("anonymous")),
          FieldRule("move", "author", Some("author_alt"), Some("anonymous"), None)
        )
        val doc = applyFieldRules(doc0, rules)
        def out(f: String) = array_join(doc(f), "|").as(f)
        Tables
          .part(s, d)
          .select(
            concat(lit("part."), k.cast("string")).as("record_id"),
            out("author"),
            out("author_facet"),
            out("author_alt"),
            out("topic"),
            out("topic_other"),
            out("extra")
          )
      },
      Some {
        // The rule chain reduced over the generator: author gains and
        // then loses 'anonymous' (rules 4+5), topics starting with S
        // move to topic_other, 'secret' is deleted from extra.
        s"""WITH t AS (SELECT p_partkey,
           |  string_split(p_name, ' ')[1] AS w1,
           |  string_split(p_type, ' ') AS topics,
           |  list_filter(string_split(p_type, ' '), v -> v LIKE 'S%') AS tmatch
           |  FROM part)
           |SELECT 'part.' || cast(p_partkey as varchar) AS record_id,
           |  w1 AS author,
           |  w1 AS author_facet,
           |  'anonymous' AS author_alt,
           |  (CASE WHEN len(tmatch) = 0 THEN array_to_string(topics, '|')
           |        WHEN len(list_filter(topics, v -> v NOT LIKE 'S%')) = 0 THEN NULL
           |        ELSE array_to_string(list_filter(topics, v -> v NOT LIKE 'S%'), '|') END) AS topic,
           |  (CASE WHEN len(tmatch) = 0 THEN NULL ELSE array_to_string(tmatch, '|') END) AS topic_other,
           |  (CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE 'keep' END) AS extra
           |FROM t""".stripMargin
      }
    ),
    Q(
      // Institution/building prefixing (SolrUpdater.php:2554
      // addInstitutionToBuilding): the institution code — chosen by the
      // institutionInBuilding mode (driver/none/source/institution/
      // institution\/source) — prefixes every non-empty building value as
      // "code/value"; an empty-string value in the 'building' field
      // becomes the bare code, and an absent 'building' field becomes
      // [code]. Secondary building fields (building_fields config) get
      // values prefixed but no absent/empty backfill beyond ''-passthrough.
      // The predefined-hierarchy (nested array) branch has no analogue in
      // a flat array model and is intentionally out of scope.
      "solr_building_institution",
      (s, d) => {
        val k = col("p_partkey")
        val source = concat(lit("src"), (k % 5).cast("string"))
        val settingsInst = when(k % 10 < 8, concat(lit("Inst"), (k % 4).cast("string")))
          .otherwise(lit(null).cast("string"))
        val driverInst = concat(lit("DrvInst"), (k % 3).cast("string"))
        val mode = element_at(
          array(lit("driver"), lit("none"), lit("source"), lit("institution/source"), lit("institution")),
          (k % 5 + 1).cast("int")
        )
        val code = when(mode === "driver", driverInst)
          .when(mode === "none", lit(""))
          .when(mode === "source", source)
          .when(
            mode === "institution/source",
            concat(coalesce(settingsInst, lit("")), lit("/"), source)
          )
          .otherwise(coalesce(settingsInst, lit("")))
        val building = when(k % 6 === 0, lit(null).cast("array<string>"))
          .when(k % 6 === 1, array(lit("A"), lit(""), lit("B")))
          .otherwise(array(concat(lit("Main"), (k % 9).cast("string")), concat(lit("Branch"), (k % 7).cast("string"))))
        val buildingSub = when(k % 3 === 0, lit(null).cast("array<string>"))
          .otherwise(array(concat(lit("S"), (k % 9).cast("string")), lit("")))
        def prefixed(values: Column, isBuilding: Boolean) = {
          val mapped = transform(
            values,
            v =>
              when(v =!= "", concat(code, lit("/"), v))
                .otherwise(if (isBuilding) code else v)
          )
          val withAbsent =
            if (isBuilding) when(values.isNull, array(code)).otherwise(mapped)
            else mapped
          when(code === "", values).otherwise(withAbsent)
        }
        Tables
          .part(s, d)
          .select(
            concat(lit("part."), k.cast("string")).as("record_id"),
            mode.as("mode"),
            code.as("institution_code"),
            array_join(prefixed(building, isBuilding = true), "|").as("building"),
            array_join(prefixed(buildingSub, isBuilding = false), "|").as("building_sub")
          )
      },
      Some {
        s"""WITH t AS (SELECT p_partkey,
           |  'src' || cast(p_partkey % 5 as varchar) AS src,
           |  (CASE WHEN p_partkey % 10 < 8 THEN 'Inst' || cast(p_partkey % 4 as varchar) END) AS sinst,
           |  'DrvInst' || cast(p_partkey % 3 as varchar) AS dinst,
           |  (['driver','none','source','institution/source','institution'])[p_partkey % 5 + 1] AS mode
           |  FROM part),
           |c AS (SELECT *,
           |  (CASE mode WHEN 'driver' THEN dinst WHEN 'none' THEN ''
           |        WHEN 'source' THEN src
           |        WHEN 'institution/source' THEN coalesce(sinst, '') || '/' || src
           |        ELSE coalesce(sinst, '') END) AS code,
           |  (CASE WHEN p_partkey % 6 = 0 THEN NULL
           |        WHEN p_partkey % 6 = 1 THEN ['A', '', 'B']
           |        ELSE ['Main' || cast(p_partkey % 9 as varchar), 'Branch' || cast(p_partkey % 7 as varchar)] END) AS bld,
           |  (CASE WHEN p_partkey % 3 = 0 THEN NULL
           |        ELSE ['S' || cast(p_partkey % 9 as varchar), ''] END) AS bsub
           |  FROM t)
           |SELECT 'part.' || cast(p_partkey as varchar) AS record_id,
           |  mode, code AS institution_code,
           |  (CASE WHEN code = '' THEN array_to_string(bld, '|')
           |        WHEN bld IS NULL THEN code
           |        ELSE array_to_string(list_transform(bld, v -> CASE WHEN v != '' THEN code || '/' || v ELSE code END), '|') END) AS building,
           |  (CASE WHEN code = '' THEN array_to_string(bsub, '|')
           |        ELSE array_to_string(list_transform(bsub, v -> CASE WHEN v != '' THEN code || '/' || v ELSE v END), '|') END) AS building_sub
           |FROM c""".stripMargin
      }
    ),
    Q(
      // Field normalization (SolrUpdater.php:2399 normalizeFields +
      // :3213 trimFieldLength): NFC per value, wildcard-configured max
      // lengths (exact key > first matching wildcard in config order >
      // __default__; 0 disables), '' removal (the strict non-indexed
      // check), empty fields unset, order-preserving dedupe AFTER the
      // trim (so values colliding post-trim merge), fullrecord exempt.
      "solr_normalize_fields",
      (s, d) => {
        val k = col("p_partkey")
        val limits = Seq(
          "title_*" -> 20,
          "*_keys" -> 10,
          "*escript*" -> 15,
          "allfields" -> 0,
          "__default__" -> 28
        )
        val combining = "Cafe\u0301 " // decomposed e + combining acute; NFC composes to e-acute
        val titleFull = array(col("p_name"))
        val titleNfc = array(concat(lit(combining), col("p_name")))
        val workKeys = array(concat(lit("WK "), col("p_name")))
        val descr = array(concat(lit("About "), col("p_name")))
        val author = array(
          col("p_name"),
          concat(col("p_name"), lit("XTRA")),
          lit(""),
          split(col("p_name"), " ").getItem(0)
        )
        val empties = array(lit(""), lit(""))
        val allfields = array(concat(col("p_name"), lit(" "), col("p_type")))
        def out(f: String, c: Column) =
          array_join(normalizeField(f, c, limits), "|").as(f)
        Tables
          .part(s, d)
          .select(
            concat(lit("part."), k.cast("string")).as("record_id"),
            out("title_full", titleFull),
            out("title_nfc", titleNfc),
            out("work_keys", workKeys),
            out("record_description", descr),
            out("author", author),
            out("empties", empties),
            out("allfields", allfields),
            // fullrecord bypasses normalization entirely (the raw
            // combining sequence survives un-composed).
            concat(lit(combining), col("p_name")).as("fullrecord")
          )
      },
      Some {
        val uniq = sqlUniq("l2")
        s"""WITH t AS (SELECT p_partkey, p_name, p_type,
           |  'Cafe' || chr(769) AS comb
           |  FROM part),
           |a AS (SELECT p_partkey, p_name, p_type, comb,
           |  list_transform([p_name, p_name || 'XTRA', '', string_split(p_name, ' ')[1]],
           |    x -> substr(nfc_normalize(x), 1, 28)) AS l1
           |  FROM t),
           |b AS (SELECT *, list_filter(l1, v -> v != '') AS l2 FROM a)
           |SELECT 'part.' || cast(p_partkey as varchar) AS record_id,
           |  substr(nfc_normalize(p_name), 1, 20) AS title_full,
           |  substr(nfc_normalize(comb || ' ' || p_name), 1, 20) AS title_nfc,
           |  substr(nfc_normalize('WK ' || p_name), 1, 10) AS work_keys,
           |  substr(nfc_normalize('About ' || p_name), 1, 15) AS record_description,
           |  array_to_string($uniq, '|') AS author,
           |  cast(NULL as varchar) AS empties,
           |  nfc_normalize(p_name || ' ' || p_type) AS allfields,
           |  comb || ' ' || p_name AS fullrecord
           |FROM b""".stripMargin
      }
    ),
    Q(
      // Solr id rewriting (SolrUpdater.php:3151 createSolrId): split the
      // record id on the FIRST dot into source + local id; a source with
      // indexUnprefixedIds indexes the bare local id, a solrIdPrefix
      // replaces the source prefix, anything else — including dotless
      // ids — passes through unchanged. Map-only.
      "solr_id_rewrite",
      (s, d) => {
        val k = col("o_orderkey")
        val recordId = when(k % 5 === 0, concat(lit("alpha.A"), k.cast("string")))
          .when(k % 5 === 1, concat(lit("beta.B"), k.cast("string")))
          .when(k % 5 === 2, concat(lit("gamma.G"), k.cast("string")))
          .when(k % 5 === 3, concat(lit("noprefix"), k.cast("string")))
          .otherwise(concat(lit("delta.D."), k.cast("string")))
        // per-source settings: alpha → solrIdPrefix=ALPHA,
        // beta → indexUnprefixedIds, delta → solrIdPrefix=DX,
        // gamma/unknown → passthrough.
        val source = substring_index(recordId, ".", 1)
        val local = when(recordId.contains("."), expr("substring(record_id, instr(record_id, '.') + 1)"))
        val solrId = when(local.isNull, recordId)
          .when(source === "alpha", concat(lit("ALPHA."), local))
          .when(source === "beta", local)
          .when(source === "delta", concat(lit("DX."), local))
          .otherwise(recordId)
        Tables
          .orders(s, d)
          .select(k.as("o_orderkey"), recordId.as("record_id"))
          .select(col("o_orderkey"), col("record_id"), solrId.as("solr_id"))
      },
      Some {
        s"""WITH t AS (SELECT o_orderkey,
           |  (CASE WHEN o_orderkey % 5 = 0 THEN 'alpha.A' || cast(o_orderkey as varchar)
           |        WHEN o_orderkey % 5 = 1 THEN 'beta.B' || cast(o_orderkey as varchar)
           |        WHEN o_orderkey % 5 = 2 THEN 'gamma.G' || cast(o_orderkey as varchar)
           |        WHEN o_orderkey % 5 = 3 THEN 'noprefix' || cast(o_orderkey as varchar)
           |        ELSE 'delta.D.' || cast(o_orderkey as varchar) END) AS record_id
           |  FROM orders),
           |p AS (SELECT o_orderkey, record_id,
           |  string_split(record_id, '.')[1] AS src,
           |  (CASE WHEN instr(record_id, '.') > 0
           |        THEN substr(record_id, instr(record_id, '.') + 1) END) AS local
           |  FROM t)
           |SELECT o_orderkey, record_id,
           |  (CASE WHEN local IS NULL THEN record_id
           |        WHEN src = 'alpha' THEN 'ALPHA.' || local
           |        WHEN src = 'beta' THEN local
           |        WHEN src = 'delta' THEN 'DX.' || local
           |        ELSE record_id END) AS solr_id
           |FROM p""".stripMargin
      }
    ),
    Q(
      // Merged-record → member copy (SolrUpdater.php:2718
      // copyMergedDataToMembers): configured fields of the dedup group's
      // merged record are appended to every member with an
      // order-preserving dedupe (array_values(array_unique)). The merged
      // side is one row per group — dimension-sized, broadcast — so the
      // corpus never shuffles; at 1000-executor scale the same shape
      // holds because groups are bounded (dedup group size is capped
      // upstream by Dedup's heavy-key guard).
      "solr_member_copy",
      (s, d) => {
        val k = col("p_partkey")
        val g = (k % 499).as("g")
        val genre = array(col("p_brand"))
        val era = when(k % 3 === 0, lit(null).cast("array<string>"))
          .otherwise(array(concat(lit("E"), (k % 7).cast("string"))))
        val members = Tables
          .part(s, d)
          .select(k.as("p_partkey"), g, genre.as("genre"), era.as("era"))
        val merged = members
          .groupBy("g")
          .agg(
            array_sort(array_distinct(flatten(collect_list(col("genre")))))
              .as("m_genre"),
            array_sort(
              array_distinct(
                flatten(collect_list(coalesce(col("era"), lit(Array.empty[String]))))
              )
            ).as("m_era")
          )
        // An empty merged field copies nothing (the reference's
        // `if (empty($merged[$copyField])) continue`) — unreachable with
        // this generator (every group has a non-null member) but kept
        // for fidelity.
        def copied(member: Column, m: Column) =
          when(coalesce(size(m), lit(0)) === 0, member)
            .otherwise(
              array_distinct(concat(coalesce(member, lit(Array.empty[String])), m))
            )
        members
          .join(broadcast(merged), "g")
          .select(
            col("p_partkey"),
            col("g"),
            array_join(copied(col("genre"), col("m_genre")), "|").as("genre"),
            array_join(copied(col("era"), col("m_era")), "|").as("era")
          )
      },
      Some {
        val genreU = sqlUniq("list_concat(genre, m_genre)")
        val eraU = sqlUniq("list_concat(coalesce(era, []), m_era)")
        s"""WITH t AS (SELECT p_partkey, p_partkey % 499 AS g,
           |  [p_brand] AS genre,
           |  (CASE WHEN p_partkey % 3 = 0 THEN NULL
           |        ELSE ['E' || cast(p_partkey % 7 as varchar)] END) AS era
           |  FROM part),
           |m AS (SELECT g,
           |  list_sort(list_distinct(flatten(list(genre)))) AS m_genre,
           |  list_sort(list_distinct(flatten(list(coalesce(era, []))))) AS m_era
           |  FROM t GROUP BY g)
           |SELECT p_partkey, t.g,
           |  array_to_string($genreU, '|') AS genre,
           |  array_to_string($eraU, '|') AS era
           |FROM t JOIN m ON t.g = m.g""".stripMargin
      }
    ),
    Q(
      // Parent → child copy (SolrUpdater.php:2749 copyParentDataToChild):
      // configured fields of the host/parent record append to the child
      // WITHOUT dedupe ("this may add duplicate fields"); an empty parent
      // field copies nothing, an empty child field becomes exactly the
      // parent's values. The parent lookup is an equi-join on the parent
      // key — co-partitionable at scale, broadcast when the parent set is
      // dimension-sized.
      "solr_parent_copy",
      (s, d) => {
        val parents = Tables
          .customer(s, d)
          .select(
            col("c_custkey"),
            array(concat(lit("B"), (col("c_custkey") % 7).cast("string"))).as("p_building"),
            when(col("c_custkey") % 5 === 0, lit(null).cast("array<string>"))
              .otherwise(array(concat(lit("Coll"), (col("c_custkey") % 5).cast("string"))))
              .as("p_collection")
          )
        val children = Tables
          .orders(s, d)
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            when(col("o_orderkey") % 4 === 0, lit(null).cast("array<string>"))
              .otherwise(array(concat(lit("CB"), (col("o_orderkey") % 3).cast("string"))))
              .as("c_building"),
            array(lit("CC")).as("c_collection")
          )
        def copied(child: Column, parent: Column) =
          when(parent.isNull, child)
            .when(child.isNull, parent)
            .otherwise(concat(child, parent))
        children
          .join(parents, col("o_custkey") === col("c_custkey"))
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            array_join(copied(col("c_building"), col("p_building")), "|").as("building"),
            array_join(copied(col("c_collection"), col("p_collection")), "|").as("collection")
          )
      },
      Some {
        s"""SELECT o_orderkey, o_custkey,
           |  (CASE WHEN o_orderkey % 4 = 0 THEN 'B' || cast(c_custkey % 7 as varchar)
           |        ELSE 'CB' || cast(o_orderkey % 3 as varchar) || '|B' || cast(c_custkey % 7 as varchar) END) AS building,
           |  (CASE WHEN c_custkey % 5 = 0 THEN 'CC'
           |        ELSE 'CC|Coll' || cast(c_custkey % 5 as varchar) END) AS collection
           |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin
      }
    ),
    Q(
      // The fieldRules chain built through the TEXTUAL RULE GRAMMAR
      // (SolrUpdater.php:2440 parseFieldRules) — `solr_field_rules`
      // above certifies the evaluator over directly-constructed
      // FieldRule values; this one routes a 6-rule chain through the
      // real parser (quoted match=/default= tokens, /regex/i syntax)
      // and covers the branches the other chain doesn't: copy with
      // exact match, copy with /regex/i match, copy with the
      // empty-source default fallback, and delete draining a source to
      // the unset state. '<unset>' marks the PHP key-removed state as
      // distinct from an empty field.
      "solr_field_rules_parsed",
      (s, d) => {
        val k = col("p_partkey")
        val doc: Map[String, org.apache.spark.sql.Column] = Map(
          "title" -> array(concat(lit("Title "), (k % 50).cast("string"))),
          "fmt" -> when(k % 3 === 0, array(lit("Book"), lit("eBook")))
            .when(k % 3 === 1, array(lit("Map")))
            .otherwise(array().cast("array<string>")),
          "status" -> when(k % 5 === 0, array(lit("deleted"), lit("active")))
            .otherwise(array(lit("active"))),
          "tmp" -> when(k % 7 === 0, array(lit("x"))).otherwise(array(lit("x"), lit("y")))
        )
        val rules = Seq(
          "copy fmt fmt_book match=\"Book\"",
          "copy fmt fmt_e match=\"/^e/i\"",
          "copy fmt fmt_all default=\"unknown\"",
          "move title title_moved",
          "delete status match=\"deleted\"",
          "delete tmp match=\"x\""
        ).map(parseRule)
        val out = applyFieldRules(doc, rules)
        def c(f: String) =
          coalesce(array_join(out.getOrElse(f, lit(null).cast("array<string>")), "|"), lit("<unset>"))
            .as(f)
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            c("title"),
            c("title_moved"),
            c("fmt"),
            c("fmt_book"),
            c("fmt_e"),
            c("fmt_all"),
            c("status"),
            c("tmp")
          )
      },
      Some(
        """SELECT p_partkey,
          |  '<unset>' AS title,
          |  'Title ' || cast(p_partkey % 50 as varchar) AS title_moved,
          |  (CASE WHEN p_partkey % 3 = 0 THEN 'Book|eBook'
          |        WHEN p_partkey % 3 = 1 THEN 'Map' ELSE '' END) AS fmt,
          |  (CASE WHEN p_partkey % 3 = 0 THEN 'Book' ELSE '<unset>' END) AS fmt_book,
          |  (CASE WHEN p_partkey % 3 = 0 THEN 'eBook' ELSE '<unset>' END) AS fmt_e,
          |  (CASE WHEN p_partkey % 3 = 0 THEN 'Book|eBook'
          |        WHEN p_partkey % 3 = 1 THEN 'Map' ELSE 'unknown' END) AS fmt_all,
          |  'active' AS status,
          |  (CASE WHEN p_partkey % 7 = 0 THEN '<unset>' ELSE 'y' END) AS tmp
          |FROM part""".stripMargin
      )
    )
  )
}
