package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchical archive (EAD/EAD3-style) record splitting.
  *
  * Spark-native re-expression of the reference's EAD splitter (reference:
  * Splitter/Ead.php setData:150 — records are `archdesc` plus every
  * descendant carrying a @level — and getNextRecord:180 — each split
  * record gets a generated unit identifier, the archive-level context
  * (id/title/subtitle + a zero-padded document-order sequence), its
  * parent's id and title with the unit-id prefix rule, and inherits the
  * archive-level access restriction).
  *
  * The reference walks one DOM per file; at scale the hierarchy is a
  * DataFrame of component rows instead, and the whole split is two
  * hash-partitioned operations — ONE window for document-order sequence
  * numbers and ONE self-equi-join on (archive, parent unit) for the
  * parent pointers. No tree walk, no driver-side recursion; a 100 TB
  * archive corpus shuffles on archive_id and nothing else.
  */
object EadSplitter {

  /** Split archives + components into flat records.
    *
    * `archives`: archive_id, archive_title, archive_subtitle,
    * access_restrict. `components`: archive_id, unit_id,
    * parent_unit_id (null = direct child of the archive root), level,
    * title, ord (document position of the component within its archive).
    *
    * Output: one record per archive root (level 'archdesc') and per
    * component, with record_id `<archive>` / `<archive>_<unit>`,
    * parent_id/parent_title (unit-id-prefixed for series/subseries/file/
    * item parents, as the reference does when prependParentTitleWithUnitId
    * is on), sequence = lpad(position, 7, '0'), and the archive's access
    * restriction inherited by every non-root record.
    */
  def splitArchive(archives: DataFrame, components: DataFrame): DataFrame = {
    val rootRows = archives.select(
      col("archive_id"),
      col("archive_id").as("record_id"),
      lit("archdesc").as("level"),
      col("archive_title").as("title"),
      lit(null).cast("string").as("parent_unit_id"),
      lit(-1L).as("ord"),
      lit(true).as("is_root")
    )
    val childRows = components.select(
      col("archive_id"),
      concat(col("archive_id"), lit("_"), col("unit_id")).as("record_id"),
      col("level"),
      col("title"),
      col("parent_unit_id"),
      col("ord").cast("long").as("ord"),
      lit(false).as("is_root")
    )
    val ordered = rootRows
      .unionByName(childRows)
      .withColumn(
        "sequence",
        lpad(
          row_number()
            .over(Window.partitionBy("archive_id").orderBy("ord", "record_id"))
            .cast("string"),
          7,
          "0"
        )
      )
    // Parent lookup: one left equi-join back onto the components (the
    // parent of a parentless component is the archive root itself).
    val parents = components.select(
      col("archive_id"),
      col("unit_id").as("parent_unit_id"),
      col("title").as("p_title")
    )
    val withParent = ordered
      .join(parents, Seq("archive_id", "parent_unit_id"), "left")
    val prependLevels = Seq("series", "subseries", "file", "item")
    withParent
      .join(
        archives.select(
          col("archive_id"),
          col("archive_title"),
          col("archive_subtitle"),
          col("access_restrict").as("arch_access")
        ),
        Seq("archive_id")
      )
      .select(
        col("record_id"),
        col("level"),
        col("title"),
        when(col("is_root"), lit(""))
          .when(col("parent_unit_id").isNull, col("archive_id"))
          .otherwise(concat(col("archive_id"), lit("_"), col("parent_unit_id")))
          .as("parent_id"),
        when(col("is_root"), lit(""))
          .when(col("parent_unit_id").isNull, col("archive_title"))
          .when(
            col("level").isin(prependLevels: _*),
            concat(col("parent_unit_id"), lit(" "), col("p_title"))
          )
          .otherwise(col("p_title"))
          .as("parent_title"),
        col("archive_id"),
        col("archive_title"),
        col("archive_subtitle"),
        col("sequence"),
        col("arch_access").as("access_restrict")
      )
  }
}

/** EAD3 archive splitting (reference: Splitter/Ead3.php — the subclass
  * overrides on top of Splitter/Ead.php that the base [[EadSplitter]]
  * does not model):
  *
  *  - `unitIdLabel`-gated unit-id selection (Ead3.php:57,:82): the
  *    archive id is the first archdesc unitid with an `identifier`
  *    attribute whose `label` matches the configured value, falling
  *    back to the first with an identifier (:111); each record's unit
  *    id is the first LABEL-MATCHING identifier that differs from the
  *    archive id — matching ids equal to the archive id are kept only
  *    if nothing else matches (:162 — the `!= archiveId` scan), then
  *    the first-identifier fallback, then `<archive>_<position>`.
  *  - `nonInheritedFields` did exclusion (:65,:213-223): ancestor did
  *    content is merged into each record nearest-ancestor-first with
  *    dao/daoset (or a configured list) excluded, and an element name
  *    already present never overwritten (appendXML merge semantics —
  *    own fields win, then the nearest ancestor's).
  *  - parent ids come from the parent's OWN generated id (:230 — the
  *    add-data round trip), parent titles fall back unittitle → label
  *    attribute → parent id (:247-259), with the configured unit-id
  *    text prefix (:261, getParentUnitId:330).
  *  - the add-data parent chain (:270-290): each record carries its
  *    direct parent plus every series/subseries ancestor above it —
  *    the PHP accumulates these by copying the parent's add-data.
  *
  * Spark-native shape: ancestor chains are computed by POINTER
  * DOUBLING over the (node, parent) edges — ceil(log2(maxDepth))
  * self-equi-joins instead of a per-record tree walk, so a 100 TB
  * corpus of archives resolves full chains in 4 shuffles (EAD nesting
  * is bounded by the c01..c12 tag convention). Everything else is one
  * window (document-order sequence) and hash equi-joins on
  * (archive, node) — no recursion, no driver-side state.
  *
  * Model boundary: `parent_key` must reference another RECORD node
  * (or be null for the dsc's direct children). The reference's corner
  * where a record's direct parent is a level-less NON-record `<c>`
  * element (Ead3.php:236-247 then generates a parent id from that
  * node's did without label gating) is not representable in the
  * flattened model — the upstream flattener assigns such children the
  * nearest record ancestor, which is also what the reference's own
  * fixtures exercise.
  */
object Ead3Splitter {

  import org.apache.spark.sql.Column

  val DefaultNonInherited: Seq[String] = Seq("dao", "daoset")
  private val ChainLevels = Seq("series", "subseries")

  // Every frame splitArchive persists (the record frame, the edge seed,
  // and each pointer-doubling round — 6+ per invocation) is tracked here
  // so long-running library use has a SCOPED release instead of the
  // global spark.catalog.clearCache() convention (ADVICE r7). Verify /
  // Bench still clearCache per query; other hosts call [[releaseCache]]
  // once the returned plan is materialized. WEAK references: the
  // registry must not itself become a driver-side leak — a host that
  // relies on clearCache() would otherwise accumulate every
  // invocation's plan trees for the JVM lifetime (round-8 review).
  // Entries whose plans are no longer reachable are GC'd; their cached
  // blocks are owned by Spark's cache manager either way.
  private val cached =
    scala.collection.mutable.ArrayBuffer.empty[java.lang.ref.WeakReference[DataFrame]]

  private def trackPersist(df: DataFrame): DataFrame = synchronized {
    cached += new java.lang.ref.WeakReference(df)
    df.persist()
  }

  /** Unpersist every still-reachable frame cached by prior
    * [[splitArchive]] calls, and drop collected entries. Call AFTER
    * materializing the returned DataFrame (the plan reads the caches
    * while executing). Scope caveat: the registry is object-global, so
    * releasing while ANOTHER splitArchive plan is still executing
    * de-optimizes (not corrupts) that plan — serialize calls or fall
    * back to spark.catalog.clearCache() semantics if running archives
    * concurrently.
    */
  def releaseCache(): Unit = synchronized {
    cached.foreach(r => Option(r.get()).foreach(_.unpersist(blocking = false)))
    cached.clear()
  }

  /** Empty array with the element type of `arr` (slice of length 0). */
  private def emptyLike(arr: Column): Column = slice(arr, lit(1), lit(0))

  /** First-occurrence-by-name fold — appendXML's merge-with-same-name
    * semantics over the flattened (name, value) field model.
    */
  private def firstWinsByName(fields: Column): Column =
    aggregate(
      fields,
      emptyLike(fields),
      (acc, x) =>
        when(exists(acc, y => y("name") === x("name")), acc)
          .otherwise(concat(acc, array(x)))
    )

  /** The per-record unit id selection (Ead3.php getNextRecord:141-176),
    * minus the position fallback (null when no identifier exists).
    */
  private def unitIdOf(us: Column, unitIdLabel: Option[String], archiveId: Column): Column = {
    val withIdent = filter(us, u => u("identifier") =!= "")
    val ids = transform(withIdent, u => u("identifier"))
    val matched = unitIdLabel match {
      case None    => ids
      case Some(l) => transform(filter(withIdent, u => u("label") === l), u => u("identifier"))
    }
    val nonArch = filter(matched, i => i =!= archiveId)
    coalesce(
      get(nonArch, lit(0)),
      when(size(matched) > 0, archiveId),
      get(ids, lit(0))
    )
  }

  /** The archive-level id selection (Ead3.php setData:101-117): first
    * label-matching identifier, else the first identifier.
    */
  def archiveIdOf(us: Column, unitIdLabel: Option[String]): Column = {
    val withIdent = filter(us, u => u("identifier") =!= "")
    val ids = transform(withIdent, u => u("identifier"))
    val byLabel = unitIdLabel match {
      case None    => get(ids, lit(0))
      case Some(l) => get(transform(filter(withIdent, u => u("label") === l), u => u("identifier")), lit(0))
    }
    coalesce(byLabel, get(ids, lit(0)), lit(""))
  }

  /** Split EAD3 archives + components into flat records.
    *
    * `archives`: archive_key, unit_ids array<struct<identifier,label>>,
    * archive_title, did_fields array<struct<name,value>>, bibliography,
    * access_restrict.
    * `components`: archive_key, node_key (structural id), parent_key
    * (null = direct child of the dsc), unit_ids, unit_id_text (text
    * content of the first unitid, used for the parent-title prefix),
    * level, title, title_label, ord (document position), did_fields,
    * access_restrict (own, '' when absent).
    */
  def splitArchive(
      archives: DataFrame,
      components: DataFrame,
      unitIdLabel: Option[String] = None,
      nonInherited: Seq[String] = DefaultNonInherited,
      prependParentTitleWithUnitId: Boolean = false,
      maxDepth: Int = 12
  ): DataFrame = {
    val arch = archives.select(
      col("archive_key"),
      archiveIdOf(col("unit_ids"), unitIdLabel).as("archive_id"),
      col("archive_title"),
      col("did_fields").as("arch_did"),
      col("bibliography").as("arch_bib"),
      col("access_restrict").as("arch_access")
    )

    // Document-order positions (currentPos) count the archdesc root as 1.
    val rootRows = arch.select(
      col("archive_key"),
      lit("__root__").as("node_key"),
      lit(null).cast("string").as("parent_key"),
      emptyLike(
        array(struct(lit("").as("identifier"), lit("").as("label")))
      ).as("unit_ids"),
      lit("").as("unit_id_text"),
      lit("archdesc").as("level"),
      col("archive_title").as("title"),
      lit("").as("title_label"),
      lit(-1L).as("ord"),
      col("arch_did").as("did_fields"),
      col("arch_access").as("access_restrict"),
      lit(true).as("is_root")
    )
    val childRows = components
      .withColumn("ord", col("ord").cast("long"))
      .withColumn("is_root", lit(false))
    val ordered = rootRows
      .unionByName(childRows)
      .withColumn(
        "pos",
        row_number().over(Window.partitionBy("archive_key").orderBy("ord", "node_key"))
      )
      .join(arch, Seq("archive_key"))

    // Generated record ids (the add-data identifier): archive id for the
    // root and for components whose selected unit id IS the archive id;
    // `<archive>_<pos>` when no identifier exists at all.
    val unitId = unitIdOf(col("unit_ids"), unitIdLabel, col("archive_id"))
    // Persisted: feeds the ancestor-decoration join AND the final
    // record-grain select, and its lineage carries the window + arch
    // join (plus whatever synthesis produced the inputs).
    val recs = trackPersist(
      ordered.withColumn(
        "record_id",
        when(col("is_root"), col("archive_id"))
          .when(unitId.isNull, concat(col("archive_id"), lit("_"), col("pos").cast("string")))
          .when(unitId === col("archive_id"), col("archive_id"))
          .otherwise(concat(col("archive_id"), lit("_"), unitId))
      )
    )

    // Ancestor chains, bottom-up (nearest first), by pointer doubling:
    // chain_k holds the ancestors within 2^k steps and jump_k the 2^k-th
    // ancestor; each round composes with itself. The root is not in the
    // edge set — chains stop at the dsc's direct children.
    //
    // Every round is PERSISTED: round k joins round k−1 to itself, so an
    // unpersisted loop re-derives the edge seed 2^rounds times (the
    // first .explain showed 16 redundant scans of the component source).
    // With the lazy persist each round materializes once and both join
    // sides read the cache; all persists are tracked — release scoped
    // via releaseCache(), or globally via spark.catalog.clearCache()
    // (the bandTableOf convention — Verify/Bench already do).
    val rounds = math.max(1, math.ceil(math.log(maxDepth.toDouble) / math.log(2.0)).toInt)
    // One edge row per node key: duplicate node_key rows (possible in
    // degenerate inputs) would otherwise double every chain entry they
    // appear in through the explode/re-collect below.
    var cur = components
      .select(
        col("archive_key"),
        col("node_key"),
        col("parent_key").as("jump"),
        when(col("parent_key").isNull, emptyLike(array(lit(""))))
          .otherwise(array(col("parent_key"))).as("chain")
      )
      .dropDuplicates("archive_key", "node_key")
    cur = trackPersist(cur)
    for (_ <- 1 to rounds) {
      val o = cur.select(
        col("archive_key").as("o_archive"),
        col("node_key").as("o_key"),
        col("jump").as("o_jump"),
        col("chain").as("o_chain")
      )
      cur = cur
        .join(
          o,
          cur("archive_key") === o("o_archive") && cur("jump") === o("o_key"),
          "left"
        )
        .select(
          cur("archive_key"),
          cur("node_key"),
          o("o_jump").as("jump"),
          when(o("o_chain").isNull, cur("chain"))
            .otherwise(concat(cur("chain"), o("o_chain"))).as("chain")
        )
      cur = trackPersist(cur)
    }

    // Decorate each chain entry with the ancestor's generated id, title
    // fallback chain, and level: explode, one equi-join, re-collect in
    // chain order.
    val parentTitleOf: Column => Column = rid => {
      val base = coalesce(
        when(col("a_title") =!= "", col("a_title")),
        when(col("a_title_label") =!= "", col("a_title_label")),
        rid
      )
      if (prependParentTitleWithUnitId)
        when(col("a_uit") =!= "", concat(col("a_uit"), lit(" "), base)).otherwise(base)
      else base
    }
    val ancInfo = recs
      .filter(!col("is_root"))
      .select(
        col("archive_key").as("a_archive"),
        col("node_key").as("a_key"),
        col("record_id").as("a_rid"),
        col("level").as("a_level"),
        col("title").as("a_title"),
        col("title_label").as("a_title_label"),
        col("unit_id_text").as("a_uit"),
        col("did_fields").as("a_did")
      )
      .withColumn("a_ptitle", parentTitleOf(col("a_rid")))
      // Same duplicate-key guard as the edge seed: an ancestor key must
      // decorate each chain entry exactly once.
      .dropDuplicates("a_archive", "a_key")
    val chains = cur
      .select(col("archive_key"), col("node_key"), posexplode(col("chain")).as(Seq("cpos", "ckey")))
      .join(
        ancInfo,
        col("archive_key") === col("a_archive") && col("ckey") === col("a_key")
      )
      .groupBy(col("archive_key"), col("node_key"))
      .agg(
        array_sort(
          collect_list(
            struct(
              col("cpos"),
              col("a_rid").as("rid"),
              col("a_ptitle").as("ptitle"),
              col("a_level").as("lvl"),
              col("a_did").as("did")
            )
          )
        ).as("anc")
      )

    val withChain = recs
      .join(chains, Seq("archive_key", "node_key"), "left")
      .withColumn(
        "anc",
        coalesce(
          col("anc"),
          emptyLike(
            array(
              struct(
                lit(0).as("cpos"),
                lit("").as("rid"),
                lit("").as("ptitle"),
                lit("").as("lvl"),
                col("did_fields").as("did")
              )
            )
          )
        )
      )

    // add-data parent list: the direct parent plus every series/subseries
    // ancestor above it (the PHP accumulates exactly this by copying the
    // parent's add-data parent elements).
    val chainEntries = concat(
      slice(col("anc"), lit(1), lit(1)),
      filter(
        slice(col("anc"), lit(2), greatest(size(col("anc")) - 1, lit(0))),
        a => a("lvl").isin(ChainLevels: _*)
      )
    )
    val firstAnc = get(col("anc"), lit(0))

    // Inherited did content: own fields, then each ancestor's
    // nearest-first, then the archdesc's — nonInherited names excluded
    // from everything inherited, first occurrence of a name wins.
    val inheritedDids = firstWinsByName(
      concat(
        col("did_fields"),
        filter(
          concat(flatten(transform(col("anc"), a => a("did"))), col("arch_did")),
          f => !f("name").isin(nonInherited: _*)
        )
      )
    )

    def inheritRecordLevel(name: String, own: Column, archVal: Column): Column =
      if (nonInherited.contains(name)) when(own =!= "", own).otherwise(lit(""))
      else when(own =!= "", own).otherwise(archVal)

    withChain.select(
      col("record_id"),
      col("level"),
      col("title"),
      when(col("is_root"), lit(""))
        .when(size(col("anc")) > 0, firstAnc("rid"))
        .otherwise(col("archive_id"))
        .as("parent_id"),
      when(col("is_root"), lit(""))
        .when(size(col("anc")) > 0, firstAnc("ptitle"))
        .otherwise(col("archive_title"))
        .as("parent_title"),
      when(col("is_root"), lit(""))
        .when(size(col("anc")) > 0, firstAnc("lvl"))
        .otherwise(lit("archive"))
        .as("parent_level"),
      when(col("is_root"), lit(""))
        .otherwise(
          array_join(
            transform(
              when(size(col("anc")) > 0, chainEntries).otherwise(
                array(
                  struct(
                    lit(0).as("cpos"),
                    col("archive_id").as("rid"),
                    col("archive_title").as("ptitle"),
                    lit("archive").as("lvl"),
                    emptyLike(col("did_fields")).as("did")
                  )
                )
              ),
              a => concat_ws("~", a("rid"), a("ptitle"), a("lvl"))
            ),
            "|"
          )
        )
        .as("parent_chain_csv"),
      col("archive_id"),
      col("archive_title"),
      lpad(col("pos").cast("string"), 7, "0").as("sequence"),
      array_join(
        transform(
          when(col("is_root"), col("did_fields")).otherwise(inheritedDids),
          f => concat(f("name"), lit("="), f("value"))
        ),
        "|"
      ).as("did_csv"),
      when(col("is_root"), col("access_restrict"))
        .otherwise(
          inheritRecordLevel("accessrestrict", col("access_restrict"), col("arch_access"))
        )
        .as("access_restrict"),
      when(col("is_root"), col("arch_bib"))
        .otherwise(inheritRecordLevel("bibliography", lit(""), col("arch_bib")))
        .as("bibliography")
    )
  }
}

/** EAD3 record extraction (reference: Record/Ead3.php toSolrArray:125).
  *
  * Distinctives vs the EAD split (above) and the other profiles:
  * subtitle-prepended display title with `title_sort =
  * lower(stripPunctuation(title))` — no article strip:162; scopecontent
  * paragraphs joined with '   /   ':285; author name elements whose
  * `part` children are flattened with empties dropped, controlaccess
  * before origination:342; controlaccess subject/geogname terms by part
  * value vs by identifier attribute:414; genreform-part format with
  * @level fallback:181; langmaterial langcode attributes:448; physical
  * extents excluding bare '-':467; first thumbnail-typed dao href with
  * did before daoset:483.
  */
object Ead3Queries {

  private def partsOf(els: org.apache.spark.sql.Column, kinds: Seq[String]) = {
    import org.apache.spark.sql.functions._
    filter(
      flatten(
        transform(
          filter(els, el => el.getField("kind").isin(kinds.map(lit(_)): _*)),
          el => transform(el.getField("parts"), p => trim(p))
        )
      ),
      p => p =!= ""
    )
  }

  val all: Seq[Q] = Seq(
    Q(
      "ead3_extract",
      (s, d) => {
        val k = col("p_partkey")
        val ks = k.cast("string")
        val name = col("p_name")
        val e = lit("")
        val doc = Tables
          .part(s, d)
          .select(
            concat(lit("e3-"), ks).as("record_id"),
            name.as("title_short"),
            when(k % 3 === 0, concat(lit("Collection "), (k % 7).cast("string")))
              .when(k % 5 === 0, name) // equal to title_short: not prepended
              .otherwise(e).as("title_sub"),
            array(concat(lit("Scope para one for "), ks),
              concat(lit("Scope para two for "), ks)).as("scope_ps"),
            array(
              struct(lit("ca_name").as("kind"),
                array(concat(lit("Author "), ks), e).as("parts")),
              struct(lit("ca_pers").as("kind"),
                array(when(k % 2 === 0, concat(lit("Person "), ks)).otherwise(e)).as("parts")),
              struct(lit("ca_corp").as("kind"),
                array(concat(lit("Corp "), (k % 9).cast("string"))).as("parts")),
              struct(lit("or_name").as("kind"),
                array(concat(lit("Origin "), ks)).as("parts")),
              struct(lit("or_corp").as("kind"),
                array(when(k % 4 === 0, lit("Origin Corp")).otherwise(e)).as("parts"))
            ).as("author_els"),
            array(
              struct(concat(lit("Subject "), (k % 11).cast("string")).as("part"),
                when(k % 2 === 0, concat(lit("http://sub.ex/"), ks)).otherwise(e).as("id")),
              struct(when(k % 6 === 0, e).otherwise(lit("General")).as("part"),
                lit("http://sub.ex/general").as("id"))
            ).as("subjects"),
            array(
              struct(concat(lit("Place "), (k % 13).cast("string")).as("part"), e.as("id"))
            ).as("geognames"),
            when(k % 3 === 0, lit(" Manuscripts ")).otherwise(e).as("genreform"),
            when(k % 2 === 0, lit("file")).otherwise(lit("series")).as("level"),
            concat(lit("Repository "), (k % 4).cast("string")).as("institution"),
            array(lit("fin"), when(k % 2 === 0, lit("swe")).otherwise(e), lit(" ")).as("langcodes"),
            array(concat(ks, lit(" boxes")), lit("-")).as("extents"),
            array(
              struct(lit("image").as("loc"), concat(lit("https://img.ex/full/"), ks).as("href")),
              struct(lit("thumbnail").as("loc"),
                when(k % 2 === 0, concat(lit("https://img.ex/t/"), ks)).otherwise(e).as("href")),
              struct(lit("thumbnail").as("loc"), concat(lit("https://img.ex/t2/"), ks).as("href"))
            ).as("daos")
          )
        val sub = col("title_sub")
        val short = col("title_short")
        val title = concat(
          when(sub =!= "" && sub =!= short, concat(sub, lit(" "))).otherwise(lit("")),
          short
        )
        val els = col("author_els")
        val authors = partsOf(els, Seq("ca_name", "ca_pers", "or_name", "or_pers"))
        val corp = partsOf(els, Seq("ca_corp", "or_corp"))
        def terms(arr: org.apache.spark.sql.Column) =
          filter(transform(arr, t => trim(t.getField("part"))), x => x =!= "")
        def ids(arr: org.apache.spark.sql.Column) =
          filter(transform(arr, t => t.getField("id")), x => x =!= "")
        val thumb = coalesce(
          get(
            filter(
              col("daos"),
              dao => dao.getField("loc") === "thumbnail" && dao.getField("href") =!= ""
            ),
            lit(0)
          ).getField("href"),
          lit("")
        )
        doc.select(
          col("record_id"),
          title.as("title"),
          short.as("title_short"),
          sub.as("title_sub"),
          lower(graft.functions.MetadataFunctions.stripPunctuation(title)).as("title_sort"),
          array_join(col("scope_ps"), "   /   ").as("description"),
          array_join(authors, "|").as("author"),
          coalesce(get(authors, lit(0)), lit("")).as("author_sort"),
          array_join(corp, "|").as("author_corporate"),
          array_join(terms(col("subjects")), "|").as("topics"),
          array_join(ids(col("subjects")), "|").as("topic_ids"),
          array_join(terms(col("geognames")), "|").as("geographic"),
          when(trim(col("genreform")) =!= "", trim(col("genreform")))
            .otherwise(col("level")).as("format"),
          col("institution"),
          array_join(filter(transform(col("langcodes"), trim(_)), x => x =!= ""), "|")
            .as("langs"),
          array_join(filter(col("extents"), x => trim(x) =!= "-"), "|").as("physical"),
          thumb.as("thumbnail")
        )
      },
      Some {
        import MetadataQueries.stripPunctSql
        s"""WITH base AS (
           |  SELECT p_partkey AS k, p_name AS name,
           |    'e3-' || cast(p_partkey as varchar) AS record_id,
           |    (CASE WHEN p_partkey % 3 = 0 THEN 'Collection ' || cast(p_partkey % 7 as varchar)
           |          WHEN p_partkey % 5 = 0 THEN p_name
           |          ELSE '' END) AS title_sub
           |  FROM part),
           |titled AS (
           |  SELECT *,
           |    (CASE WHEN title_sub != '' AND title_sub != name
           |          THEN title_sub || ' ' || name ELSE name END) AS title_s
           |  FROM base)
           |SELECT record_id,
           |  title_s AS title,
           |  name AS title_short,
           |  title_sub,
           |  lower(${stripPunctSql("title_s")}) AS title_sort,
           |  'Scope para one for ' || cast(k as varchar) || '   /   ' || 'Scope para two for ' || cast(k as varchar) AS description,
           |  'Author ' || cast(k as varchar)
           |    || (CASE WHEN k % 2 = 0 THEN '|Person ' || cast(k as varchar) ELSE '' END)
           |    || '|Origin ' || cast(k as varchar) AS author,
           |  'Author ' || cast(k as varchar) AS author_sort,
           |  'Corp ' || cast(k % 9 as varchar)
           |    || (CASE WHEN k % 4 = 0 THEN '|Origin Corp' ELSE '' END) AS author_corporate,
           |  'Subject ' || cast(k % 11 as varchar)
           |    || (CASE WHEN k % 6 = 0 THEN '' ELSE '|General' END) AS topics,
           |  (CASE WHEN k % 2 = 0 THEN 'http://sub.ex/' || cast(k as varchar) || '|' ELSE '' END)
           |    || 'http://sub.ex/general' AS topic_ids,
           |  'Place ' || cast(k % 13 as varchar) AS geographic,
           |  (CASE WHEN k % 3 = 0 THEN 'Manuscripts'
           |        WHEN k % 2 = 0 THEN 'file' ELSE 'series' END) AS format,
           |  'Repository ' || cast(k % 4 as varchar) AS institution,
           |  'fin' || (CASE WHEN k % 2 = 0 THEN '|swe' ELSE '' END) AS langs,
           |  cast(k as varchar) || ' boxes' AS physical,
           |  (CASE WHEN k % 2 = 0 THEN 'https://img.ex/t/' || cast(k as varchar)
           |        ELSE 'https://img.ex/t2/' || cast(k as varchar) END) AS thumbnail
           |FROM titled""".stripMargin
      }
    ),
    // EAD2 record extraction (reference: Record/Ead.php toSolrArray:159).
    // Distinctives vs ead3_extract above: format = first
    // controlaccess/genreform else the archdesc @level attribute
    // (getFormat:307); subtitle = unitid gated OFF for fonds/collection
    // (getSubtitle:403); series = parent title gated off for
    // fonds/collection/series/subseries AND when the parent IS the archive
    // (getSeries:421); the origination corpname SCALAR-OVERWRITES the
    // controlaccess author_corporate array (:199 — a reference quirk kept
    // as-is) while origination persname lands in author2 (:204);
    // '-'-placeholder filtering on persname/subject/geogname/extent; WGS84
    // geographiccoordinates "lat, lon" → "POINT(lon lat)" + "lon lat"
    // center, non-WGS84 systems dropped (getGeographicData:493); the
    // hierarchy block (:269-297): archive → top id/title (' : '-joined
    // subtitle), parent → parent id/title, no parent → is_hierarchy
    // twins that overwrite top; title_in_hierarchy = trim(unitid+' '+title).
    Q(
      "ead2_extract",
      (s, d) => {
        val k = col("p_partkey")
        val ks = k.cast("string")
        val e = lit("")
        val short = col("p_name")
        val unitid =
          concat(lit("A"), (k % 90).cast("string"), lit("."), (k % 7).cast("string"))
        val gf = when(k % 6 === 0, lit("letters")).otherwise(e)
        val level = when(k % 2 === 0, lit("fonds"))
          .when(k % 3 === 0, lit("series"))
          .otherwise(lit("file"))
        val fmt = when(gf =!= "", gf).otherwise(level)
        val subtitle = when(fmt.isin("fonds", "collection"), e).otherwise(unitid)
        val hasParent = k % 4 =!= 0
        val hasArchive = k % 5 =!= 4
        val archiveId = concat(lit("arch"), (k % 10).cast("string"))
        val parentId =
          when(k % 4 === 1, archiveId).otherwise(concat(lit("p"), (k % 50).cast("string")))
        val parentTitle = concat(lit("Parent "), (k % 20).cast("string"))
        val series = when(fmt.isin("fonds", "collection", "series", "subseries"), e)
          .when(!hasParent, e)
          .when(hasArchive && (parentId === archiveId), e)
          .otherwise(parentTitle)
        val title =
          when(subtitle =!= "" && subtitle =!= short, concat(subtitle, lit(" "), short))
            .otherwise(short)
        val desc = when(
          k % 3 === 0,
          concat(lit("Scope one for "), ks, lit("   /   Scope two"))
        ).otherwise(concat(lit("Scope one for "), ks))
        val persnames = array(
          concat(lit("Person, "), element_at(split(short, " "), 1)),
          when(k % 7 === 0, lit("-"))
            .otherwise(concat(lit("Second person "), (k % 5).cast("string")))
        )
        val authors = filter(persnames, p => trim(p) =!= "-")
        val caCorp =
          when(k % 3 === 0, concat(lit("Corp "), (k % 9).cast("string"))).otherwise(e)
        val authorCorp =
          when(k % 5 === 0, concat(lit("Origin Corp "), (k % 4).cast("string")))
            .otherwise(caCorp)
        val author2 =
          when(k % 7 === 0, concat(lit("Origin Person "), ks)).otherwise(e)
        val topics = array_join(
          filter(
            array(
              concat(lit("Subject "), (k % 11).cast("string")),
              when(k % 9 === 0, lit("-"))
                .otherwise(concat(lit("Theme "), (k % 4).cast("string")))
            ),
            p => trim(p) =!= "-"
          ),
          "|"
        )
        val lat = (lit(60) + k % 10).cast("string")
        val lon = (lit(20) + k % 15).cast("string")
        // WGS84 rows emit the point; the k%4==2 rows carry a non-WGS84
        // coordinatesystem and are dropped like the reference does.
        val hasWgs = k % 4 === 0
        val geoNames = array_join(
          filter(
            array(
              when(k % 2 === 0, concat(lit("Place "), (k % 13).cast("string"))).otherwise(e),
              when(k % 6 === 1, lit("-"))
                .when(k % 3 === 1, concat(lit("Part place "), (k % 8).cast("string")))
                .otherwise(e)
            ),
            p => p =!= "" && p =!= "-"
          ),
          "|"
        )
        val locationGeo =
          when(hasWgs, concat(lit("POINT("), lon, lit(" "), lat, lit(")"))).otherwise(e)
        val center = when(hasWgs, concat(lon, lit(" "), lat)).otherwise(e)
        val physical = concat((k % 300 + 1).cast("string"), lit(" boxes"))
        val institution = concat(lit("Repository "), (k % 4).cast("string"))
        val archTitle = concat(
          lit("Archive "),
          (k % 10).cast("string"),
          when(k % 3 === 0, concat(lit(" : Archive sub "), (k % 5).cast("string"))).otherwise(e)
        )
        val recordId = concat(lit("e2-"), ks)
        val topId =
          when(hasParent, when(hasArchive, archiveId).otherwise(e)).otherwise(recordId)
        val topTitle =
          when(hasParent, when(hasArchive, archTitle).otherwise(e)).otherwise(short)
        Tables
          .part(s, d)
          .select(
            recordId.as("record_id"),
            title.as("title"),
            subtitle.as("title_sub"),
            lower(graft.functions.MetadataFunctions.stripPunctuation(title)).as("title_sort"),
            series.as("series"),
            fmt.as("format"),
            desc.as("description"),
            array_join(authors, "|").as("author"),
            coalesce(get(authors, lit(0)), lit("")).as("author_sort"),
            authorCorp.as("author_corporate"),
            author2.as("author2"),
            topics.as("topics"),
            geoNames.as("geographic"),
            locationGeo.as("location_geo"),
            center.as("center_coords"),
            physical.as("physical"),
            institution.as("institution"),
            topId.as("hierarchy_top_id"),
            topTitle.as("hierarchy_top_title"),
            when(hasParent, parentId).otherwise(e).as("hierarchy_parent_id"),
            when(hasParent, parentTitle).otherwise(e).as("hierarchy_parent_title"),
            when(!hasParent, recordId).otherwise(e).as("is_hierarchy_id"),
            when(!hasParent, short).otherwise(e).as("is_hierarchy_title"),
            trim(concat(unitid, lit(" "), title)).as("title_in_hierarchy")
          )
      },
      Some {
        import MetadataQueries.stripPunctSql
        s"""WITH base AS (
           |  SELECT p_partkey AS k, p_name AS name,
           |    'A' || cast(p_partkey % 90 as varchar) || '.' || cast(p_partkey % 7 as varchar) AS unitid,
           |    (CASE WHEN p_partkey % 6 = 0 THEN 'letters'
           |          WHEN p_partkey % 2 = 0 THEN 'fonds'
           |          WHEN p_partkey % 3 = 0 THEN 'series'
           |          ELSE 'file' END) AS fmt,
           |    (p_partkey % 4 != 0) AS has_parent,
           |    (p_partkey % 5 != 4) AS has_archive,
           |    'arch' || cast(p_partkey % 10 as varchar) AS archive_id,
           |    (CASE WHEN p_partkey % 4 = 1 THEN 'arch' || cast(p_partkey % 10 as varchar)
           |          ELSE 'p' || cast(p_partkey % 50 as varchar) END) AS parent_id,
           |    'Parent ' || cast(p_partkey % 20 as varchar) AS parent_title,
           |    cast(60 + p_partkey % 10 as varchar) AS lat,
           |    cast(20 + p_partkey % 15 as varchar) AS lon
           |  FROM part),
           |sub AS (
           |  SELECT *,
           |    (CASE WHEN fmt IN ('fonds', 'collection') THEN '' ELSE unitid END) AS subtitle
           |  FROM base),
           |titled AS (
           |  SELECT *,
           |    (CASE WHEN subtitle != '' AND subtitle != name
           |          THEN subtitle || ' ' || name ELSE name END) AS title_s,
           |    'Person, ' || string_split(name, ' ')[1]
           |      || (CASE WHEN k % 7 = 0 THEN '' ELSE '|Second person ' || cast(k % 5 as varchar) END) AS author_s
           |  FROM sub)
           |SELECT 'e2-' || cast(k as varchar) AS record_id,
           |  title_s AS title,
           |  subtitle AS title_sub,
           |  lower(${stripPunctSql("title_s")}) AS title_sort,
           |  (CASE WHEN fmt IN ('fonds', 'collection', 'series', 'subseries') THEN ''
           |        WHEN NOT has_parent THEN ''
           |        WHEN has_archive AND parent_id = archive_id THEN ''
           |        ELSE parent_title END) AS series,
           |  fmt AS format,
           |  'Scope one for ' || cast(k as varchar)
           |    || (CASE WHEN k % 3 = 0 THEN '   /   Scope two' ELSE '' END) AS description,
           |  author_s AS author,
           |  'Person, ' || string_split(name, ' ')[1] AS author_sort,
           |  (CASE WHEN k % 5 = 0 THEN 'Origin Corp ' || cast(k % 4 as varchar)
           |        WHEN k % 3 = 0 THEN 'Corp ' || cast(k % 9 as varchar)
           |        ELSE '' END) AS author_corporate,
           |  (CASE WHEN k % 7 = 0 THEN 'Origin Person ' || cast(k as varchar) ELSE '' END) AS author2,
           |  'Subject ' || cast(k % 11 as varchar)
           |    || (CASE WHEN k % 9 = 0 THEN '' ELSE '|Theme ' || cast(k % 4 as varchar) END) AS topics,
           |  coalesce(array_to_string(list_filter([
           |    (CASE WHEN k % 2 = 0 THEN 'Place ' || cast(k % 13 as varchar) ELSE '' END),
           |    (CASE WHEN k % 6 = 1 THEN ''
           |          WHEN k % 3 = 1 THEN 'Part place ' || cast(k % 8 as varchar)
           |          ELSE '' END)
           |  ], x -> x != ''), '|'), '') AS geographic,
           |  (CASE WHEN k % 4 = 0 THEN 'POINT(' || lon || ' ' || lat || ')' ELSE '' END) AS location_geo,
           |  (CASE WHEN k % 4 = 0 THEN lon || ' ' || lat ELSE '' END) AS center_coords,
           |  cast(k % 300 + 1 as varchar) || ' boxes' AS physical,
           |  'Repository ' || cast(k % 4 as varchar) AS institution,
           |  (CASE WHEN has_parent THEN (CASE WHEN has_archive THEN archive_id ELSE '' END)
           |        ELSE 'e2-' || cast(k as varchar) END) AS hierarchy_top_id,
           |  (CASE WHEN has_parent
           |        THEN (CASE WHEN has_archive
           |                   THEN 'Archive ' || cast(k % 10 as varchar)
           |                        || (CASE WHEN k % 3 = 0 THEN ' : Archive sub ' || cast(k % 5 as varchar) ELSE '' END)
           |                   ELSE '' END)
           |        ELSE name END) AS hierarchy_top_title,
           |  (CASE WHEN has_parent THEN parent_id ELSE '' END) AS hierarchy_parent_id,
           |  (CASE WHEN has_parent THEN parent_title ELSE '' END) AS hierarchy_parent_title,
           |  (CASE WHEN NOT has_parent THEN 'e2-' || cast(k as varchar) ELSE '' END) AS is_hierarchy_id,
           |  (CASE WHEN NOT has_parent THEN name ELSE '' END) AS is_hierarchy_title,
           |  trim(unitid || ' ' || title_s) AS title_in_hierarchy
           |FROM titled""".stripMargin
      }
    )
  )
}

/** Query registration: archives synthesized from `orders`, a two-deep
  * component hierarchy (series -> items) from `lineitem`.
  */
object EadQueries {

  /** The synthesized three-deep EAD3 hierarchy (series s0 -> subseries
    * b -> items; series s1 -> items per `orders` archive) — shared by
    * the `ead3_split` registry query and the ScaleProbe `ead3` mode
    * (which replicates it with disjoint archive keys). Unitid shapes
    * force every selection branch: a 'tech'-labeled decoy archdesc id
    * (label gating), a series whose FIRST matching id IS the archive id
    * (the != archiveId scan), an identifier-less series
    * (position-fallback ids, which then surface in its children's
    * parent pointers), and items resolved via the label-match vs
    * first-identifier fallback. Inheritance exercises dao exclusion
    * (own dao kept, inherited dropped), nearest-ancestor-first
    * first-wins merge (physloc), parent-title fallback chains
    * (unittitle -> label -> id) with the unit-id-text prefix, and the
    * series/subseries add-data parent chain.
    */
  def ead3Frames(
      s: org.apache.spark.sql.SparkSession,
      d: String
  ): (DataFrame, DataFrame) = {
        def uid(i: Column, l: Column) = struct(i.as("identifier"), l.as("label"))
        def didf(n: String, v: Column) = struct(lit(n).as("name"), v.as("value"))
        val o = col("o_orderkey").cast("string")
        val archives = Tables
          .orders(s, d)
          .select(
            concat(lit("a"), o).as("archive_key"),
            array(
              uid(concat(lit("arx"), o), lit("tech")),
              uid(concat(lit("ar"), o), lit("main"))
            ).as("unit_ids"),
            concat(lit("Archive "), o).as("archive_title"),
            array(
              didf("scopecontent", concat(lit("Arch scope "), o)),
              didf("dao", concat(lit("http://arch/"), o))
            ).as("did_fields"),
            when(col("o_orderkey") % 2 === 0, concat(lit("Bib "), o))
              .otherwise(lit("")).as("bibliography"),
            when(col("o_orderstatus") === "F", lit("restricted"))
              .otherwise(lit("")).as("access_restrict")
          )
        val archBase = Tables.orders(s, d).select(col("o_orderkey"))
        def comp(
            nk: Column,
            pk: Column,
            us: Column,
            uit: Column,
            level: String,
            title: Column,
            titleLabel: Column,
            ord: Column,
            did: Column,
            access: Column
        ) = Seq(
          concat(lit("a"), o).as("archive_key"),
          nk.as("node_key"),
          pk.as("parent_key"),
          us.as("unit_ids"),
          uit.as("unit_id_text"),
          lit(level).as("level"),
          title.as("title"),
          titleLabel.as("title_label"),
          ord.as("ord"),
          did.as("did_fields"),
          access.as("access_restrict")
        )
        val e = lit("")
        val s0 = archBase.select(
          comp(
            lit("s0"),
            lit(null).cast("string"),
            array(uid(concat(lit("ar"), o), lit("main")), uid(concat(lit("s0-"), o), lit("main"))),
            concat(lit("SA"), o),
            "series",
            lit("Series A"),
            e,
            lit(0L),
            array(didf("physloc", concat(lit("Row "), o)), didf("langmaterial", lit("fi"))),
            e
          ): _*
        )
        val b = archBase.select(
          comp(
            lit("b"),
            lit("s0"),
            array(uid(concat(lit("b"), o), lit("main"))),
            concat(lit("BX"), o),
            "subseries",
            when(col("o_orderkey") % 2 === 0, lit("Box")).otherwise(e),
            e,
            lit(500L),
            array(didf("physloc", concat(lit("Shelf "), o)), didf("dao", concat(lit("http://b/"), o))),
            e
          ): _*
        )
        val s1 = archBase.select(
          comp(
            lit("s1"),
            lit(null).cast("string"),
            array(uid(e, lit("main"))),
            concat(lit("SB"), o),
            "series",
            e,
            lit("Lbl B"),
            lit(2000L),
            array(didf("physloc", concat(lit("Attic "), o))),
            when(col("o_orderkey") % 3 === 0, lit("series-closed")).otherwise(e)
          ): _*
        )
        val li = Tables
          .lineitem(s, d)
          .withColumn("o_orderkey", col("l_orderkey"))
        def items(g: Int, parent: String, ordBase: Long) = li
          .filter(col("l_linenumber") % 2 === g)
          .select(
            comp(
              concat(
                lit("i"), col("l_linenumber").cast("string"),
                lit("p"), col("l_partkey").cast("string"),
                lit("s"), col("l_suppkey").cast("string")
              ),
              lit(parent),
              array(
                uid(
                  concat(
                    lit("i"), col("l_linenumber").cast("string"),
                    lit("p"), col("l_partkey").cast("string"),
                    lit("s"), col("l_suppkey").cast("string")
                  ),
                  when(col("l_linenumber") % 3 === 0, lit("main")).otherwise(lit("tech"))
                )
              ),
              e,
              "item",
              concat(lit("Item "), col("l_partkey").cast("string")),
              e,
              lit(ordBase) + col("l_linenumber"),
              array(didf("unittitle", concat(lit("Item "), col("l_partkey").cast("string")))),
              e
            ): _*
          )
        val components = s0
          .unionByName(b)
          .unionByName(s1)
          .unionByName(items(0, "b", 1000L))
          .unionByName(items(1, "s1", 3000L))
    (archives, components)
  }

  val all: Seq[Q] = Seq(
    Q(
      // EAD3 splitter overrides under the oracle gate — see [[ead3Frames]]
      // for the synthesized branch-coverage design.
      "ead3_split",
      (s, d) => {
        val (archives, components) = ead3Frames(s, d)
        Ead3Splitter.splitArchive(
          archives,
          components,
          unitIdLabel = Some("main"),
          prependParentTitleWithUnitId = true
        )
      },
      Some(
        """WITH arch AS (
          |  SELECT o_orderkey AS o, 'a' || cast(o_orderkey as varchar) AS ak,
          |    'ar' || cast(o_orderkey as varchar) AS aid,
          |    'Archive ' || cast(o_orderkey as varchar) AS atitle,
          |    (CASE WHEN o_orderstatus = 'F' THEN 'restricted' ELSE '' END) AS aaccess,
          |    (CASE WHEN o_orderkey % 2 = 0 THEN 'Bib ' || cast(o_orderkey as varchar) ELSE '' END) AS abib
          |  FROM orders),
          |li AS (
          |  SELECT 'a' || cast(l_orderkey as varchar) AS ak, l_orderkey AS o,
          |    l_linenumber AS ln, l_partkey AS pk, l_suppkey AS sk, l_linenumber % 2 AS g
          |  FROM lineitem),
          |comp AS (
          |  SELECT ak, o, '__root__' AS nk, 'root' AS typ, -1 AS ord, cast(NULL as bigint) AS pk FROM arch
          |  UNION ALL SELECT ak, o, 's0', 'series', 0, NULL FROM arch
          |  UNION ALL SELECT ak, o, 'b', 'sub', 500, NULL FROM arch
          |  UNION ALL SELECT ak, o, 's1', 'series1', 2000, NULL FROM arch
          |  UNION ALL SELECT ak, o,
          |    'i' || cast(ln as varchar) || 'p' || cast(pk as varchar) || 's' || cast(sk as varchar),
          |    (CASE WHEN g = 0 THEN 'item0' ELSE 'item1' END),
          |    (CASE WHEN g = 0 THEN 1000 + ln ELSE 3000 + ln END), pk
          |  FROM li),
          |seqd AS (
          |  SELECT *, row_number() OVER (PARTITION BY ak ORDER BY ord, nk) AS pos FROM comp),
          |wide AS (
          |  SELECT s.o, s.nk, s.typ, s.pk, s.pos, a.aid, a.atitle, a.aaccess, a.abib,
          |    cast(s.o as varchar) AS ov,
          |    max(CASE WHEN s.typ = 'series1' THEN s.pos END) OVER (PARTITION BY s.ak) AS pos_s1
          |  FROM seqd s JOIN arch a ON s.ak = a.ak)
          |SELECT
          |  (CASE typ WHEN 'root' THEN aid
          |    WHEN 'series' THEN aid || '_s0-' || ov
          |    WHEN 'sub' THEN aid || '_b' || ov
          |    WHEN 'series1' THEN aid || '_' || cast(pos as varchar)
          |    ELSE aid || '_' || nk END) AS record_id,
          |  (CASE typ WHEN 'root' THEN 'archdesc' WHEN 'series' THEN 'series'
          |    WHEN 'series1' THEN 'series' WHEN 'sub' THEN 'subseries' ELSE 'item' END) AS level,
          |  (CASE typ WHEN 'root' THEN atitle WHEN 'series' THEN 'Series A'
          |    WHEN 'sub' THEN (CASE WHEN o % 2 = 0 THEN 'Box' ELSE '' END)
          |    WHEN 'series1' THEN ''
          |    ELSE 'Item ' || cast(pk as varchar) END) AS title,
          |  (CASE typ WHEN 'root' THEN ''
          |    WHEN 'series' THEN aid WHEN 'series1' THEN aid
          |    WHEN 'sub' THEN aid || '_s0-' || ov
          |    WHEN 'item0' THEN aid || '_b' || ov
          |    ELSE aid || '_' || cast(pos_s1 as varchar) END) AS parent_id,
          |  (CASE typ WHEN 'root' THEN ''
          |    WHEN 'series' THEN atitle WHEN 'series1' THEN atitle
          |    WHEN 'sub' THEN 'SA' || ov || ' Series A'
          |    WHEN 'item0' THEN 'BX' || ov || ' ' ||
          |      (CASE WHEN o % 2 = 0 THEN 'Box' ELSE aid || '_b' || ov END)
          |    ELSE 'SB' || ov || ' Lbl B' END) AS parent_title,
          |  (CASE typ WHEN 'root' THEN ''
          |    WHEN 'series' THEN 'archive' WHEN 'series1' THEN 'archive'
          |    WHEN 'sub' THEN 'series' WHEN 'item0' THEN 'subseries'
          |    ELSE 'series' END) AS parent_level,
          |  (CASE typ WHEN 'root' THEN ''
          |    WHEN 'series' THEN aid || '~' || atitle || '~archive'
          |    WHEN 'series1' THEN aid || '~' || atitle || '~archive'
          |    WHEN 'sub' THEN aid || '_s0-' || ov || '~SA' || ov || ' Series A~series'
          |    WHEN 'item0' THEN aid || '_b' || ov || '~BX' || ov || ' ' ||
          |      (CASE WHEN o % 2 = 0 THEN 'Box' ELSE aid || '_b' || ov END)
          |      || '~subseries|' || aid || '_s0-' || ov || '~SA' || ov || ' Series A~series'
          |    ELSE aid || '_' || cast(pos_s1 as varchar) || '~SB' || ov || ' Lbl B~series' END)
          |    AS parent_chain_csv,
          |  aid AS archive_id,
          |  atitle AS archive_title,
          |  lpad(cast(pos as varchar), 7, '0') AS sequence,
          |  (CASE typ WHEN 'root' THEN 'scopecontent=Arch scope ' || ov || '|dao=http://arch/' || ov
          |    WHEN 'series' THEN 'physloc=Row ' || ov || '|langmaterial=fi|scopecontent=Arch scope ' || ov
          |    WHEN 'sub' THEN 'physloc=Shelf ' || ov || '|dao=http://b/' || ov
          |      || '|langmaterial=fi|scopecontent=Arch scope ' || ov
          |    WHEN 'series1' THEN 'physloc=Attic ' || ov || '|scopecontent=Arch scope ' || ov
          |    WHEN 'item0' THEN 'unittitle=Item ' || cast(pk as varchar) || '|physloc=Shelf ' || ov
          |      || '|langmaterial=fi|scopecontent=Arch scope ' || ov
          |    ELSE 'unittitle=Item ' || cast(pk as varchar) || '|physloc=Attic ' || ov
          |      || '|scopecontent=Arch scope ' || ov END) AS did_csv,
          |  (CASE WHEN typ = 'series1' AND o % 3 = 0 THEN 'series-closed' ELSE aaccess END)
          |    AS access_restrict,
          |  abib AS bibliography
          |FROM wide""".stripMargin
      )
    ),
    Q(
      "ead_split",
      (s, d) => {
        val archives = Tables
          .orders(s, d)
          .select(
            concat(lit("ar"), col("o_orderkey").cast("string")).as("archive_id"),
            concat(lit("Archive "), col("o_orderkey").cast("string")).as("archive_title"),
            col("o_orderpriority").as("archive_subtitle"),
            when(col("o_orderstatus") === "F", lit("restricted"))
              .otherwise(lit("")).as("access_restrict")
          )
        val li = Tables
          .lineitem(s, d)
          .select(
            concat(lit("ar"), col("l_orderkey").cast("string")).as("archive_id"),
            (col("l_linenumber") % 2).as("g"),
            col("l_linenumber"),
            col("l_partkey"),
            col("l_suppkey")
          )
        val series = li
          .select(col("archive_id"), col("g"))
          .distinct()
          .select(
            col("archive_id"),
            concat(lit("s"), col("g").cast("string")).as("unit_id"),
            lit(null).cast("string").as("parent_unit_id"),
            lit("series").as("level"),
            concat(lit("Series "), col("g").cast("string")).as("title"),
            (col("g") * 1000).as("ord")
          )
        // (orderkey, linenumber) repeats in the synthetic data — the unit
        // id needs the full unique key so record ids are unambiguous.
        val items = li.select(
          col("archive_id"),
          concat(
            lit("i"), col("l_linenumber").cast("string"),
            lit("p"), col("l_partkey").cast("string"),
            lit("s"), col("l_suppkey").cast("string")
          ).as("unit_id"),
          concat(lit("s"), (col("l_linenumber") % 2).cast("string")).as("parent_unit_id"),
          lit("item").as("level"),
          concat(lit("Item "), col("l_partkey").cast("string")).as("title"),
          (col("l_linenumber") % 2 * 1000 + col("l_linenumber")).as("ord")
        )
        EadSplitter.splitArchive(archives, series.unionByName(items))
      },
      Some(
        """WITH arch AS (
          |  SELECT 'ar' || cast(o_orderkey as varchar) AS archive_id,
          |    'Archive ' || cast(o_orderkey as varchar) AS archive_title,
          |    o_orderpriority AS archive_subtitle,
          |    (CASE WHEN o_orderstatus = 'F' THEN 'restricted' ELSE '' END) AS access_restrict
          |  FROM orders),
          |li AS (
          |  SELECT 'ar' || cast(l_orderkey as varchar) AS archive_id,
          |    l_linenumber % 2 AS g, l_linenumber, l_partkey, l_suppkey
          |  FROM lineitem),
          |series AS (
          |  SELECT DISTINCT archive_id, 's' || cast(g as varchar) AS unit_id,
          |    cast(NULL as varchar) AS parent_unit_id, 'series' AS level,
          |    'Series ' || cast(g as varchar) AS title, g * 1000 AS ord
          |  FROM li),
          |items AS (
          |  SELECT archive_id,
          |    'i' || cast(l_linenumber as varchar) || 'p' || cast(l_partkey as varchar)
          |        || 's' || cast(l_suppkey as varchar) AS unit_id,
          |    's' || cast(l_linenumber % 2 as varchar) AS parent_unit_id, 'item' AS level,
          |    'Item ' || cast(l_partkey as varchar) AS title,
          |    (l_linenumber % 2) * 1000 + l_linenumber AS ord
          |  FROM li),
          |comp AS (SELECT * FROM series UNION ALL SELECT * FROM items),
          |recs AS (
          |  SELECT archive_id, archive_id AS record_id, 'archdesc' AS level,
          |    archive_title AS title, cast(NULL as varchar) AS parent_unit_id,
          |    -1 AS ord, true AS is_root
          |  FROM arch
          |  UNION ALL
          |  SELECT archive_id, archive_id || '_' || unit_id, level, title,
          |    parent_unit_id, ord, false
          |  FROM comp),
          |seq AS (
          |  SELECT *, lpad(cast(row_number() OVER (PARTITION BY archive_id ORDER BY ord, record_id) as varchar), 7, '0') AS sequence
          |  FROM recs)
          |SELECT r.record_id, r.level, r.title,
          |  (CASE WHEN r.is_root THEN ''
          |        WHEN r.parent_unit_id IS NULL THEN r.archive_id
          |        ELSE r.archive_id || '_' || r.parent_unit_id END) AS parent_id,
          |  (CASE WHEN r.is_root THEN ''
          |        WHEN r.parent_unit_id IS NULL THEN a.archive_title
          |        WHEN r.level IN ('series','subseries','file','item')
          |          THEN r.parent_unit_id || ' ' || p.title
          |        ELSE p.title END) AS parent_title,
          |  r.archive_id, a.archive_title, a.archive_subtitle, r.sequence,
          |  a.access_restrict
          |FROM seq r
          |JOIN arch a ON r.archive_id = a.archive_id
          |LEFT JOIN comp p
          |  ON r.archive_id = p.archive_id AND r.parent_unit_id = p.unit_id""".stripMargin
      )
    )
  )
}
