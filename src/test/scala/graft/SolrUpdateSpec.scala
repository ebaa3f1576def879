package graft

import org.apache.spark.sql.Row

/** Branch-level behavior of the SolrUpdater field-processing tail
  * (Solr/SolrUpdater.php): field rules, institution/building prefixing,
  * field normalization, Solr id rewriting, merged/parent copies, and
  * the OAI-PMH provider page. Each test pins the PHP branch the oracle
  * alone can't isolate (the oracle mirrors whole-query output; these
  * assert per-branch behavior on selected rows).
  */
class SolrUpdateSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String, dir: String = sf): Map[Long, Row] = {
    val q = SparkEntry.queries(name)
    q(spark, dir)
      .collect()
      .map(r => r.getLong(r.schema.fieldNames.indexOf(rowKey(name))) -> r)
      .toMap
  }

  private def rowKey(name: String): String = name match {
    case "solr_id_rewrite" | "solr_parent_copy" => "o_orderkey"
    case _                                      => "p_partkey"
  }

  private def byRecordId(name: String): Map[String, Row] =
    SparkEntry
      .queries(name)(spark, sf)
      .collect()
      .map(r => r.getString(r.schema.fieldNames.indexOf("record_id")) -> r)
      .toMap

  test("field rules: regex move splits topics, exact delete removes one value, default appends") {
    val out = byRecordId("solr_field_rules")
    val parts = spark.read.parquet(s"$sf/part.parquet").collect()
    val types = parts
      .map(r => r.getLong(r.fieldIndex("p_partkey")) -> r.getString(r.fieldIndex("p_type")))
      .toMap
    types.foreach { case (k, t) =>
      val r = out(s"part.$k")
      def g(f: String) = Option(r.getString(r.fieldIndex(f)))
      val words = t.split(" ").toSeq
      val sWords = words.filter(_.startsWith("S"))
      val rest = words.filterNot(_.startsWith("S"))
      if (sWords.isEmpty) {
        assert(g("topic").contains(words.mkString("|")), s"k=$k")
        assert(g("topic_other").isEmpty, s"k=$k")
      } else {
        assert(g("topic_other").contains(sWords.mkString("|")), s"k=$k")
        val expect = if (rest.isEmpty) None else Some(rest.mkString("|"))
        assert(g("topic") == expect, s"k=$k")
      }
      // exact-match delete drops only 'secret'; absent extra stays absent
      assert(g("extra") == (if (k % 4 == 0) None else Some("keep")), s"k=$k")
      // default fallback appended 'anonymous' to author (rule 4), and the
      // exact-match move (rule 5) relocated it
      assert(g("author_alt").contains("anonymous"), s"k=$k")
      assert(!g("author").exists(_.contains("anonymous")), s"k=$k")
    }
  }

  test("building prefix: none-mode passthrough, bare code for empty value, [code] for absent field") {
    val out = byRecordId("solr_building_institution")
    out.foreach { case (_, r) =>
      val k = r.getString(r.fieldIndex("record_id")).stripPrefix("part.").toLong
      val mode = r.getString(r.fieldIndex("mode"))
      val code = r.getString(r.fieldIndex("institution_code"))
      val bld = Option(r.getString(r.fieldIndex("building")))
      if (mode == "none") {
        assert(code == "")
        // untouched: absent stays absent, values stay unprefixed
        if (k % 6 == 0) assert(bld.isEmpty)
        else assert(bld.exists(!_.contains("/")), s"k=$k $bld")
      } else if (code.nonEmpty) {
        if (k % 6 == 0) assert(bld.contains(code), s"k=$k") // absent → [code]
        else if (k % 6 == 1)
          assert(bld.contains(s"$code/A|$code|$code/B"), s"k=$k") // '' → bare code
        else assert(bld.exists(_.startsWith(s"$code/Main")), s"k=$k")
      }
      if (mode == "institution/source" && k % 10 == 8)
        assert(code.startsWith("/"), s"missing-institution prefix k=$k")
    }
  }

  test("normalize: wildcard trim lengths, NFC composes, dedupe after trim, fullrecord exempt") {
    val out = byRecordId("solr_normalize_fields")
    val parts = spark.read.parquet(s"$sf/part.parquet").collect()
    val names = parts
      .map(r => r.getLong(r.fieldIndex("p_partkey")) -> r.getString(r.fieldIndex("p_name")))
      .toMap
    val composed = "Caf\u00e9"
    val decomposed = "Cafe\u0301"
    names.foreach { case (k, name) =>
      val r = out(s"part.$k")
      def g(f: String) = Option(r.getString(r.fieldIndex(f)))
      assert(g("title_full").contains(name.take(20)), s"k=$k")
      assert(g("work_keys").contains(s"WK $name".take(10)), s"k=$k")
      assert(g("record_description").contains(s"About $name".take(15)), s"k=$k")
      assert(g("title_nfc").exists(_.startsWith(composed)), s"k=$k")
      assert(g("fullrecord").exists(_.startsWith(decomposed)), s"k=$k")
      assert(g("empties").isEmpty, s"k=$k")
      // author: [p_name, p_nameXTRA, '', firstWord] → trim 28, drop '',
      // dedupe post-trim (collides exactly when the trim erases XTRA)
      val t28 = (s: String) => s.take(28)
      val expected =
        Seq(t28(name), t28(name + "XTRA"), name.split(" ").head).distinct.mkString("|")
      assert(g("author").contains(expected), s"k=$k")
      if (name.length >= 28)
        assert(g("author").exists(_.split('|').length == 2), s"collision k=$k")
    }
  }

  test("solr id rewrite: prefix replace, unprefixed index, passthrough, dotless, first-dot split") {
    val out = rows("solr_id_rewrite")
    out.foreach { case (k, r) =>
      val solrId = r.getString(r.fieldIndex("solr_id"))
      val expect = (k % 5) match {
        case 0 => s"ALPHA.A$k"
        case 1 => s"B$k"
        case 2 => s"gamma.G$k"
        case 3 => s"noprefix$k"
        case _ => s"DX.D.$k"
      }
      assert(solrId == expect, s"k=$k")
    }
  }

  test("member copy dedupes against merged values; parent copy keeps duplicates") {
    // At sf0.001 every group (p_partkey % 499) is a singleton, so a
    // member with an absent era has an EMPTY merged era — exercising the
    // `if (empty($merged[$copyField])) continue` guard: the field stays
    // absent rather than becoming an empty value.
    val members = rows("solr_member_copy")
    members.foreach { case (k, r) =>
      val genre = r.getString(r.fieldIndex("genre")).split('|')
      // order-preserving unique: the member's own brand stays first and
      // appears exactly once even though the merged list repeats it
      assert(genre.distinct.sameElements(genre), s"k=$k")
      val era = Option(r.getString(r.fieldIndex("era")))
      if (k % 3 == 0) assert(era.isEmpty, s"empty-merged guard k=$k")
      else assert(era.contains(s"E${k % 7}"), s"k=$k")
    }
    val children = rows("solr_parent_copy")
    children.foreach { case (k, r) =>
      val coll = r.getString(r.fieldIndex("collection"))
      assert(coll.startsWith("CC"), s"k=$k")
      val bld = r.getString(r.fieldIndex("building")).split('|')
      if (k % 4 == 0) assert(bld.forall(_.startsWith("B")), s"child-absent k=$k")
      else assert(bld.head.startsWith("CB") && bld.last.startsWith("B"), s"k=$k")
    }
  }

  test("OAI page: window slice, set membership, deleted header-only, trailing token row") {
    // sf0.01: the filtered store has 1507 records, so the page
    // (position 200, limit 500) is full and the extra row proves more
    // remain — exactly the reference's read-one-more protocol.
    val out = SparkEntry
      .queries("oai_provider_page")(spark, "/root/testdata/sf0.01")
      .collect()
      .sortBy(_.getInt(0))
    assert(out.length == 501)
    assert(out.head.getInt(0) == 201)
    val token = out.last
    assert(token.getString(token.fieldIndex("row_type")) == "token")
    assert(
      token.getString(token.fieldIndex("resumption_token")) ==
        "open|oai_dc|1995-01-01|1996-12-31|700"
    )
    assert(token.isNullAt(token.fieldIndex("id")))
    val records = out.init
    assert(records.forall(_.getString(1) == "record"))
    // datestamps non-decreasing (the cursor iterates the updated sort)
    val stamps = records.map(r => r.getString(r.fieldIndex("datestamp")))
    assert(stamps.zip(stamps.tail).forall { case (a, b) => a <= b })
    records.foreach { r =>
      val sets = r.getString(r.fieldIndex("sets"))
      assert(sets.startsWith("open"))
      if (sets.contains("urgent")) assert(sets == "open|urgent|open_urgent")
      val deleted = r.getBoolean(r.fieldIndex("deleted"))
      val meta = Option(r.getString(r.fieldIndex("metadata")))
      assert(deleted == meta.isEmpty, s"deleted records are header-only: $r")
      if (!deleted)
        assert(meta.exists(_.contains(r.getString(r.fieldIndex("id")))))
    }
  }
}
