package graft

import graft.operators.Ead3Splitter
import org.apache.spark.sql.Row

object Ead3SplitSpec {
  final case class U(identifier: String, label: String)
  final case class F(name: String, value: String)
  final case class Arch(
      archive_key: String,
      unit_ids: Seq[U],
      archive_title: String,
      did_fields: Seq[F],
      bibliography: String,
      access_restrict: String
  )
  final case class Comp(
      archive_key: String,
      node_key: String,
      parent_key: Option[String],
      unit_ids: Seq[U],
      unit_id_text: String,
      level: String,
      title: String,
      title_label: String,
      ord: Long,
      did_fields: Seq[F],
      access_restrict: String
  )
}

/** Ead3Splitter config knobs the oracle query can't sweep: unitIdLabel
  * on vs off, custom nonInheritedFields (including record-level
  * accessrestrict exclusion), prepend off, the matching-id-equals-
  * archive-id collision (Ead3.php:162 — a component whose only matching
  * unitid IS the archive id keeps the bare archive id), the
  * first-identifier fallback when no label matches, the position
  * fallback, and a FOUR-deep chain with a 'file' level in the middle —
  * the add-data copy semantics keep the direct parent but drop non-
  * series/subseries ancestors above it.
  */
class Ead3SplitSpec extends SparkSuite {
  import Ead3SplitSpec._

  private def frames = {
    val s = spark
    import s.implicits._
    val archives = Seq(
      Arch(
        "a1",
        Seq(U("X1", "old"), U("X2", "sig")),
        "Arch T",
        Seq(F("scopecontent", "SC"), F("dao", "D1"), F("custodhist", "CH")),
        "B1",
        "AR"
      )
    ).toDF
    val components = Seq(
      Comp("a1", "s", None, Seq(U("S1", "sig")), "US", "series", "St", "", 10L,
        Seq(F("physloc", "P-s")), ""),
      Comp("a1", "f", Some("s"), Seq(U("F1", "sig")), "UF", "file", "Ft", "", 20L,
        Seq(F("physloc", "P-f"), F("dao", "D-f")), ""),
      Comp("a1", "u", Some("f"), Seq(U("U1", "sig")), "UU", "subseries", "Ut", "", 30L,
        Seq.empty, "AU"),
      Comp("a1", "i", Some("u"), Seq(U("X2", "sig")), "", "item", "It", "", 40L,
        Seq(F("unittitle", "IT")), ""),
      Comp("a1", "n", None, Seq(U("N1", "old")), "", "series", "Nt", "", 50L,
        Seq.empty, ""),
      Comp("a1", "e", None, Seq.empty, "", "item", "Et", "", 60L, Seq.empty, "")
    ).toDF
    (archives, components)
  }

  private def byId(rows: Array[Row]): Map[String, Row] =
    rows.map(r => r.getString(0) -> r).toMap

  test("labeled split: id selection, inheritance, chains, fallbacks") {
    val (archives, components) = frames
    val out = Ead3Splitter
      .splitArchive(archives, components, unitIdLabel = Some("sig"),
        prependParentTitleWithUnitId = true)
      .collect()
    assert(out.length == 7)
    val m = byId(out)
    // Root: the 'sig'-labeled archdesc unitid wins over the first ('X1').
    // (The item's id collides with it by design — select by level.)
    val root = out.filter(r => r.getString(0) == "X2" && r.getAs[String]("level") == "archdesc")(0)
    assert(root.getAs[String]("level") == "archdesc")
    assert(root.getAs[String]("sequence") == "0000001")
    assert(root.getAs[String]("did_csv") == "scopecontent=SC|dao=D1|custodhist=CH")
    assert(root.getAs[String]("access_restrict") == "AR")
    assert(root.getAs[String]("bibliography") == "B1")
    // Series under the dsc: archive-level parent, dao NOT inherited,
    // own-first-wins order, record-level inheritance of access + bib.
    val s = m("X2_S1")
    assert(s.getAs[String]("parent_id") == "X2")
    assert(s.getAs[String]("parent_title") == "Arch T")
    assert(s.getAs[String]("parent_level") == "archive")
    assert(s.getAs[String]("parent_chain_csv") == "X2~Arch T~archive")
    assert(s.getAs[String]("did_csv") == "physloc=P-s|scopecontent=SC|custodhist=CH")
    assert(s.getAs[String]("access_restrict") == "AR")
    assert(s.getAs[String]("bibliography") == "B1")
    // File: own dao kept, inherited physloc deduped by first-wins.
    val f = m("X2_F1")
    assert(f.getAs[String]("parent_title") == "US St")
    assert(f.getAs[String]("parent_chain_csv") == "X2_S1~US St~series")
    assert(f.getAs[String]("did_csv") == "physloc=P-f|dao=D-f|scopecontent=SC|custodhist=CH")
    // Subseries: own accessrestrict wins; inherited dao (from f) excluded.
    val u = m("X2_U1")
    assert(u.getAs[String]("parent_title") == "UF Ft")
    assert(u.getAs[String]("parent_level") == "file")
    assert(u.getAs[String]("parent_chain_csv") == "X2_F1~UF Ft~file|X2_S1~US St~series")
    assert(u.getAs[String]("did_csv") == "physloc=P-f|scopecontent=SC|custodhist=CH")
    assert(u.getAs[String]("access_restrict") == "AU")
    // Item: matching unitid equals the archive id -> bare archive id
    // (the reference's own collision behavior); the chain keeps the
    // direct parent but drops the 'file' ancestor (not series/subseries).
    assert(out.count(_.getString(0) == "X2") == 2)
    val item = out.filter(r => r.getString(0) == "X2" && r.getAs[String]("level") == "item")(0)
    assert(item.getAs[String]("parent_title") == "UU Ut")
    assert(item.getAs[String]("parent_chain_csv") ==
      "X2_U1~UU Ut~subseries|X2_S1~US St~series")
    assert(item.getAs[String]("did_csv") == "unittitle=IT|physloc=P-f|scopecontent=SC|custodhist=CH")
    assert(item.getAs[String]("access_restrict") == "AR")
    // No label match -> first-identifier fallback.
    assert(m.contains("X2_N1"))
    // No identifiers at all -> archive_position fallback (e is pos 7).
    assert(m.contains("X2_7"))
    assert(m("X2_7").getAs[String]("sequence") == "0000007")
  }

  test("unlabeled split: first identifier everywhere") {
    val (archives, components) = frames
    val m = byId(
      Ead3Splitter
        .splitArchive(archives, components, unitIdLabel = None,
          prependParentTitleWithUnitId = true)
        .collect()
    )
    assert(m.contains("X1")) // first archdesc identifier
    assert(m.contains("X1_S1"))
    // The item's id no longer collides with the archive id.
    assert(m.contains("X1_X2"))
    assert(m("X1_X2").getAs[String]("level") == "item")
  }

  test("custom nonInheritedFields + prepend off") {
    val (archives, components) = frames
    val out = Ead3Splitter
      .splitArchive(
        archives,
        components,
        unitIdLabel = Some("sig"),
        nonInherited = Seq("dao", "daoset", "accessrestrict", "custodhist"),
        prependParentTitleWithUnitId = false
      )
      .collect()
    val m = byId(out)
    val s = m("X2_S1")
    // accessrestrict + custodhist now excluded from inheritance; own
    // fields and the bibliography still flow.
    assert(s.getAs[String]("access_restrict") == "")
    assert(s.getAs[String]("did_csv") == "physloc=P-s|scopecontent=SC")
    assert(s.getAs[String]("bibliography") == "B1")
    // Root keeps its own values regardless of the exclusion list; the
    // colliding item row loses its inherited access to the exclusion.
    val root = out.filter(r => r.getString(0) == "X2" && r.getAs[String]("level") == "archdesc")(0)
    assert(root.getAs[String]("access_restrict") == "AR")
    val item = out.filter(r => r.getString(0) == "X2" && r.getAs[String]("level") == "item")(0)
    assert(item.getAs[String]("access_restrict") == "")
    // No unit-id-text prefix on parent titles.
    assert(m("X2_F1").getAs[String]("parent_title") == "St")
    val u = m("X2_U1")
    assert(u.getAs[String]("access_restrict") == "AU")
  }
}
