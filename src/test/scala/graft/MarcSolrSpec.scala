package graft

import org.apache.spark.sql.Row

/** Targeted assertions for the toSolrArray tail getters
  * (MarcSolrQueries): work-key shapes, OCLC pattern precedence, music-id
  * gating, alt-title uniqueness, and the illustrated decision.
  */
class MarcSolrSpec extends SparkSuite {

  private lazy val work = SparkEntry
    .queries("marc_work_keys")(spark, "/root/testdata/sf0.001")
    .collect()
    .map(r => r.getString(0) -> r)
    .toMap

  private lazy val solr = SparkEntry
    .queries("marc_solr_fields")(spark, "/root/testdata/sf0.001")
    .collect()
    .map(r => r.getString(0) -> r)
    .toMap

  private def wk(k: Int): Row = work(s"w$k")
  private def sf(k: Int): Row = solr(s"s$k")

  test("non-filing indicator emits stripped title first, then original") {
    // k=8: 245 "The Title 8" with ind2=4 -> "Title 8" + "The Title 8".
    val titles = wk(8).getAs[String]("titles")
    assert(titles.contains("title=Title 8|title=The Title 8"))
  }

  test("no titles at all means no work identification data") {
    // k=121: 121%11==0 (no 245), 121%6!=0, 121%8!=0 -> reference returns [].
    val r = wk(121)
    assert(!r.getAs[Boolean]("has_work"))
    assert(r.getAs[String]("titles") == "")
    assert(r.getAs[String]("authors") == "")
  }

  test("uniform titles precede 245 titles and analytical entries are separate works") {
    // k=60: has 130 (60%6==0) and an analytical 700 ind2=2 (60%5==0).
    val r = wk(60)
    assert(r.getAs[String]("titles").startsWith("uniform="))
    assert(r.getAs[String]("analytical_works") == "Ana Author 0~Analytical title 20")
  }

  test("oclc gate and first-match pattern strip leading zeros") {
    // k=4 -> '(OCoLC)00' || (4%9000+1) -> '5'.
    assert(sf(4).getAs[String]("oclc_numbers") == "5")
    // k=5 -> 'ocm0<n> 456' -> '6'.
    assert(sf(5).getAs[String]("oclc_numbers") == "6")
    // k=7 -> 'local7' fails the prefix gate.
    assert(sf(7).getAs[String]("oclc_numbers") == "")
  }

  test("music ids only for leader/06 = j and mapped indicator-1 types") {
    // k=1: leader j (1%4==1), ind1='1' (1%6==1) -> upc.
    assert(sf(1).getAs[String]("music_ids") == "MID1~upc")
    // k=17: leader j, ind1='5' (17%6==5) -> excluded indicator.
    assert(sf(17).getAs[String]("music_ids") == "")
    // k=2: leader 't' -> not music even though 024 present.
    assert(sf(2).getAs[String]("music_ids") == "")
  }

  test("alt titles are unique (740 duplicate of 130 collapses)") {
    // k=30: 130='Uniform title 5' and 740 equals it (30%30==0).
    val alts = sf(30).getAs[String]("alt_titles").split('|')
    assert(alts.count(_ == "Uniform title 5") == 1)
  }

  test("illustrated from 008 codes only under leader a|t; 300$b applies always") {
    // k=12: leader 'a' (12%4==0), 008 block has 'a' (12%3==0) -> Illustrated.
    assert(sf(12).getAs[String]("illustrated") == "Illustrated")
    // k=9: leader 'j' (9%4==1), 008 has code but leader not a|t, 9%5!=0 -> Not.
    assert(sf(9).getAs[String]("illustrated") == "Not Illustrated")
    // k=5: leader 'j', no 008 code, but 300$b has 'ill.' (5%5==0) -> Illustrated.
    assert(sf(5).getAs[String]("illustrated") == "Illustrated")
  }

  test("dois merge 024 $2=doi and 856$u URL forms with query cut") {
    // k=10: 856 https://doi.org/10.5678/y10?utm=z -> 10.5678/y10.
    assert(sf(10).getAs[String]("dois") == "10.5678/y10")
    // k=5: 024 doi only (5%4==1).
    assert(sf(5).getAs[String]("dois") == "10.1234/x5")
  }

  test("allFieldsRollup edge semantics on a hand-built record") {
    import org.apache.spark.sql.functions._
    import graft.operators.MarcSolrQueries2.allFieldsRollup
    def f(tag: String, code: String, v: String) =
      struct(lit(tag).as("tag"), lit(code).as("code"), lit(v).as("val"))
    val fields = array(
      f("099", "a", "local call"), // tag < 100 -> excluded
      f("100", "a", "Smith, Jo."), // trailing period after letters dropped
      f("245", "a", "..."), // punctuation-only: leading strip preserves it
      f("650", "0", "(uri)x"), // excluded code for 650
      f("650", "a", "Dogs"),
      f("840", "a", "Last in-range tag"), // 840 < 841 -> included
      f("841", "a", "First out-of-range"), // 841 excluded
      f("856", "u", "http://x"), // 856$u kept, $q excluded
      f("856", "q", "pdf"),
      f("880", "a", "Dogs"), // duplicate after strip -> deduped
      f("900", "a", "local note") // > 841, not 856/880 -> excluded
    )
    val out = spark
      .range(1)
      .select(allFieldsRollup(fields).as("vals"))
      .head()
      .getSeq[String](0)
    // "..." is preserved by the leading strip (punctuation-only rule);
    // the trailing strip then drops a single period -> "..".
    assert(out.contains(".."))
    assert(out.head == "Smith, Jo")
    assert(out.contains("Dogs") && out.count(_ == "Dogs") == 1)
    assert(out.contains("Last in-range tag"))
    assert(!out.exists(_.contains("local")))
    assert(!out.contains("First out-of-range"))
    assert(!out.contains("(uri)x") && !out.contains("pdf"))
    assert(out.contains("http://x"))
  }
}
