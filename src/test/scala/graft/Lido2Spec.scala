package graft

import org.apache.spark.sql.Row

/** Hand-computed fixtures for the LIDO toSolrArray tail (LidoQueries2):
  * the titleSet algorithm branches (Record/Lido.php:442 getTitles), the
  * location assembly (getLocations:236) and the Solr field block.
  */
class Lido2Spec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def row(query: String, rid: String): Row = {
    val fn = SparkEntry.queries(query)
    fn(spark, sf).where(s"record_id = '$rid'").collect()(0)
  }

  test("titles: mergeTitleValues folds a set's alternates into the preferred string") {
    val r = row("lido_titles", "lido8") // m=0
    assert(r.getAs[String]("title") == "Title 8; Alt 8")
    assert(r.getAs[String]("title_alt") == "")
  }

  test("titles: non-default-language preferred wins over default-language alternate") {
    val r = row("lido_titles", "lido9") // m=1: P_fi=base, A_en=alt
    assert(r.getAs[String]("title") == "Title 9")
    assert(r.getAs[String]("title_alt") == "Alt 9")
  }

  test("titles: mergeTitleSets dedupes repeated sets and joins distinct ones") {
    assert(row("lido_titles", "lido10").getAs[String]("title") == "Title 10") // m=2 dup sets
    assert(row("lido_titles", "lido11").getAs[String]("title") == "Title 11; Second 11") // m=3
  }

  test("titles: alternate-only records promote the alternate; nothing is left over") {
    val r = row("lido_titles", "lido12") // m=4
    assert(r.getAs[String]("title") == "Alt 12")
    assert(r.getAs[String]("title_alt") == "")
  }

  test("titles: empty title + empty work type triggers the description substitution") {
    val r = row("lido_titles", "lido13") // m=5, odd key -> no 'Lisa'
    assert(r.getAs[String]("title") == "Kuvaus 13")
  }

  test("titles: work-type-equals-title substitutes the description join") {
    val r = row("lido_titles", "lido14") // m=6, even key -> 'Lisa' kept
    assert(r.getAs[String]("title") == "Kuvaus 14; Lisa")
    assert(r.getAs[String]("title_alt") == "")
  }

  test("titles: leftover preferred language is unshifted into the alternates") {
    val r = row("lido_titles", "lido15") // m=7: en preferred chosen, fi leftover
    assert(r.getAs[String]("title") == "Second 15")
    assert(r.getAs[String]("title_alt") == "Title 15; Alt 15")
  }

  test("locations: gml anywhere vetoes the whole record") {
    val r = row("lido_locations", "lido11") // 11 % 11 == 0
    assert(r.getAs[String]("locations") == "")
    assert(r.getAs[Int]("n_locations") == 0)
  }

  test("locations: plain names explode on slash; display places split on [/;]") {
    // k=12: name 'Helsinki/Uusimaa' (no sub), display 'Tampere.' (12%5=2)
    assert(row("lido_locations", "lido12").getAs[String]("locations")
      == "Helsinki|Uusimaa|Tampere.")
    // k=4: name 'Turku' + sub -> 'name sub' kept whole, no slash split
    assert(row("lido_locations", "lido4").getAs[String]("locations")
      == "Turku Linnankatu 1|Tampere.")
    // k=5: display with both separators; preg_split keeps the space
    assert(row("lido_locations", "lido5").getAs[String]("locations")
      == "Espoo|Kauniainen| Vantaa")
  }

  test("solr fields: description blanks when it equals the title") {
    val r = row("lido_solr_fields", "lido9") // 9 % 9 == 0 -> title = desc join
    assert(r.getAs[String]("description") == "")
    assert(r.getAs[String]("title") == "Desc A 9; Desc B")
  }

  test("solr fields: iconclass subjects excluded case-insensitively; places strip trailing punct") {
    val r = row("lido_solr_fields", "lido7")
    assert(r.getAs[String]("topic") == "Taide 7|Historia")
    assert(r.getAs[String]("places") == "Helsinki|Turku")
    assert(r.getAs[String]("ctrlnum") == "(local)L7")
    assert(r.getAs[String]("identifier") == "W2-7") // 7 % 7 == 0 -> first workID empty -> fallback
  }
}
