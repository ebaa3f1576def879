package graft

import graft.functions.MetadataFunctions._
import graft.functions.Wkt
import org.apache.spark.sql.functions._

/** Edge-case fixtures for the round-3 profile extractors, MULTI* WKT
  * centroids, and the web-corpus shaping operators.
  */
class ProfileSpec extends SparkSuite {

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)
  }

  test("stripTrailingPunctuationPreserve keeps punctuation-only strings") {
    assert(one(stripTrailingPunctuationPreserve(lit("/:"))) == "/:")
    assert(one(stripTrailingPunctuationPreserve(lit("Title /"))) == "Title")
  }

  test("MULTIPOLYGON centroid is the exact area-weighted union centroid") {
    // Unit square at origin (area 1, centroid .5,.5) + 2x2 square at x=10
    // (area 4, centroid 11,1): cx = (1*0.5 + 4*11)/5 = 8.9, cy = (0.5+4)/5 = 0.9
    val wkt = "MULTIPOLYGON(((0 0, 1 0, 1 1, 0 1, 0 0)),((10 0, 12 0, 12 2, 10 2, 10 0)))"
    assert(one(Wkt.centroidX(lit(wkt))) == 8.9)
    assert(one(Wkt.centroidY(lit(wkt))) == 0.9)
  }

  test("MULTIPOINT centroid handles both WKT spellings") {
    assert(one(Wkt.centroidX(lit("MULTIPOINT(0 0, 4 2)"))) == 2.0)
    assert(one(Wkt.centroidX(lit("MULTIPOINT((0 0),(4 2))"))) == 2.0)
  }

  test("winding order does not change the multipolygon centroid") {
    // Same union as above but the second ring is clockwise: the shoelace
    // sums change sign together, so the centroid must be identical.
    val cw = "MULTIPOLYGON(((0 0, 0 1, 1 1, 1 0, 0 0)),((10 0, 10 2, 12 2, 12 0, 10 0)))"
    // Mixed orientation would cancel area (a genuine hole); rings of one
    // multipolygon union share orientation in well-formed data.
    assert(one(Wkt.centroidX(lit(cw))) == 8.9)
  }

  test("qdc-style format buckets: preferred type wins, excluded skipped") {
    // Covered end-to-end by the qdc_extract oracle; spot-check the
    // registered query on sf0.001 for the three format cases.
    val df = operators.ProfileQueries.all.head.fn(spark, "/root/testdata/sf0.001")
    val rows = df
      .select(col("record_id"), col("format"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(rows("qdc3") == "Video") // k%3==0 -> preferred 'media' bucket
    assert(rows("qdc1") == "Text") // fallback to first collected bucket
    assert(rows("qdc11") == "Unknown") // k%11==0, k%3!=0 -> nothing collected
  }

  test("doaj title split keeps inner colons in the remainder") {
    import spark.implicits._
    val title = lit("A : B : C")
    val parts = split(title, " : ", 2)
    val r = Seq(1).toDF("x").select(element_at(parts, 1), element_at(parts, 2)).collect()(0)
    assert(r.getString(0) == "A" && r.getString(1) == "B : C")
  }

  test("880 linking appends alternate script only for the linked occurrence") {
    val df = operators.MarcSubjectQueries.all.head.fn(spark, "/root/testdata/sf0.001")
    val rows = df
      .select(col("record_id"), col("author"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    // k=6: k%3==0 (aut relator) and k%2==0 (880-01 link present)
    assert(rows("m6") == "Author 6, First. Alt 6")
    // k=3: aut relator, odd -> no link, trailing period stripped
    assert(rows("m3") == "Author 3, First")
    // k=4: k%3==1 -> edt relator, no primary match
    assert(rows("m4") == "")
  }

  test("chunking covers every token and overlaps by len-stride") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val tokens = split(lit(text), " ")
    val starts = sequence(lit(0), greatest(size(tokens) - 1, lit(0)), lit(48))
    val chunks = Seq(1)
      .toDF("x")
      .select(explode(starts).as("st"))
      .select(slice(tokens, col("st") + 1, lit(64)).as("c"))
      .collect()
      .map(_.getSeq[String](0))
    // starts 0,48,96,144 -> 4 chunks; union covers all 150 tokens
    assert(chunks.length == 4)
    assert(chunks.flatten.toSet.size == 150)
    // consecutive chunks share 64-48=16 tokens
    assert(chunks(0).toSet.intersect(chunks(1).toSet).size == 16)
    // last chunk is the clamped tail
    assert(chunks(3).length == 6)
  }

  test("url canonicalization re-anchors the query after leading-utm removal") {
    val u = lit("HTTPS://Ex.COM:443/p?utm_a=1&id=2#frag")
    val noFrag = regexp_replace(u, "#.*$", "")
    val head = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val lowered = concat(lower(head), noFrag.substr(length(head) + 1, length(noFrag)))
    val noPort = regexp_replace(lowered, "^(https://[^/:?#]+):443", "$1")
    val noUtm = regexp_replace(noPort, "[?&]utm_[^&#]*", "")
    val requery = regexp_replace(noUtm, "^([^?&]*)&", "$1?")
    val canon = regexp_replace(requery, "\\?$", "")
    assert(one(canon) == "https://ex.com/p?id=2")
  }
}
