package graft

import graft.operators.XslTransform
import org.apache.spark.sql.functions._

/** Fixture-level behavior of the real XSLT engine path
  * (Utils/XslTransformation.php, Record/PreTransformationTrait.php):
  * quarantine on malformed input, namespace stripping, parameter
  * injection, sequential chaining, and repeated-field accumulation.
  */
class XslSpec extends SparkSuite {

  import spark.implicits._

  test("malformed XML rows quarantine (ok=false) without failing the task") {
    val rows = Seq(
      (1L, "<a><b>x</b></a>"),
      (2L, "<a><unclosed"),
      (3L, "not xml at all")
    ).toDS()
    val out = XslTransform
      .transformRows(rows, Seq(XslTransform.StripNamespacesXsl), Map.empty)
      .collect()
      .map(t => t._1 -> t._3)
      .toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("external entities do not resolve (XXE hardening): row quarantines or inlines nothing") {
    val evil =
      """<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/hostname">]><r>&x;</r>"""
    val out = XslTransform
      .transformRows(Seq((1L, evil)).toDS(), Seq(XslTransform.StripNamespacesXsl), Map.empty)
      .collect()(0)
    // Secure processing must either reject the document (ok=false) or
    // at minimum never leak resolved file content into the output.
    assert(!out._3 || !out._2.contains("\n") && out._2.replaceAll("<[^>]*>", "").trim.isEmpty)
  }

  test("chain order matters: strip namespaces THEN unprefixed matches fire") {
    val xml = """<r xmlns="urn:x"><id>7</id><type>movingImage</type></r>"""
    val one = XslTransform
      .transformRows(Seq((1L, xml)).toDS(), Seq(XslTransform.TypeMapXsl), Map("id_prefix" -> "p."))
      .collect()(0)
    // Without the strip stage the namespaced <type> never matches the
    // unprefixed template — content passes through unchanged.
    assert(one._3 && one._2.contains("movingImage") && !one._2.contains("p.7"))
    val two = XslTransform
      .transformRows(
        Seq((1L, xml)).toDS(),
        Seq(XslTransform.StripNamespacesXsl, XslTransform.TypeMapXsl),
        Map("id_prefix" -> "p.")
      )
      .collect()(0)
    assert(two._3 && two._2.contains("MotionPicture") && two._2.contains("p.7"))
  }

  test("stylesheet parameters reach the transform (ese provider override)") {
    val xml =
      """<record xmlns:europeana="http://www.europeana.eu/schemas/ese/">""" +
        "<europeana:provider>Old</europeana:provider><title>T</title></record>"
    val out = XslTransform
      .transformRows(Seq((1L, xml)).toDS(), Seq(XslTransform.EseProviderXsl), Map("provider" -> "New"))
      .collect()(0)
    assert(out._3)
    assert(out._2.contains("<europeana:provider>New</europeana:provider>"))
    assert(out._2.contains("<title>T</title>"))
  }

  test("repeated field names accumulate into an array (transformToSolrArray)") {
    val xml = "<record><id>9</id><lang>en</lang><title>A</title><title>B</title></record>"
    val out = XslTransform
      .transformRows(Seq((9L, xml)).toDS(), Seq(XslTransform.FieldEmitXsl), Map.empty)
      .toDF("doc_id", "out_xml", "ok")
      .select(
        xpath(col("out_xml"), lit("//field[@name='title']/text()")).as("titles"),
        xpath_string(col("out_xml"), lit("//field[@name='id']")).as("id_field")
      )
      .collect()(0)
    assert(out.getSeq[String](0) == Seq("A", "B"))
    assert(out.getString(1) == "9")
  }
}
