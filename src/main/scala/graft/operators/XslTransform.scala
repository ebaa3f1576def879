package graft.operators

import java.io.{StringReader, StringWriter}
import javax.xml.transform.{ErrorListener, Templates, TransformerException, TransformerFactory}
import javax.xml.transform.stream.{StreamResult, StreamSource}

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real XSL transformation execution — the reference's
  * `Utils/XslTransformation.php:1-214` (stylesheet + ini-config params,
  * `transform` to XML, `transformToSolrArray` extracting `<field name=…>`
  * elements) and `Record/PreTransformationTrait.php:57-105` (a CHAIN of
  * pre-transformation stylesheets with source_id/institution/format/
  * id_prefix parameters, applied before record splitting).
  *
  * Engine: the JDK's built-in JAXP XSLT 1.0 processor — no external
  * dependency. This is the one operator family where `mapPartitions` is
  * the honest Spark shape (preference order (d)): an XSLT engine is
  * genuinely imperative per record, inexpressible as column expressions.
  * The distribution story is still right: the stylesheet SOURCE (a small
  * string) ships in the closure, `Templates` compiles ONCE per partition
  * (it is thread-safe and reusable; per-row `newTransformer()` is cheap),
  * rows never leave their partition, and there is no shuffle — the stage
  * fuses with the scan. At 100 TB this is a map-only pass exactly like
  * the reference's per-record loop, but partition-parallel.
  *
  * Error handling mirrors the reference's throw-per-record converted to
  * quarantine semantics: a row whose XML fails to parse or transform
  * yields `ok = false` and an empty result instead of failing the task
  * (one bad record must not kill a 10⁹-record job); callers route
  * `!ok` rows to a quarantine sink.
  */
object XslTransform {

  /** Compile a stylesheet + run the chain over (id, xml) rows.
    * Stylesheets apply in order, serializing between stages (the
    * reference's reParseTransformed path; identical result to DOM
    * chaining for well-formed intermediates).
    */
  def transformRows(
      ds: Dataset[(Long, String)],
      stylesheets: Seq[String],
      params: Map[String, String]
  ): Dataset[(Long, String, Boolean)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val factory = TransformerFactory.newInstance()
      factory.setErrorListener(Quiet)
      // Hardened against XXE/entity-expansion: secure processing plus
      // blocked external DTD/stylesheet access, so a record carrying
      // <!DOCTYPE r [<!ENTITY x SYSTEM "file:...">]> quarantines instead
      // of resolving files/URLs on the executor. (The xml_entity_scan
      // operator is the audit-side complement; this is the enforcement.)
      factory.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
      for (attr <- Seq(
          javax.xml.XMLConstants.ACCESS_EXTERNAL_DTD,
          javax.xml.XMLConstants.ACCESS_EXTERNAL_STYLESHEET
        ))
        try factory.setAttribute(attr, "")
        catch { case _: IllegalArgumentException => () } // pre-JAXP-1.5 impls
      val templates: Seq[Templates] =
        stylesheets.map(s => factory.newTemplates(new StreamSource(new StringReader(s))))
      it.map { case (id, xml) =>
        try {
          var cur = xml
          templates.foreach { t =>
            val tr = t.newTransformer()
            tr.setErrorListener(Quiet)
            params.foreach { case (k, v) => tr.setParameter(k, v) }
            val out = new StringWriter()
            tr.transform(new StreamSource(new StringReader(cur)), new StreamResult(out))
            cur = out.toString
          }
          (id, cur, true)
        } catch {
          case _: TransformerException | _: RuntimeException => (id, "", false)
        }
      }
    }
  }

  /** Swallow warnings, rethrow errors — keeps executor logs clean while
    * preserving the per-row quarantine path.
    */
  private object Quiet extends ErrorListener with Serializable {
    def warning(e: TransformerException): Unit = ()
    def error(e: TransformerException): Unit = throw e
    def fatalError(e: TransformerException): Unit = throw e
  }

  /** Minimal XML content escaping for synthesized element text. */
  def xmlEscape(c: Column): Column =
    replace(replace(replace(c, lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))

  /** Identity copy + provider override — the semantics of the shipped
    * `transformations/ese2ese.xsl` (replace `europeana:provider` content
    * with the `$provider` parameter, copy everything else), authored
    * fresh with the param declared as XSLT 1.0 requires.
    */
  val EseProviderXsl: String =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
      |    xmlns:europeana="http://www.europeana.eu/schemas/ese/">
      |  <xsl:output method="xml"/>
      |  <xsl:param name="provider"/>
      |  <xsl:template match="/ | @* | node()">
      |    <xsl:copy><xsl:apply-templates select="@* | node()"/></xsl:copy>
      |  </xsl:template>
      |  <xsl:template match="europeana:provider">
      |    <europeana:provider><xsl:value-of select="$provider"/></europeana:provider>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** Namespace strip — the semantics of `transformations/strip_namespaces.xsl`
    * (re-create every element/attribute under its local name).
    */
  val StripNamespacesXsl: String =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:output method="xml"/>
      |  <xsl:template match="/|comment()|processing-instruction()">
      |    <xsl:copy><xsl:apply-templates/></xsl:copy>
      |  </xsl:template>
      |  <xsl:template match="*">
      |    <xsl:element name="{local-name()}"><xsl:apply-templates select="@*|node()"/></xsl:element>
      |  </xsl:template>
      |  <xsl:template match="@*">
      |    <xsl:attribute name="{local-name()}"><xsl:value-of select="."/></xsl:attribute>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** Type mapping + id prefixing — the semantics of
    * `transformations/elka.xsl` (movingImage → MotionPicture, everything
    * else Unknown) plus the PreTransformationTrait's `id_prefix`
    * parameter applied to the record id.
    */
  val TypeMapXsl: String =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:output method="xml"/>
      |  <xsl:param name="id_prefix"/>
      |  <xsl:template match="/ | @* | node()">
      |    <xsl:copy><xsl:apply-templates select="@* | node()"/></xsl:copy>
      |  </xsl:template>
      |  <xsl:template match="type">
      |    <type><xsl:choose>
      |      <xsl:when test=".='movingImage'">MotionPicture</xsl:when>
      |      <xsl:otherwise>Unknown</xsl:otherwise>
      |    </xsl:choose></type>
      |  </xsl:template>
      |  <xsl:template match="id">
      |    <id><xsl:value-of select="concat($id_prefix, .)"/></id>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** Emit Solr `<field name=…>` elements — the import-stylesheet shape
    * `transformToSolrArray` consumes (XslTransformation.php:178-214;
    * cf. `transformations/MARC21slim2OAIDC.xsl`).
    */
  val FieldEmitXsl: String =
    """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
      |  <xsl:output method="xml"/>
      |  <xsl:template match="/record">
      |    <doc>
      |      <field name="id"><xsl:value-of select="id"/></field>
      |      <field name="language"><xsl:value-of select="lang"/></field>
      |      <xsl:for-each select="title">
      |        <field name="title"><xsl:value-of select="."/></field>
      |      </xsl:for-each>
      |    </doc>
      |  </xsl:template>
      |</xsl:stylesheet>""".stripMargin

  /** documents → synthesized ESE-ish XML (namespaced provider + title
    * from the first 40 chars of text, escaped). Rows where
    * doc_id % 97 == 0 get deliberately malformed XML to exercise the
    * quarantine path.
    */
  private def eseXmlOf(docs: DataFrame): DataFrame = {
    val title = xmlEscape(substring(col("text"), 1, 40))
    val good = concat(
      lit("""<record xmlns:europeana="http://www.europeana.eu/schemas/ese/"><europeana:provider>"""),
      xmlEscape(col("source")),
      lit("</europeana:provider><title>"),
      title,
      lit("</title></record>")
    )
    docs.select(
      col("doc_id"),
      col("text"),
      col("lang"),
      col("source"),
      when(col("doc_id") % 97 === 0, lit("<record><broken")).otherwise(good).as("xml")
    )
  }

  val all: Seq[Q] = Seq(
    Q(
      // Real-stylesheet execution certified against ese2ese.xsl's
      // semantics: provider replaced by the parameter, sibling content
      // copied through untouched, malformed rows quarantined. The oracle
      // computes the post-transform values in closed form — producing
      // them on the Spark side requires actually running the XSLT.
      "transform_xsl",
      (s, d) => {
        import s.implicits._
        val src = eseXmlOf(Tables.documents(s, d))
        val out = transformRows(
          src.select(col("doc_id"), col("xml")).as[(Long, String)],
          Seq(EseProviderXsl),
          Map("provider" -> "FinnaTest")
        ).toDF("doc_id", "out_xml", "ok")
        out.select(
          col("doc_id"),
          col("ok"),
          when(col("ok"), xpath_string(col("out_xml"), lit("//*[name()='europeana:provider']")))
            .otherwise(lit("")).as("provider"),
          when(col("ok"), xpath_string(col("out_xml"), lit("//title")))
            .otherwise(lit("")).as("title")
        )
      },
      Some(
        """SELECT doc_id,
          |  (doc_id % 97 != 0) AS ok,
          |  CASE WHEN doc_id % 97 != 0 THEN 'FinnaTest' ELSE '' END AS provider,
          |  CASE WHEN doc_id % 97 != 0 THEN substr(text, 1, 40) ELSE '' END AS title
          |FROM documents""".stripMargin
      )
    ),
    Q(
      // transformToSolrArray: run a field-emitting import stylesheet,
      // then extract the named fields — repeated names accumulate into
      // an array exactly like XslTransformation.php:196-209.
      "xsl_solr_array",
      (s, d) => {
        import s.implicits._
        val title = xmlEscape(substring(col("text"), 1, 30))
        val src = Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            concat(
              lit("<record><id>"), col("doc_id").cast("string"),
              lit("</id><lang>"), col("lang"),
              lit("</lang><title>"), title,
              lit("</title><title>"), xmlEscape(col("source")),
              lit("</title></record>")
            ).as("xml")
          )
        val out = transformRows(
          src.select(col("doc_id"), col("xml")).as[(Long, String)],
          Seq(FieldEmitXsl),
          Map.empty
        ).toDF("doc_id", "out_xml", "ok")
        out.select(
          col("doc_id"),
          xpath_string(col("out_xml"), lit("//field[@name='id']")).as("id_field"),
          xpath_string(col("out_xml"), lit("//field[@name='language']")).as("language"),
          // Serialized (not ArrayType): the driver's canonical sort/hash
          // cannot order array cells (round-5 harness crash); a delimited
          // string carries the same multi-value evidence and is hashable.
          array_join(
            xpath(col("out_xml"), lit("//field[@name='title']/text()")),
            "\u001f"
          ).as("titles"),
          size(xpath(col("out_xml"), lit("//field"))).as("n_fields")
        )
      },
      Some(
        """SELECT doc_id,
          |  cast(doc_id as varchar) AS id_field,
          |  lang AS language,
          |  substr(text, 1, 30) || chr(31) || source AS titles,
          |  4 AS n_fields
          |FROM documents""".stripMargin
      )
    ),
    Q(
      // PreTransformationTrait chain: strip namespaces, THEN map types
      // and prefix ids with the trait's id_prefix parameter — stage 2's
      // unprefixed matches only fire because stage 1 ran first, proving
      // real sequential stylesheet application.
      "pretransform_records",
      (s, d) => {
        import s.implicits._
        val typ = when(col("lang") === "en", lit("movingImage")).otherwise(lit("text"))
        val src = Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            concat(
              lit("""<rec xmlns="urn:x-demo:source"><id>"""),
              col("doc_id").cast("string"),
              lit("</id><type>"), typ,
              lit("</type></rec>")
            ).as("xml")
          )
        val out = transformRows(
          src.select(col("doc_id"), col("xml")).as[(Long, String)],
          Seq(StripNamespacesXsl, TypeMapXsl),
          Map("id_prefix" -> "demo.", "source_id" -> "demo", "format" -> "ese")
        ).toDF("doc_id", "out_xml", "ok")
        out.select(
          col("doc_id"),
          col("ok"),
          xpath_string(col("out_xml"), lit("//id")).as("prefixed_id"),
          xpath_string(col("out_xml"), lit("//type")).as("mapped_type")
        )
      },
      Some(
        """SELECT doc_id, true AS ok,
          |  'demo.' || cast(doc_id as varchar) AS prefixed_id,
          |  CASE WHEN lang = 'en' THEN 'MotionPicture' ELSE 'Unknown' END AS mapped_type
          |FROM documents""".stripMargin
      )
    )
  )
}
