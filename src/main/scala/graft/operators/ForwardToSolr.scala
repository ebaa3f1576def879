package graft.operators

import graft.functions.{MetadataFunctions => MF}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The COMPLETE `Record/Forward.php toSolrArray` (Forward.php:157) over
  * the flattened Forward model ([[graft.sources.ForwardXml]]), as one
  * map-only Column program. Parity asserted field-by-field against the
  * reference's OWN ForwardTest expected table on forward1.xml
  * (ForwardFixtureSpec, expectations machine-converted from the PHPUnit
  * source into `src/test/resources/forward1_expected.json`).
  *
  * Getter map: getID:138 (IDTypeName_value), getTitle:254 (+
  * createSortTitle filing form), getDescriptions/getContents:446/:422
  * (primary-language pass then unfiltered fallback),
  * getAuthorsByRelator:325 (empty relator list matches EVERY agent —
  * which is why author_corporate under the default empty config carries
  * all agents), getPrimaryAuthorsSorted:392 (directors d02 first),
  * getSubjects:504, getGeographicSubjects:478, getAllFields:295.
  */
object ForwardToSolr {

  private val E = lit("")

  final case class Params(
      primaryAuthorRelators: Seq[String] =
        Seq("d02", "a00", "a03", "a06", "a50", "a99"),
      secondaryAuthorRelators: Seq[String] = Seq("d01", "e01", "f01", "f02"),
      corporateAuthorRelators: Seq[String] = Seq.empty,
      primaryLanguage: String = "en"
  )

  private def rel(a: Column): Column = MF.normalizeRelator(a("activity"))

  /** getAuthorsByRelator: empty list = all agents. */
  def agentsByRelator(agents: Column, relators: Seq[String]): Column =
    if (relators.isEmpty) agents
    else filter(agents, a => rel(a).isin(relators: _*))

  def solrColumns(rec: Column, p: Params = Params()): Seq[(String, Column)] = {
    val id = when(
      rec("idTypeName") =!= "",
      concat(rec("idTypeName"), lit("_"), rec("idValue"))
    ).otherwise(rec("idValue"))

    val title = rec("identifyingTitle")
    val titleAlt = MF.bindOnce(title) { t =>
      filter(rec("titleTexts"), v => v =!= t)
    }

    def descsOf(typ: String, lang: Option[String]): Column = {
      val base = filter(
        rec("descs"),
        d =>
          d("typ") === typ && d("text") =!= "" &&
            lang.map(l => d("lang") === l).getOrElse(lit(true))
      )
      transform(base, d => d("text"))
    }
    val description = {
      val synEn = descsOf("Synopsis", Some(p.primaryLanguage))
      val synAll = descsOf("Synopsis", None)
      val conEn = descsOf("Content description", Some(p.primaryLanguage))
      val conAll = descsOf("Content description", None)
      val syn = when(size(synEn) > 0, synEn).otherwise(synAll)
      val con = when(size(conEn) > 0, conEn).otherwise(conAll)
      array_join(concat(syn, con), " ")
    }

    val agents = rec("agents")
    val prim = agentsByRelator(agents, p.primaryAuthorRelators)
    val primSorted = concat(
      filter(prim, a => rel(a) === "d02"),
      filter(prim, a => rel(a) =!= "d02")
    )
    val secondary = agentsByRelator(agents, p.secondaryAuthorRelators)
    val corporate = agentsByRelator(agents, p.corporateAuthorRelators)
    def names(as: Column) = transform(as, a => a("name"))
    def rels(as: Column) = transform(as, a => rel(a))

    val allfields = filter(
      transform(rec("allTextRaw"), v => MF.stripTrailingPunctuation(v)),
      v => v =!= ""
    )

    Seq(
      "record_format" -> lit("forward"),
      "ctrlnum" -> id,
      "publishDate" -> rec("year"),
      "title" -> title,
      "title_alt" -> titleAlt,
      "title_full" -> title,
      "title_short" -> title,
      "title_sort" -> MF.bindOnce(title)(t => MF.createSortTitle(t)),
      "description" -> description,
      "topic_facet" -> rec("subjects"),
      "topic" -> rec("subjects"),
      "url" -> array().cast("array<string>"),
      "thumbnail" -> E,
      "author" -> names(primSorted),
      "author_role" -> rels(primSorted),
      "author_sort" -> coalesce(get(names(primSorted), lit(0)), E),
      "author2" -> names(secondary),
      "author2_role" -> rels(secondary),
      "author_corporate" -> names(corporate),
      "author_corporate_role" -> rels(corporate),
      "geographic_facet" -> rec("regions"),
      "geographic" -> rec("regions"),
      "genre_facet" -> array().cast("array<string>"),
      "genre" -> array().cast("array<string>"),
      "format" -> lit("MotionPicture"),
      "publisher" -> array().cast("array<string>"),
      "allfields" -> allfields
    )
  }
}
