package graft.sources

import scala.xml.{Elem, Node, Text, XML}

/** Forward (EN 15907 cinematographic work) model (reference:
  * Record/Forward.php). The format is a flat-ish film-archive XML; the
  * parse flattens the main element (first child of the ExchangeSet)
  * into Spark-encodable case classes, including the raw
  * document-order text walk `getAllFields` consumes (:295 — filtered
  * tags are skipped subtree-and-all; trailing-punctuation stripping
  * happens Column-side so it shares the certified formula).
  */
object ForwardXml {

  final case class Agent(name: String, activity: String)
  final case class Desc(typ: String, lang: String, text: String)

  final case class Rec(
      idValue: String,
      idTypeName: String,
      identifyingTitle: String,
      year: String,
      titleTexts: Seq[String],
      descs: Seq[Desc],
      agents: Seq[Agent],
      subjects: Seq[String],
      regions: Seq[String],
      allTextRaw: Seq[String]
  )

  /** Tags excluded from allfields (Forward.php:85). */
  private val FilterFromAllFields = Set(
    "Identifier", "RecordSource", "TitleRelationship", "Activity",
    "AgentIdentifier", "ProductionEventType", "DescriptionType", "Language"
  )

  private def ownText(n: Node): String =
    n.child.collect { case t: Text => t.data; case a: scala.xml.Atom[_] => a.text }
      .mkString

  private def first(n: Node, label: String): String =
    (n \ label).headOption.map(_.text).getOrElse("")

  def parse(xml: String): Rec = {
    val root = XML.loadString(xml)
    val main = root.child.collectFirst { case e: Elem => e }.getOrElse(root)

    val idNode = (main \ "Identifier").headOption
    val idValue = idNode.map(_.text).getOrElse("")
    val idTypeName =
      idNode.flatMap(_.attribute("IDTypeName").map(_.text)).getOrElse("")

    val titles = (main \ "Title").map(t => first(t, "TitleText"))

    val descs = (main \ "ContentDescription").map { d =>
      Desc(first(d, "DescriptionType"), first(d, "Language"), first(d, "DescriptionText"))
    }

    val agents = (main \ "HasAgent").map { a =>
      Agent(first(a, "AgentName"), first(a, "Activity"))
    }

    val subjects = (main \ "SubjectTerms").flatMap(st => (st \ "Term").map(_.text))

    val regions = (main \ "CountryOfReference").flatMap(c =>
      (c \ "Country" \ "RegionName").headOption.map(_.text).filter(_.nonEmpty)
    )

    def walk(n: Node): Seq[String] =
      n.child.collect { case e: Elem => e }.flatMap { e =>
        if (FilterFromAllFields.contains(e.label)) Seq.empty
        else {
          val own = ownText(e).trim
          (if (own.nonEmpty) Seq(own) else Seq.empty) ++ walk(e)
        }
      }

    Rec(
      idValue,
      idTypeName,
      first(main, "IdentifyingTitle"),
      first(main, "YearOfReference"),
      titles,
      descs,
      agents,
      subjects,
      regions,
      walk(main)
    )
  }
}
