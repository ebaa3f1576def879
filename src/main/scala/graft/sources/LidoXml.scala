package graft.sources

import scala.xml.{Elem, Node, Text, XML}

/** Full-fidelity LIDO model (reference: Record/Lido.php). LIDO is a
  * deeply nested museum-object schema; the parse flattens exactly the
  * wraps `toSolrArray` consumes into Spark-encodable case classes, with
  * `lang` attribute inheritance (Lido.php:565 getInheritedXmlAttribute)
  * resolved during the walk. The title sets keep the reference's
  * per-set, per-language part grouping (getTitles:442) so the
  * merge-title driver params can be applied as a Column program.
  */
object LidoXml {

  /** One language's appellation parts within one titleSet. */
  final case class LangParts(lang: String, parts: Seq[String])

  /** One titleSet: preferred/alternate parts grouped per language, in
    * first-appearance order.
    */
  final case class TSet(prefG: Seq[LangParts], altG: Seq[LangParts])

  final case class Actor(name: String, role: String)

  final case class Event(
      types: Seq[String],
      actors: Seq[Actor],
      displayDates: Seq[String],
      displayPlaces: Seq[String],
      matTerms: Seq[String],
      matDisplay: Seq[String]
  )

  final case class Subject(
      typ: String,
      terms: Seq[String],
      dispDates: Seq[String],
      dispPlaces: Seq[String],
      places: Seq[String]
  )

  final case class Desc(typ: String, values: Seq[String])
  final case class Ident(typ: String, v: String)
  final case class RelWork(
      relType: String,
      displayObject: String,
      objId: String,
      objType: String
  )

  final case class Rec(
      id: String,
      titleSets: Seq[TSet],
      descriptions: Seq[Desc],
      workTypes: Seq[String],
      repoLegalNames: Seq[String],
      sourceLegalNames: Seq[String],
      recordInfoIds: Seq[Ident],
      workIds: Seq[Ident],
      subjects: Seq[Subject],
      events: Seq[Event],
      relWorks: Seq[RelWork],
      resourceLinks: Seq[String],
      allText: Seq[String]
  )

  private def ownText(n: Node): String =
    n.child.collect { case t: Text => t.data; case a: scala.xml.Atom[_] => a.text }
      .mkString

  private def attr(n: Node, name: String): Option[String] =
    n.attribute(name).map(_.text)

  /** Elements ignored by getAllFields (Lido.php:984). */
  private val IgnoredAllFields = Set(
    "conceptID", "eventType", "legalBodyWeblink", "linkResource",
    "objectMeasurementsWrap", "recordMetadataDate", "recordType",
    "resourceWrap", "relatedWorksWrap", "rightsType", "roleActor"
  )

  def parse(xml: String): Rec = {
    val root0 = XML.loadString(xml)
    val lido =
      if (root0.label == "lido") root0
      else (root0 \ "lido").headOption.getOrElse(root0)

    val id = (lido \ "lidoRecID").headOption.map(_.text).getOrElse("")

    val dmds = (lido \ "descriptiveMetadata")

    // titles — per set, per lang groupings in appellation order
    val titleSets = dmds.flatMap { dmd =>
      val dmdLang = attr(dmd, "lang").getOrElse("")
      (dmd \ "objectIdentificationWrap" \ "titleWrap" \ "titleSet").map { set =>
        val setLang = attr(set, "lang").getOrElse(dmdLang)
        var prefG = Vector.empty[(String, Vector[String])]
        var altG = Vector.empty[(String, Vector[String])]
        (set \ "appellationValue").foreach { av =>
          val v = av.text.trim
          if (v.nonEmpty) {
            val pref = attr(av, "pref").filter(_.nonEmpty).getOrElse("preferred")
            val lang = attr(av, "lang").getOrElse(setLang)
            if (pref == "preferred") {
              prefG = addPart(prefG, lang, v)
            } else {
              altG = addPart(altG, lang, v)
            }
          }
        }
        TSet(
          prefG.map { case (l, p) => LangParts(l, p) },
          altG.map { case (l, p) => LangParts(l, p) }
        )
      }
    }

    val descriptions = dmds.flatMap { dmd =>
      (dmd \ "objectIdentificationWrap" \ "objectDescriptionWrap" \
        "objectDescriptionSet").map { set =>
        Desc(
          attr(set, "type").getOrElse(""),
          (set \ "descriptiveNoteValue").map(_.text.trim)
        )
      }
    }

    val workTypes = dmds.flatMap { dmd =>
      (dmd \ "objectClassificationWrap" \ "objectWorkTypeWrap" \
        "objectWorkType").flatMap(t => (t \ "term").headOption.map(_.text))
    }

    val repoSets =
      dmds.flatMap(d => d \ "objectIdentificationWrap" \ "repositoryWrap" \ "repositorySet")
    val repoLegalNames = repoSets.flatMap(set =>
      (set \ "repositoryName" \ "legalBodyName" \ "appellationValue").headOption
        .map(_.text)
        .filter(_.nonEmpty)
    )
    val adm = (lido \ "administrativeMetadata")
    val sourceLegalNames = adm
      .flatMap(a => a \ "recordWrap" \ "recordSource")
      .flatMap(s =>
        (s \ "legalBodyName" \ "appellationValue").headOption
          .map(_.text)
          .filter(_.nonEmpty)
      )

    val recordInfoIds = adm
      .flatMap(a => a \ "recordWrap" \ "recordInfoSet")
      .flatMap(set =>
        (set \ "recordInfoID").headOption.map { info =>
          Ident(attr(info, "type").getOrElse(""), info.text)
        }
      )

    val workIds = repoSets.flatMap(set =>
      (set \ "workID").map(w => Ident(attr(w, "type").getOrElse("").trim, w.text.trim))
    )

    val subjects = dmds.flatMap { dmd =>
      (dmd \ "objectRelationWrap" \ "subjectWrap" \ "subjectSet" \ "subject").map {
        subj =>
          Subject(
            attr(subj, "type").getOrElse(""),
            (subj \ "subjectConcept" \ "term").map(_.text.trim).filter(_.nonEmpty),
            (subj \ "subjectDate" \ "displayDate").map(_.text),
            (subj \ "subjectPlace" \ "displayPlace").map(_.text),
            (subj \ "subjectPlace" \ "place").flatMap(p =>
              (p \ "namePlaceSet").flatMap(s =>
                (s \ "appellationValue").headOption.map(_.text)
              )
            )
          )
      }
    }

    val events = dmds.flatMap { dmd =>
      (dmd \ "eventWrap" \ "eventSet" \ "event").map { ev =>
        val actors = (ev \ "eventActor" \ "actorInRole").flatMap { role =>
          val name =
            (role \ "actor" \ "nameActorSet" \ "appellationValue").headOption
              .map(_.text)
          name.map(n =>
            Actor(n, (role \ "roleActor" \ "term").headOption.map(_.text).getOrElse(""))
          )
        }
        Event(
          (ev \ "eventType" \ "term").map(_.text.toLowerCase),
          actors,
          (ev \ "eventDate" \ "displayDate").map(_.text),
          (ev \ "eventPlace" \ "displayPlace").map(_.text),
          (ev \ "eventMaterialsTech" \ "materialsTech" \ "termMaterialsTech" \
            "term").map(_.text),
          (ev \ "eventMaterialsTech" \ "displayMaterialsTech").map(_.text.trim)
        )
      }
    }

    val relWorks = dmds.flatMap { dmd =>
      (dmd \ "objectRelationWrap" \ "relatedWorksWrap" \ "relatedWorkSet").map {
        set =>
          RelWork(
            (set \ "relatedWorkRelType" \ "term").headOption
              .map(_.text)
              .getOrElse(""),
            (set \ "relatedWork" \ "displayObject").headOption
              .map(_.text.trim)
              .getOrElse(""),
            (set \ "relatedWork" \ "object" \ "objectID").headOption
              .map(_.text)
              .getOrElse(""),
            (set \ "relatedWork" \ "object" \ "objectType" \ "term").headOption
              .map(_.text)
              .getOrElse("")
          )
      }
    }

    val resourceLinks = adm
      .flatMap(a => a \ "resourceWrap" \ "resourceSet")
      .flatMap(set =>
        (set \ "resourceRepresentation").flatMap(r =>
          (r \ "linkResource").headOption.map(_.text.trim).filter(_.nonEmpty)
        )
      )

    // getAllFields: document-order walk from the ROOT element's children,
    // each element contributing its own (direct) trimmed text.
    def walk(n: Node): Seq[String] =
      n.child.collect { case e: Elem => e }.flatMap { e =>
        if (IgnoredAllFields.contains(e.label)) Seq.empty
        else {
          val own = ownText(e).trim
          (if (own.nonEmpty) Seq(own) else Seq.empty) ++ walk(e)
        }
      }
    val allText = walk(root0)

    Rec(
      id,
      titleSets,
      descriptions,
      workTypes,
      repoLegalNames,
      sourceLegalNames,
      recordInfoIds,
      workIds,
      subjects,
      events,
      relWorks,
      resourceLinks,
      allText
    )
  }

  private def addPart(
      groups: Vector[(String, Vector[String])],
      lang: String,
      v: String
  ): Vector[(String, Vector[String])] =
    groups.indexWhere(_._1 == lang) match {
      case -1 => groups :+ (lang -> Vector(v))
      case i  => groups.updated(i, lang -> (groups(i)._2 :+ v))
    }
}
