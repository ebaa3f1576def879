package graft.operators

import graft.{Q, Tables}
import graft.sources.{Iso2709, MarcXml}
import graft.sources.Iso2709.Subfield
import org.apache.spark.sql.functions._

/** Wire-format codec registrations: ISO 2709 and MARCXML round trips.
  *
  * Each query serializes synthesized records to the wire format inside a
  * typed `map` (distributed, per-record), parses them back, and extracts
  * fields — so the oracle (which states the expected identity result) only
  * passes when serialize → parse → extract reproduces the inputs exactly.
  * The fused native expression `graft_normalize_key` (Catalyst
  * `Expression` with codegen, registered via GraftExtensions) is verified
  * the same way against the composed-builtin oracle.
  */
object SourceQueries {

  private def fieldsFor(k: Long, name: String, typ: String): Seq[Subfield] =
    Seq(
      Subfield("001", "", s"rec$k"),
      Subfield("245", "a", name),
      Subfield("245", "b", typ),
      Subfield("100", "a", name.split(" ").take(2).mkString(" "))
    )

  val all: Seq[Q] = Seq(
    Q(
      "iso2709_roundtrip",
      (s, d) => {
        import s.implicits._
        Tables
          .part(s, d)
          .select("p_partkey", "p_name", "p_type")
          .as[(Long, String, String)]
          .map { case (k, name, typ) =>
            val wire = Iso2709.build(fieldsFor(k, name, typ))
            val parsed = Iso2709.parse(wire)
            (
              k,
              parsed.find(f => f.tag == "245" && f.code == "a").map(_.value).getOrElse(""),
              parsed.find(f => f.tag == "001").map(_.value).getOrElse(""),
              parsed.size
            )
          }
          .toDF("record_id", "title", "control_id", "n_fields")
      },
      Some(
        """SELECT p_partkey AS record_id, p_name AS title,
          |  'rec' || cast(p_partkey as varchar) AS control_id, 4 AS n_fields
          |FROM part""".stripMargin
      )
    ),
    Q(
      "marcxml_roundtrip",
      (s, d) => {
        import s.implicits._
        Tables
          .part(s, d)
          .select("p_partkey", "p_name", "p_type")
          .as[(Long, String, String)]
          .map { case (k, name, typ) =>
            val wire = MarcXml.build(fieldsFor(k, name, typ))
            val parsed = MarcXml.parse(wire)
            (
              k,
              parsed.find(f => f.tag == "245" && f.code == "a").map(_.value).getOrElse(""),
              parsed.count(_.tag == "245")
            )
          }
          .toDF("record_id", "title", "n_245")
      },
      Some(
        """SELECT p_partkey AS record_id, p_name AS title, 2 AS n_245
          |FROM part""".stripMargin
      )
    ),
    Q(
      "norm_key_native",
      (s, d) =>
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            expr("graft_normalize_key(p_name)").as("norm_key")
          ),
      Some(
        s"SELECT p_partkey, ${MetadataQueries.nkSql("p_name")} AS norm_key FROM part"
      )
    )
  )
}
