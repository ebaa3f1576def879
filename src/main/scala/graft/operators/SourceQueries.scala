package graft.operators

import graft.{Q, Tables}
import graft.sources.{Iso2709, MarcInJson, MarcXml}
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
      // True MARC-in-JSON structure (leader + fields with indicators and
      // multi-subfield data fields), round-tripped through the proper
      // shape AND cross-checked against the legacy v1 parse of the same
      // logical record (Marc/Serialization/MarcInJson.php).
      "marcinjson_roundtrip",
      (s, d) => {
        import s.implicits._
        Tables
          .part(s, d)
          .select("p_partkey", "p_name", "p_type")
          .as[(Long, String, String)]
          .map { case (k, name, typ) =>
            val fields = Seq(
              MarcInJson.Field("001", "", "", s"rec$k", Nil),
              MarcInJson.Field("245", "1", "4", "", Seq("a" -> name, "b" -> typ)),
              MarcInJson.Field("100", " ", " ", "", Seq("a" -> name.split(" ").take(2).mkString(" ")))
            )
            val leader = "00000nam a2200000   4500"
            val (pl, pf) = MarcInJson.parse(MarcInJson.build(leader, fields))
            val (ll, lf) = MarcInJson.parse(MarcInJson.buildLegacyV1(leader, fields))
            val f245 = pf.find(_.tag == "245")
            (
              k,
              f245.flatMap(_.subfields.collectFirst { case ("a", v) => v }).getOrElse(""),
              f245.flatMap(_.subfields.collectFirst { case ("b", v) => v }).getOrElse(""),
              f245.map(_.ind2).getOrElse(""),
              pf.find(_.tag == "001").map(_.value).getOrElse(""),
              pf.size.toLong,
              pl == leader && ll == leader &&
                MarcInJson.toSubfields(pf).sortBy(f => (f.tag, f.code)) ==
                MarcInJson.toSubfields(lf).sortBy(f => (f.tag, f.code))
            )
          }
          .toDF(
            "record_id",
            "title",
            "subtitle",
            "ind2",
            "control_id",
            "n_fields",
            "legacy_v1_matches"
          )
      },
      Some(
        """SELECT p_partkey AS record_id, p_name AS title, p_type AS subtitle,
          |  '4' AS ind2, 'rec' || cast(p_partkey as varchar) AS control_id,
          |  cast(3 as bigint) AS n_fields, true AS legacy_v1_matches
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
    ),
    // Line-based ("tagged") MARC dialect detection (reference:
    // Utils/LineBasedMarcFormatter.php:105 convertLineBasedMarcToXml +
    // :91 getIllegalXmlCharacterCount): the subfield-delimiter format —
    // $a… (Alma), |a … (OCLC tagged) or ‡a … — is auto-detected as the
    // regex with the MOST matches over the record text (strictly-greater
    // comparison, so the first format wins ties and an all-zero record
    // falls back to the first), and illegal-XML characters are counted
    // as preg_replace replacement RUNS (consecutive bad chars count
    // once). Map-only regexp_count projections.
    Q(
      "linemarc_detect",
      (s, d) => {
        val k = col("p_partkey")
        val badRun = when(k % 5 === 0, lit("\u0001\u0002"))
          .when(k % 5 === 1, lit("\u0003"))
          .otherwise(lit(""))
        val badTail = when(k % 5 === 1, lit("\u0004")).otherwise(lit(""))
        val title = concat(lit("Title "), badRun, col("p_name"), badTail)
        val line = when(
          k % 3 === 0,
          concat(lit("245 10 $a"), title, lit("$bRemainder of title"))
        ).when(
          k % 3 === 1,
          concat(lit("245 10 |a "), title, lit(" |b Remainder"))
        ).otherwise(
          concat(lit("245 10 ‡a "), title, lit(" ‡b Remainder"))
        )
        val counts = array(
          regexp_count(line, lit("\\$[a-z0-9]")),
          regexp_count(line, lit("\\|[a-z0-9] ")),
          regexp_count(line, lit("‡[a-z0-9] "))
        )
        Tables
          .part(s, d)
          .select(
            k.as("record_id"),
            array_position(counts, array_max(counts)).as("format_idx"),
            element_at(counts, array_position(counts, array_max(counts)).cast("int"))
              .cast("long").as("n_subfields"),
            regexp_count(
              line,
              lit("[^\\x09\\x0A\\x0D\\x20-\\uD7FF\\uE000-\\uFFFD]+")
            ).cast("long").as("bad_char_runs")
          )
      },
      Some {
        s"""SELECT p_partkey AS record_id,
           |  cast(p_partkey % 3 + 1 as bigint) AS format_idx,
           |  cast(2 as bigint) AS n_subfields,
           |  cast(CASE WHEN p_partkey % 5 = 0 THEN 1 WHEN p_partkey % 5 = 1 THEN 2 ELSE 0 END as bigint) AS bad_char_runs
           |FROM part""".stripMargin
      }
    )
  )
}
