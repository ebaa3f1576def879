package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MARC authority-record extraction (reference: Record/MarcAuthority.php —
  * getHeading:184 (100a rtrimmed of ' .', else 110/111 a + b joined with
  * ' / '), getAlternativeNames:112 (400/410 $a, unique, trimmed of '. '),
  * getUseForHeadings:141 (alternatives plus 111/411/500/510/511),
  * getOccupations:151 (374 $a), getRelatedPlaces:210 (370 $e/$f unique),
  * getRecordType:235 (Personal when a 100 field exists, else Corporate)).
  *
  * Runs over the same array<struct<tag,code,val>> record model as the
  * bibliographic MARC queries — authority files are small relative to bib
  * corpora, so in the enrichment join (enrich_authority pattern) this
  * extraction feeds the broadcast side.
  */
object AuthorityQueries {

  private def valsOf(fields: Column, tags: Seq[String], code: String): Column =
    transform(
      filter(
        fields,
        x => x.getField("tag").isin(tags.map(lit): _*) && x.getField("code") === code
      ),
      x => x.getField("val")
    )

  /** Unique values rtrimmed of the reference's '. ' mask. Sorted (unlike
    * PHP array_unique, which keeps encounter order) because DuckDB
    * list_distinct scrambles order — sorting both sides is the only
    * cross-engine-deterministic formatting.
    */
  private def uniqueTrimmed(arr: Column): Column =
    array_sort(array_distinct(transform(arr, v => rtrim(v, ". "))))

  val all: Seq[Q] = Seq(
    Q(
      "marc_authority",
      (s, d) => {
        val k = col("s_suppkey")
        val name = col("s_name")
        def f(tag: String, code: String, v: Column) =
          struct(lit(tag).as("tag"), lit(code).as("code"), v.as("val"))
        val person = array(
          f("100", "a", concat(name, lit("."))),
          f("400", "a", concat(lit("Alt "), name, lit("."))),
          f("410", "a", concat(name, lit(" Society"))),
          f("374", "a", when(k % 4 === 0, lit("Librarian")).otherwise(lit("Curator"))),
          f("370", "e", lit("Helsinki")),
          f("370", "f", when(k % 3 === 0, lit("Helsinki")).otherwise(lit("Espoo"))),
          f("500", "a", concat(lit("See also "), name))
        )
        val corporate = array(
          f("110", "a", name),
          f("110", "b", concat(lit("Dept "), (k % 5).cast("string"))),
          f("410", "a", concat(name, lit(" Group."))),
          f("370", "e", lit("Tampere")),
          f("370", "f", lit("Turku")),
          f("510", "a", concat(lit("Parent of "), name))
        )
        val doc = Tables
          .supplier(s, d)
          .select(
            concat(lit("auth"), k.cast("string")).as("record_id"),
            when(k % 2 === 0, person).otherwise(corporate).as("fields")
          )
        val fld = col("fields")
        val h100 = get(valsOf(fld, Seq("100"), "a"), lit(0))
        val h11xA = get(valsOf(fld, Seq("110", "111"), "a"), lit(0))
        val h11xB = get(valsOf(fld, Seq("110", "111"), "b"), lit(0))
        doc.select(
          col("record_id"),
          when(h100.isNotNull, rtrim(h100, " ."))
            .when(
              h11xA.isNotNull,
              concat_ws(" / ", rtrim(h11xA, ". "), rtrim(coalesce(h11xB, lit("")), ". "))
            )
            .otherwise(lit("")).as("heading"),
          when(h100.isNotNull, lit("Personal Name"))
            .otherwise(lit("Corporate Name")).as("record_type"),
          array_join(uniqueTrimmed(valsOf(fld, Seq("400", "410"), "a")), "|")
            .as("alt_names"),
          array_join(
            uniqueTrimmed(
              valsOf(fld, Seq("400", "410", "111", "411", "500", "510", "511"), "a")
            ),
            "|"
          ).as("use_for"),
          array_join(valsOf(fld, Seq("374"), "a"), "|").as("occupations"),
          array_join(
            array_sort(
              array_distinct(
                concat(valsOf(fld, Seq("370"), "e"), valsOf(fld, Seq("370"), "f"))
              )
            ),
            "|"
          ).as("related_places")
        )
      },
      Some {
        val person =
          """[
            |  struct_pack(tag := '100', code := 'a', val := s_name || '.'),
            |  struct_pack(tag := '400', code := 'a', val := 'Alt ' || s_name || '.'),
            |  struct_pack(tag := '410', code := 'a', val := s_name || ' Society'),
            |  struct_pack(tag := '374', code := 'a', val := (CASE WHEN s_suppkey % 4 = 0 THEN 'Librarian' ELSE 'Curator' END)),
            |  struct_pack(tag := '370', code := 'e', val := 'Helsinki'),
            |  struct_pack(tag := '370', code := 'f', val := (CASE WHEN s_suppkey % 3 = 0 THEN 'Helsinki' ELSE 'Espoo' END)),
            |  struct_pack(tag := '500', code := 'a', val := 'See also ' || s_name)
            |]""".stripMargin
        val corporate =
          """[
            |  struct_pack(tag := '110', code := 'a', val := s_name),
            |  struct_pack(tag := '110', code := 'b', val := 'Dept ' || cast(s_suppkey % 5 as varchar)),
            |  struct_pack(tag := '410', code := 'a', val := s_name || ' Group.'),
            |  struct_pack(tag := '370', code := 'e', val := 'Tampere'),
            |  struct_pack(tag := '370', code := 'f', val := 'Turku'),
            |  struct_pack(tag := '510', code := 'a', val := 'Parent of ' || s_name)
            |]""".stripMargin
        def vals(tags: Seq[String], code: String) = {
          val tagSet = tags.map(t => s"'$t'").mkString("[", ", ", "]")
          s"list_transform(list_filter(fields, x -> list_contains($tagSet, x.tag) AND x.code = '$code'), x -> x.val)"
        }
        def uniqTrim(arr: String) =
          s"list_sort(list_distinct(list_transform($arr, v -> rtrim(v, '. '))))"
        s"""WITH t AS (
           |  SELECT 'auth' || cast(s_suppkey as varchar) AS record_id,
           |    (CASE WHEN s_suppkey % 2 = 0 THEN $person ELSE $corporate END) AS fields
           |  FROM supplier),
           |e AS (
           |  SELECT record_id, fields,
           |    ${vals(Seq("100"), "a")}[1] AS h100,
           |    ${vals(Seq("110", "111"), "a")}[1] AS h11xa,
           |    ${vals(Seq("110", "111"), "b")}[1] AS h11xb
           |  FROM t)
           |SELECT record_id,
           |  (CASE WHEN h100 IS NOT NULL THEN rtrim(h100, ' .')
           |        WHEN h11xa IS NOT NULL THEN concat_ws(' / ', rtrim(h11xa, '. '), rtrim(coalesce(h11xb, ''), '. '))
           |        ELSE '' END) AS heading,
           |  (CASE WHEN h100 IS NOT NULL THEN 'Personal Name' ELSE 'Corporate Name' END) AS record_type,
           |  coalesce(array_to_string(${uniqTrim(vals(Seq("400", "410"), "a"))}, '|'), '') AS alt_names,
           |  coalesce(array_to_string(${uniqTrim(
            vals(Seq("400", "410", "111", "411", "500", "510", "511"), "a")
          )}, '|'), '') AS use_for,
           |  coalesce(array_to_string(${vals(Seq("374"), "a")}, '|'), '') AS occupations,
           |  coalesce(array_to_string(list_sort(list_distinct(list_concat(${vals(Seq("370"), "e")}, ${vals(
            Seq("370"),
            "f"
          )}))), '|'), '') AS related_places
           |FROM e""".stripMargin
      }
    )
  )
}
