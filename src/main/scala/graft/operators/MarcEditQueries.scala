package graft.operators

import graft.{Q, Tables}
import graft.functions.MarcEdit._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MARC record-editing pipeline (reference: Base/Marc/Marc.php mutation
  * API — addField:353, deleteFields:379, addFieldSubfield:415,
  * updateFieldSubfield:438) over the nested
  * `array<struct<tag, subs:array<struct<code,val>>>>` model: delete local
  * 999 fields, rewrite the first 245$a, tag the 100 field with an
  * enrichment $9, append a 500 note — then extract from the edited record
  * to prove the composition. All edits are nested array expressions in one
  * codegen'd projection; the DuckDB oracle replays the identical edit
  * chain with list lambdas.
  */
object MarcEditQueries {

  private def sf(code: String, value: Column): Column =
    struct(lit(code).as("code"), value.as("val"))

  /** First `code` subfield of the occ-th `tag` field (among fields with
    * subfields), after editing.
    */
  private def firstSub(rec: Column, tag: String, occ: Int, code: String): Column = {
    val fs = filter(rec, f => f.getField("tag") === tag && size(f.getField("subs")) > 0)
    val f = get(fs, lit(occ))
    get(filter(f.getField("subs"), x => x.getField("code") === code), lit(0)).getField("val")
  }

  private def firstSubSql(rec: String, tag: String, occ: Int, code: String): String =
    s"list_filter(list_filter($rec, f -> f.tag = '$tag' AND len(f.subs) > 0)[${occ + 1}].subs, " +
      s"x -> x.code = '$code')[1].val"

  // ----- DuckDB twins of the MarcEdit operations -----

  private def deleteSql(rec: String, tag: String): String =
    s"list_filter($rec, f -> f.tag <> '$tag')"

  private def addFieldSql(rec: String, tag: String, subsSql: String): String =
    s"($rec || [struct_pack(tag := '$tag', subs := $subsSql)])"

  private def updateSql(
      rec: String,
      tag: String,
      fieldIdx: Int,
      code: String,
      subfieldIdx: Option[Int],
      newValSql: String
  ): String = {
    val newSubs = subfieldIdx match {
      case None =>
        s"($rec[i].subs || [struct_pack(code := '$code', val := $newValSql)])"
      case Some(si) =>
        s"""list_transform(range(1, len($rec[i].subs) + 1), j ->
           | CASE WHEN $rec[i].subs[j].code = '$code'
           |       AND len(list_filter(list_slice($rec[i].subs, 1, j), x -> x.code = '$code')) - 1 = $si
           | THEN struct_pack(code := $rec[i].subs[j].code, val := $newValSql)
           | ELSE $rec[i].subs[j] END)""".stripMargin.replace("\n", " ")
    }
    s"""list_transform(range(1, len($rec) + 1), i ->
       | CASE WHEN $rec[i].tag = '$tag' AND len($rec[i].subs) > 0
       |       AND len(list_filter(list_slice($rec, 1, i), g -> g.tag = '$tag' AND len(g.subs) > 0)) - 1 = $fieldIdx
       | THEN struct_pack(tag := $rec[i].tag, subs := $newSubs)
       | ELSE $rec[i] END)""".stripMargin.replace("\n", " ")
  }

  val all: Seq[Q] = Seq(
    Q(
      "marc_edit",
      (s, d) => {
        val k = col("p_partkey")
        val ks = k.cast("string")
        val author = array_join(slice(split(col("p_name"), " "), 1, 2), " ")
        def fld(tag: String, subs: Column*) =
          struct(lit(tag).as("tag"), array(subs: _*).as("subs"))
        val baseFields = Seq(
          fld("100", sf("a", author)),
          fld("245", sf("a", concat(lit("Raw title "), ks, lit(" /"))), sf("b", lit("remainder"))),
          fld("245", sf("a", concat(lit("Second "), ks))),
          fld("650", sf("a", concat(lit("Topic "), (k % 20).cast("string")))),
          fld("999", sf("a", lit("local junk")))
        )
        val rec0 = when(k % 3 === 0, array(baseFields :+ fld("999", sf("x", lit("more junk"))): _*))
          .otherwise(array(baseFields: _*))
        val r1 = deleteFields(rec0, "999")
        val r2 = updateFieldSubfield(r1, "245", 0, "a", Some(0), concat(lit("Edited title "), ks))
        val r3 = addFieldSubfield(r2, "100", 0, "9", lit("enriched"))
        val r4 = addField(r3, "500", array(sf("a", concat(lit("Note "), ks))))
        Tables
          .part(s, d)
          .select(col("p_partkey").as("record_id"), r4.as("rec"))
          .select(
            col("record_id"),
            size(col("rec")).cast("int").as("n_fields"),
            firstSub(col("rec"), "245", 0, "a").as("title"),
            firstSub(col("rec"), "245", 1, "a").as("title2"),
            firstSub(col("rec"), "500", 0, "a").as("note"),
            array_join(
              transform(
                get(filter(col("rec"), f => f.getField("tag") === "100"), lit(0)).getField("subs"),
                x => concat(x.getField("code"), lit(":"), x.getField("val"))
              ),
              "|"
            ).as("author_subs")
          )
      },
      Some {
        val ks = "cast(p_partkey as varchar)"
        val author = "array_to_string(string_split(p_name, ' ')[1:2], ' ')"
        def fld(tag: String, subs: String) = s"struct_pack(tag := '$tag', subs := $subs)"
        val baseFields = Seq(
          fld("100", s"[struct_pack(code := 'a', val := $author)]"),
          fld(
            "245",
            s"[struct_pack(code := 'a', val := 'Raw title ' || $ks || ' /'), struct_pack(code := 'b', val := 'remainder')]"
          ),
          fld("245", s"[struct_pack(code := 'a', val := 'Second ' || $ks)]"),
          fld("650", "[struct_pack(code := 'a', val := 'Topic ' || cast(p_partkey % 20 as varchar))]"),
          fld("999", "[struct_pack(code := 'a', val := 'local junk')]")
        )
        val extra = fld("999", "[struct_pack(code := 'x', val := 'more junk')]")
        val rec0 =
          s"""(CASE WHEN p_partkey % 3 = 0 THEN [${(baseFields :+ extra).mkString(", ")}]
             | ELSE [${baseFields.mkString(", ")}] END)""".stripMargin.replace("\n", " ")
        s"""SELECT record_id,
           |  cast(len(rec) as int) AS n_fields,
           |  ${firstSubSql("rec", "245", 0, "a")} AS title,
           |  ${firstSubSql("rec", "245", 1, "a")} AS title2,
           |  ${firstSubSql("rec", "500", 0, "a")} AS note,
           |  array_to_string(list_transform(
           |    list_filter(rec, f -> f.tag = '100')[1].subs,
           |    x -> x.code || ':' || x.val), '|') AS author_subs
           |FROM (
           |  SELECT record_id, ${addFieldSql("r3", "500", s"[struct_pack(code := 'a', val := 'Note ' || $ks)]")} AS rec, p_partkey, p_name
           |  FROM (
           |    SELECT record_id, ${updateSql("r2", "100", 0, "9", None, "'enriched'")} AS r3, p_partkey, p_name
           |    FROM (
           |      SELECT record_id, ${updateSql("r1", "245", 0, "a", Some(0), s"'Edited title ' || $ks")} AS r2, p_partkey, p_name
           |      FROM (
           |        SELECT p_partkey AS record_id, ${deleteSql("r0", "999")} AS r1, p_partkey, p_name
           |        FROM (SELECT p_partkey, p_name, $rec0 AS r0 FROM part) _e0) _e1) _e2) _e3) _e4""".stripMargin
      }
    )
  )
}
