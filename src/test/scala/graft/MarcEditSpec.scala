package graft

import graft.functions.MarcEdit._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Fixtures for the MARC editing API (Base/Marc/Marc.php mutation
  * methods): occurrence indexing skips subfield-less fields, subfield
  * occurrence counts only the target code, edits compose.
  */
class MarcEditSpec extends SparkSuite {

  import spark.implicits._

  private def rec(fields: (String, Seq[(String, String)])*) =
    Seq(1).toDF("one").select(
      array(
        fields.map { case (tag, subs) =>
          struct(
            lit(tag).as("tag"),
            array(subs.map { case (c, v) =>
              struct(lit(c).as("code"), lit(v).as("val"))
            }: _*).as("subs")
          )
        }: _*
      ).as("rec")
    )

  private def fieldsOf(row: Row): Seq[(String, Seq[(String, String)])] =
    row.getSeq[Row](0).map { f =>
      f.getAs[String]("tag") ->
        f.getSeq[Row](f.fieldIndex("subs")).map(s => (s.getString(0), s.getString(1)))
    }

  test("field occurrence index skips subfield-less fields, like the reference walk") {
    // First 650 has no subfields -> occurrence 0 of '650' is the SECOND one.
    val df = rec(
      ("650", Seq.empty),
      ("650", Seq(("a", "topic one"))),
      ("650", Seq(("a", "topic two")))
    )
    val out = df.select(
      updateFieldSubfield(col("rec"), "650", 0, "a", Some(0), lit("EDITED")).as("rec")
    ).collect()(0)
    assert(fieldsOf(out) == Seq(
      ("650", Seq.empty),
      ("650", Seq(("a", "EDITED"))),
      ("650", Seq(("a", "topic two")))
    ))
  }

  test("subfield occurrence counts only the target code") {
    val df = rec(("245", Seq(("b", "x"), ("a", "first"), ("a", "second"))))
    val out = df.select(
      updateFieldSubfield(col("rec"), "245", 0, "a", Some(1), lit("EDITED")).as("rec")
    ).collect()(0)
    assert(fieldsOf(out) == Seq(("245", Seq(("b", "x"), ("a", "first"), ("a", "EDITED")))))
  }

  test("fieldExists/subfieldExists flag the addresses the reference would throw on") {
    // Marc.php:438 throws "Field/Subfield not found" on a bad address;
    // the columnar edit is a silent no-op, with these predicates as the
    // caller-side assertion. First 650 is subfield-less, so only ONE
    // addressable 650 exists.
    val df = rec(
      ("650", Seq.empty),
      ("650", Seq(("a", "topic one"), ("x", "sub"), ("a", "topic two")))
    )
    val out = df.select(
      fieldExists(col("rec"), "650", 0).as("f0"),
      fieldExists(col("rec"), "650", 1).as("f1"),
      fieldExists(col("rec"), "245", 0).as("f245"),
      subfieldExists(col("rec"), "650", 0, "a", 1).as("s_a1"),
      subfieldExists(col("rec"), "650", 0, "a", 2).as("s_a2"),
      subfieldExists(col("rec"), "650", 0, "z", 0).as("s_z0")
    ).collect()(0)
    assert(out.getBoolean(0) && !out.getBoolean(1) && !out.getBoolean(2))
    assert(out.getBoolean(3) && !out.getBoolean(4) && !out.getBoolean(5))
    // And the corresponding edit on a bad address really is a no-op.
    val same = df.select(
      updateFieldSubfield(col("rec"), "650", 1, "a", Some(0), lit("EDITED")).as("rec")
    ).collect()(0)
    assert(fieldsOf(same) == fieldsOf(df.select(col("rec")).collect()(0)))
  }

  test("empty record: predicates false, edits no-op, nothing throws") {
    // Zero fields — sequence(1, size) would be the descending [1, 0].
    // (array() alone types as array<void>; cast to the record schema.)
    val df = Seq(1).toDF("one").select(
      array()
        .cast("array<struct<tag:string,subs:array<struct<code:string,val:string>>>>")
        .as("rec")
    )
    val out = df.select(
      fieldExists(col("rec"), "245", 0).as("f"),
      subfieldExists(col("rec"), "245", 0, "a", 0).as("s"),
      updateFieldSubfield(col("rec"), "245", 0, "a", Some(0), lit("X")).as("rec")
    ).collect()(0)
    assert(!out.getBoolean(0) && !out.getBoolean(1))
    assert(out.getSeq[Row](2).isEmpty)
  }

  test("delete + addField + addFieldSubfield compose") {
    val df = rec(("999", Seq(("a", "junk"))), ("100", Seq(("a", "auth"))))
    val edited = df.select(
      addField(
        addFieldSubfield(deleteFields(col("rec"), "999"), "100", 0, "9", lit("mark")),
        "500",
        array(struct(lit("a").as("code"), lit("note").as("val")))
      ).as("rec")
    ).collect()(0)
    assert(fieldsOf(edited) == Seq(
      ("100", Seq(("a", "auth"), ("9", "mark"))),
      ("500", Seq(("a", "note")))
    ))
  }
}
