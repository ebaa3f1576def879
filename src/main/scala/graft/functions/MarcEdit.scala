package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MARC record editing over the nested columnar model
  * `array<struct<tag:string, subs:array<struct<code:string,val:string>>>>`
  * (reference: Base/Marc/Marc.php — addField:353, deleteFields:379,
  * filterFields:398, addFieldSubfield:415, updateFieldSubfield:438).
  *
  * The reference mutates a per-record PHP array; here every edit is a pure
  * array expression, so whole batches of records edit inside one codegen'd
  * projection — no shuffle, no UDF, and edits compose by nesting columns.
  * Field occurrence indexes are 0-based among fields of the tag that have
  * subfields, exactly like the reference's `$currentFieldIdx` walk (fields
  * without subfields are skipped when counting); subfield occurrence
  * indexes count only subfields with the target code.
  */
object MarcEdit {

  /** deleteFields: drop every field with the tag. */
  def deleteFields(rec: Column, tag: String): Column =
    filter(rec, f => f.getField("tag") =!= tag)

  /** filterFields: generic keep-predicate filter. */
  def filterFields(rec: Column, keep: Column => Column): Column =
    filter(rec, keep)

  /** addField: append a new data field at the end (the reference appends
    * to the field list — no tag-order re-sort).
    */
  def addField(rec: Column, tag: String, subs: Column): Column =
    concat(rec, array(struct(lit(tag).as("tag"), subs.as("subs"))))

  /** 0-based occurrence index of position `i` among fields of `tag` that
    * carry subfields (the reference walk ignores subfield-less fields).
    */
  private def occIndex(rec: Column, i: Column, tag: String): Column =
    size(
      filter(
        slice(rec, lit(1), i),
        g => g.getField("tag") === tag && size(g.getField("subs")) > 0
      )
    ) - 1

  /** updateFieldSubfield: with `subfieldIdx = None` appends a new subfield
    * (addFieldSubfield); with `Some(j)` rewrites the j-th occurrence of
    * `code` in the fieldIdx-th `tag` field.
    *
    * DIVERGENCE from the reference: Marc.php:438 throws a
    * RuntimeException ("Field/Subfield ... not found") when the addressed
    * field or subfield occurrence does not exist, while this expression
    * is a SILENT NO-OP on the missing address — a per-row columnar
    * expression cannot usefully throw (one bad record would fail the
    * whole task). Edit pipelines that need the reference's fail-fast
    * addressing should assert on [[fieldExists]]/[[subfieldExists]]
    * first (e.g. quarantine rows where the predicate is false before
    * applying the edit).
    */
  def updateFieldSubfield(
      rec: Column,
      tag: String,
      fieldIdx: Int,
      code: String,
      subfieldIdx: Option[Int],
      newValue: Column
  ): Column = when(size(rec) === 0, rec).otherwise(
    transform(
      sequence(lit(1), size(rec)),
      i => {
        val f = element_at(rec, i)
        val subs = f.getField("subs")
        val isTarget = f.getField("tag") === tag && size(subs) > 0 &&
          occIndex(rec, i, tag) === fieldIdx
        val newSubs = subfieldIdx match {
          case None =>
            concat(subs, array(struct(lit(code).as("code"), newValue.as("val"))))
          case Some(si) =>
            transform(
              sequence(lit(1), size(subs)),
              j => {
                val sfj = element_at(subs, j)
                val subOcc =
                  size(filter(slice(subs, lit(1), j), x => x.getField("code") === code)) - 1
                when(
                  sfj.getField("code") === code && subOcc === si,
                  struct(sfj.getField("code").as("code"), newValue.as("val"))
                ).otherwise(sfj)
              }
            )
        }
        when(isTarget, struct(f.getField("tag").as("tag"), newSubs.as("subs")))
          .otherwise(f)
      }
    )
  )

  /** True iff the fieldIdx-th subfield-carrying `tag` field exists —
    * the address-validity predicate matching the reference's "Field not
    * found" RuntimeException condition (Marc.php:438), exposed so
    * callers can assert/quarantine instead of silently no-op'ing.
    */
  def fieldExists(rec: Column, tag: String, fieldIdx: Int): Column =
    size(
      filter(rec, g => g.getField("tag") === tag && size(g.getField("subs")) > 0)
    ) > fieldIdx

  /** True iff the subfieldIdx-th occurrence of `code` exists in the
    * fieldIdx-th `tag` field (the "Subfield not found" condition).
    */
  def subfieldExists(
      rec: Column,
      tag: String,
      fieldIdx: Int,
      code: String,
      subfieldIdx: Int
  ): Column =
    // The size guard matters: sequence(1, 0) on an EMPTY record yields
    // the descending [1, 0], and element_at(rec, 0) throws in every SQL
    // mode — the exact task-killing failure these predicates exist to
    // prevent.
    size(rec) > 0 && exists(
      sequence(lit(1), size(rec)),
      i => {
        val f = element_at(rec, i)
        val subs = f.getField("subs")
        f.getField("tag") === tag && size(subs) > 0 &&
        occIndex(rec, i, tag) === fieldIdx &&
        size(filter(subs, x => x.getField("code") === code)) > subfieldIdx
      }
    )

  /** addFieldSubfield: append a subfield to the fieldIdx-th `tag` field. */
  def addFieldSubfield(
      rec: Column,
      tag: String,
      fieldIdx: Int,
      code: String,
      value: Column
  ): Column =
    updateFieldSubfield(rec, tag, fieldIdx, code, None, value)
}
