package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Value/field mapping (reference: src/RecordManager/Base/Utils/
  * FieldMapper.php — `mapValue`:224, `mapValues`:172 and the `mappings/
  * *.map` file format with `##default` / `##empty` pseudo-entries).
  *
  * In Spark a mapping file is a tiny dimension table applied with a
  * broadcast hash join — no shuffle of the fact side, which is what makes
  * the construct free at 100 TB. Regexp mappings (`type=regexp`) are a
  * first-match `CASE` chain of `rlike`/`regexp_replace`, fully codegen'd.
  */
object FieldMapping {

  /** A parsed mapping: ordinary `key = value` entries plus the reference's
    * `##default` (used when a non-empty value has no entry) and `##empty`
    * (used when the input value is empty).
    */
  final case class Mapping(
      entries: Seq[(String, String)],
      default: Option[String] = None,
      empty: Option[String] = None,
      /** `##emptyarray`: like `##empty` but the reference wraps the value
        * in an array; `##empty` wins when both are configured
        * (FieldMapper.php:205-210).
        */
      emptyArray: Option[String] = None,
      /** `##mappedempty(array)`: substituted when a non-empty input maps
        * to nothing (all values mapped to '' and were filtered out,
        * FieldMapper.php:197-204).
        */
      mappedEmpty: Option[String] = None
  )

  /** Apply a normal mapping to `df`'s column `valueCol` via broadcast join,
    * writing `outCol`. Mirrors FieldMapper.php:176,290-297: a NON-EMPTY
    * value maps to its entry, else `##default`, else itself (and
    * `##mappedempty` when the result is ''); an empty input takes
    * `##empty` when configured and is otherwise left unchanged — the
    * reference never applies `##default` to empty input.
    */
  def applyMapping(
      spark: SparkSession,
      df: DataFrame,
      valueCol: String,
      outCol: String,
      mapping: Mapping
  ): DataFrame = {
    import spark.implicits._
    // Duplicate keys are last-wins, like repeated keys in a PHP map file;
    // a duplicate in the join dimension would fan out fact rows.
    val dim = mapping.entries.toMap.toSeq.toDF("__map_key", "__map_val")
    val joined = df.join(
      broadcast(dim),
      col(valueCol) === col("__map_key"),
      "left"
    )
    val defaulted = mapping.default
      .map(dv => coalesce(col("__map_val"), lit(dv)))
      .getOrElse(coalesce(col("__map_val"), col(valueCol)))
    val nonEmptyMapped = mapping.mappedEmpty match {
      case Some(me) => when(defaulted === "", lit(me)).otherwise(defaulted)
      case None => defaulted
    }
    val mapped = when(
      col(valueCol).isNull || col(valueCol) === "",
      mapping.empty.map(lit).getOrElse(col(valueCol))
    ).otherwise(nonEmptyMapped)
    joined.withColumn(outCol, mapped).drop("__map_key", "__map_val")
  }

  /** First-match regexp mapping (FieldMapper.php `type=regexp`): the first
    * pattern that matches rewrites the value; otherwise `##default` or the
    * original value.
    */
  def regexpMapping(
      valueCol: Column,
      patterns: Seq[(String, String)],
      default: Option[String]
  ): Column = {
    val fallback = default.map(lit).getOrElse(valueCol)
    patterns.foldRight(fallback) { case ((pat, repl), acc) =>
      when(valueCol.rlike(pat), regexp_replace(valueCol, pat, repl))
        .otherwise(acc)
    }
  }

  /** All-matches regexp mapping (FieldMapper.php `type=regexp-multi`:246):
    * every pattern that matches contributes its rewritten value; when none
    * match the result is `##default` (or the original value). Returns an
    * array column.
    */
  def regexpMultiMapping(
      valueCol: Column,
      patterns: Seq[(String, String)],
      default: Option[String]
  ): Column = {
    // Null (not "") is the no-match sentinel: the reference keeps a match
    // whose replacement rewrites the value to an empty string
    // (FieldMapper.php:285 `if ($newValues)` — [''] is truthy in PHP).
    val hits = filter(
      array(patterns.map { case (pat, repl) =>
        when(valueCol.rlike(pat), regexp_replace(valueCol, pat, repl))
      }: _*),
      x => x.isNotNull
    )
    when(size(hits) > 0, hits)
      .otherwise(array(default.map(lit).getOrElse(valueCol)))
  }

  /** Array-field mapping (FieldMapper.php mapValues:176-211): each
    * element maps through the entry table (`##default` fallback, else
    * identity — the reference applies this per element with no empty
    * check, so an empty-string ELEMENT takes the default too), results
    * are uniqued (first occurrence) and values that map to '' dropped;
    * a non-empty input that maps away entirely becomes `##mappedempty`,
    * an empty input array becomes `##empty`/`##emptyarray`. The mapping
    * is a tiny literal map inside `transform` — fully codegen'd, no
    * join, no shuffle, exactly what survives a 100 TB fact side.
    */
  def applyArrayMapping(arr: Column, mapping: Mapping): Column = {
    // Last-wins key dedupe: Spark's map() throws on duplicate keys under
    // the default ANSI dedup policy.
    val m = map(mapping.entries.toMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val mapped = transform(
      arr,
      v => {
        // try_element_at: missing key -> null (plain element_at throws
        // under Spark 4 ANSI mode).
        val looked = try_element_at(m, v)
        mapping.default
          .map(dv => coalesce(looked, lit(dv)))
          .getOrElse(coalesce(looked, v))
      }
    )
    val cleaned = filter(array_distinct(mapped), x => x =!= "")
    val emptyResult = mapping.empty
      .orElse(mapping.emptyArray)
      .map(v => array(lit(v)))
      .getOrElse(array().cast("array<string>"))
    val mappedEmptyResult = mapping.mappedEmpty
      .map(v => array(lit(v)))
      .getOrElse(array().cast("array<string>"))
    when(arr.isNull || size(arr) === 0, emptyResult)
      .when(size(cleaned) === 0, mappedEmptyResult)
      .otherwise(cleaned)
  }

  /** One parsed `.map` file in full generality (FieldMapper.php
    * readMappingFile): ordered entries whose targets may be multi-valued
    * (the `key[] = v` accumulation syntax, exact or regexp), a `kind`
    * (`normal` / `regexp` / `regexp-multi`), and the pseudo-entries. In
    * the scalar [[Mapping]] model above a key maps to one value; real
    * reference configs (e.g. the shipped rights.map) fan one match into
    * several values, which is what this models.
    */
  final case class MapFile(
      kind: String,
      entries: Seq[(String, Seq[String])],
      default: Option[String] = None,
      empty: Option[String] = None,
      emptyArray: Option[String] = None,
      mappedEmpty: Option[String] = None
  )

  /** FieldMapper.php:224 mapValue for one scalar value, normalized to an
    * array result (PHP returns scalar-or-array; every consumer splats).
    *  - normal: exact entry ?? `##default` ?? identity — note NO
    *    empty-input special case at this level (mapValue('') with a
    *    default yields the default; the reference's own FieldMapperTest
    *    pins this).
    *  - regexp: the FIRST entry whose pattern matches yields its
    *    targets, each applied as a `preg_replace`-style rewrite of the
    *    value; no match → default ?? identity.
    *  - regexp-multi: EVERY matching entry contributes its rewrites.
    * Entries are plan-time config, so the whole evaluator compiles to a
    * codegen'd when/array chain — no join, no UDF.
    */
  def mapOneValue(v: Column, f: MapFile): Column = {
    val fallback = array(f.default.map(lit).getOrElse(v))
    f.kind match {
      case "normal" =>
        f.entries.foldRight(fallback) { case ((k, targets), acc) =>
          when(v === k, array(targets.map(lit): _*)).otherwise(acc)
        }
      case "regexp" =>
        f.entries.foldRight(fallback) { case ((pat, targets), acc) =>
          when(v.rlike(pat), array(targets.map(t => regexp_replace(v, pat, t)): _*))
            .otherwise(acc)
        }
      case "regexp-multi" =>
        val hits = flatten(
          filter(
            array(f.entries.map { case (pat, targets) =>
              when(v.rlike(pat), array(targets.map(t => regexp_replace(v, pat, t)): _*))
            }: _*),
            x => x.isNotNull
          )
        )
        when(size(hits) > 0, hits).otherwise(fallback)
      case other => throw new IllegalArgumentException(s"unknown map kind $other")
    }
  }

  /** FieldMapper.php mapValue's predefined-hierarchy branch (:226):
    * level i of the value maps through mapping-file index i (falling
    * back to index 0 — per-level files come from configs like
    * `building_mapping[] = building.map` + `building_sub.map,regexp`),
    * the per-level results flatten into one '/'-joined string, and a
    * level that maps to scalar '' STOPS the walk (deeper levels
    * dropped). The reference's own PreviewCreatorTest pins all four
    * branch outcomes.
    */
  def mapHierarchyValue(pair: Column, files: Seq[MapFile]): Column = {
    val maxLevels = files.length
    var parts: Column = array().cast("array<string>")
    var stopped: Column = lit(false)
    for (i <- 0 until maxLevels) {
      val f = files(i)
      val mapped = mapOneValue(coalesce(get(pair, lit(i)), lit("")), f)
      val exists = size(pair) > i
      val isEmptyScalar = size(mapped) === 1 && get(mapped, lit(0)) === ""
      parts = when(!stopped && exists && !isEmptyScalar, concat(parts, mapped))
        .otherwise(parts)
      stopped = stopped || (exists && isEmptyScalar)
    }
    array_join(parts, "/")
  }

  /** FieldMapper.php:172 mapValues for one array-valued field: map each
    * element through [[mapOneValue]], flatten, dedupe preserving first
    * occurrence, drop values that mapped to '' — a non-empty input that
    * maps away entirely becomes `##mappedempty(array)`, an empty/absent
    * input `##empty`/`##emptyarray`. Map-only, codegen'd.
    */
  def mapFieldArray(arr: Column, f: MapFile): Column = {
    val mapped = flatten(transform(arr, v => mapOneValue(v, f)))
    val cleaned = filter(array_distinct(mapped), x => x =!= "")
    val emptyResult = f.empty
      .orElse(f.emptyArray)
      .map(v => array(lit(v)))
      .getOrElse(array().cast("array<string>"))
    val mappedEmptyResult = f.mappedEmpty
      .map(v => array(lit(v)))
      .getOrElse(array().cast("array<string>"))
    when(arr.isNull || size(arr) === 0, emptyResult)
      .when(size(cleaned) === 0, mappedEmptyResult)
      .otherwise(cleaned)
  }
}
