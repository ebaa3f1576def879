package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Query registrations for field/value mapping. */
object MappingQueries {

  private val formatMapping = FieldMapping.Mapping(
    entries = Seq(
      "click" -> "Interaction",
      "view" -> "Interaction",
      "purchase" -> "Transaction",
      "signup" -> "Registration"
    ),
    default = Some("Other"),
    empty = Some("Unknown")
  )

  /** Regexp mapping over part types, first-match (FieldMapper `regexp`). */
  private val typePatterns = Seq(
    "^STANDARD ?(.*)$" -> "Std:$1",
    "^(ECONOMY|PROMO) ?(.*)$" -> "Value:$1",
    "^(SMALL|MEDIUM|LARGE)(.*)$" -> "Size:$1"
  )

  val all: Seq[Q] = Seq(
    Q(
      "map_values",
      (s, d) => {
        val input = when(col("event_id") % 10 === 0, lit("")).otherwise(col("event_type"))
        val df = Tables.events(s, d).select(col("event_id"), input.as("raw_value"))
        FieldMapping.applyMapping(s, df, "raw_value", "mapped_value", formatMapping)
      },
      Some(
        """WITH t AS (SELECT event_id,
          |  (CASE WHEN event_id % 10 = 0 THEN '' ELSE event_type END) AS raw_value FROM events),
          |m(k, v) AS (VALUES ('click','Interaction'), ('view','Interaction'),
          |                   ('purchase','Transaction'), ('signup','Registration'))
          |SELECT t.event_id, t.raw_value,
          |  CASE WHEN t.raw_value IS NULL OR t.raw_value = '' THEN 'Unknown'
          |       ELSE coalesce(m.v, 'Other') END AS mapped_value
          |FROM t LEFT JOIN m ON t.raw_value = m.k""".stripMargin
      )
    ),
    Q(
      // Array-field mapping with ##mappedempty / ##emptyarray
      // (FieldMapper.php:157,197-210): 'purchase' maps to '' (filtered
      // out), duplicates collapse, unmapped values pass through.
      "map_values_array",
      (s, d) => {
        val k = col("event_id")
        val arrMapping = FieldMapping.Mapping(
          entries = Seq(
            "click" -> "Interaction",
            "view" -> "Interaction",
            "purchase" -> "",
            "signup" -> "Registration"
          ),
          emptyArray = Some("EmptyArr"),
          mappedEmpty = Some("MappedEmpty")
        )
        val input = when(k % 5 === 0, array().cast("array<string>"))
          .when(k % 5 === 1, array(lit("click"), lit("view")))
          .when(k % 5 === 2, array(lit("purchase")))
          .when(k % 5 === 3, array(lit("signup"), lit("other")))
          .otherwise(array(lit("view"), lit("purchase"), lit("click")))
        Tables
          .events(s, d)
          .select(
            k.as("event_id"),
            array_join(FieldMapping.applyArrayMapping(input, arrMapping), "|")
              .as("mapped_values")
          )
      },
      Some(
        """SELECT event_id,
          |  (CASE event_id % 5
          |     WHEN 0 THEN 'EmptyArr'
          |     WHEN 1 THEN 'Interaction'
          |     WHEN 2 THEN 'MappedEmpty'
          |     WHEN 3 THEN 'Registration|other'
          |     ELSE 'Interaction' END) AS mapped_values
          |FROM events""".stripMargin
      )
    ),
    Q(
      "map_regexp",
      (s, d) =>
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            col("p_type"),
            FieldMapping
              .regexpMapping(col("p_type"), typePatterns, Some("Unmapped"))
              .as("mapped_type")
          ),
      Some(
        """SELECT p_partkey, p_type,
          |  CASE WHEN regexp_matches(p_type, '^STANDARD ?(.*)$') THEN regexp_replace(p_type, '^STANDARD ?(.*)$', 'Std:\1')
          |       WHEN regexp_matches(p_type, '^(ECONOMY|PROMO) ?(.*)$') THEN regexp_replace(p_type, '^(ECONOMY|PROMO) ?(.*)$', 'Value:\1')
          |       WHEN regexp_matches(p_type, '^(SMALL|MEDIUM|LARGE)(.*)$') THEN regexp_replace(p_type, '^(SMALL|MEDIUM|LARGE)(.*)$', 'Size:\1')
          |       ELSE 'Unmapped' END AS mapped_type
          |FROM part""".stripMargin
      )
    ),
    Q(
      // All-matches regexp mapping (FieldMapper `regexp-multi`:246):
      // every matching pattern contributes a value.
      "map_regexp_multi",
      (s, d) =>
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            col("p_type"),
            array_join(
              FieldMapping.regexpMultiMapping(
                col("p_type"),
                Seq(
                  ".*ANODIZED.*" -> "Anodized",
                  "^(STANDARD|PROMO).*" -> "Class:$1",
                  ".*(TIN|STEEL)$" -> "Metal:$1"
                ),
                Some("Unmapped")
              ),
              "|"
            ).as("mapped_types")
          ),
      Some(
        """SELECT p_partkey, p_type,
          |  coalesce(nullif(array_to_string(list_filter([
          |    CASE WHEN regexp_matches(p_type, '.*ANODIZED.*') THEN 'Anodized' ELSE '' END,
          |    CASE WHEN regexp_matches(p_type, '^(STANDARD|PROMO).*') THEN regexp_replace(p_type, '^(STANDARD|PROMO).*', 'Class:\1') ELSE '' END,
          |    CASE WHEN regexp_matches(p_type, '.*(TIN|STEEL)$') THEN regexp_replace(p_type, '.*(TIN|STEEL)$', 'Metal:\1') ELSE '' END
          |  ], x -> x != ''), '|'), ''), 'Unmapped') AS mapped_types
          |FROM part""".stripMargin
      )
    ),
    Q(
      // Array-valued regexp mapping over an array field — the shipped
      // rights.map shape (FieldMapper.php readMappingFile `key[] = v`
      // accumulation + mapValues:172 array path): one matching pattern
      // fans into several values, per-element results flatten, dedupe
      // (first occurrence), '' drops, and a value set that maps away
      // entirely becomes ##mappedemptyarray. Entries are plan-time
      // config → a codegen'd when/array chain, no join, no shuffle.
      "map_regexp_array",
      (s, d) => {
        val k = col("p_partkey")
        val ks = k.cast("string")
        val rights = array(
          when(k % 3 === 0, concat(lit("CC BY ND "), ks))
            .when(k % 3 === 1, concat(lit("CC-BY 4."), ks))
            .otherwise(concat(lit("CC FOO "), ks)),
          when(k % 5 === 0, lit("CC BY ND extra")).otherwise(concat(lit("restricted "), ks))
        )
        val f = FieldMapping.MapFile(
          kind = "regexp",
          entries = Seq(
            "^CC[ -]*BY[ -]*ND.*" -> Seq("by", "nd"),
            "^CC[ -]*BY[ .0-9]*$" -> Seq("by")
          ),
          default = Some(""),
          mappedEmpty = Some("other")
        )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            array_join(rights, "|").as("rights_raw"),
            array_join(FieldMapping.mapFieldArray(rights, f), "|").as("rights")
          )
      },
      Some {
        // Mirror: per element first-match → list of targets, flatten,
        // order-preserving dedupe, drop '', empty → ['other'].
        val mapOne = (v: String) =>
          s"(CASE WHEN regexp_matches($v, '^CC[ -]*BY[ -]*ND.*') THEN ['by', 'nd'] " +
            s"WHEN regexp_matches($v, '^CC[ -]*BY[ .0-9]*$$') THEN ['by'] ELSE [''] END)"
        s"""WITH t AS (SELECT p_partkey,
           |  [(CASE WHEN p_partkey % 3 = 0 THEN 'CC BY ND ' || cast(p_partkey as varchar)
           |         WHEN p_partkey % 3 = 1 THEN 'CC-BY 4.' || cast(p_partkey as varchar)
           |         ELSE 'CC FOO ' || cast(p_partkey as varchar) END),
           |   (CASE WHEN p_partkey % 5 = 0 THEN 'CC BY ND extra'
           |         ELSE 'restricted ' || cast(p_partkey as varchar) END)] AS rights
           |  FROM part),
           |m AS (SELECT p_partkey, rights,
           |  flatten(list_transform(rights, v -> ${mapOne("v")})) AS mapped
           |  FROM t),
           |c AS (SELECT p_partkey, rights,
           |  list_filter(list_filter(mapped, (x, i) -> list_position(mapped, x) = i), x -> x != '') AS cleaned
           |  FROM m)
           |SELECT p_partkey,
           |  array_to_string(rights, '|') AS rights_raw,
           |  (CASE WHEN len(cleaned) = 0 THEN 'other' ELSE array_to_string(cleaned, '|') END) AS rights
           |FROM c""".stripMargin
      }
    )
  )
}
