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
    )
  )
}
