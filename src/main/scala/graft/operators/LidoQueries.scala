package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** LIDO (museum object) record semantics (reference: Record/Lido.php).
  *
  * Two registrations: the display-date range parser (Lido.php:1029
  * parseDateRange — the format's most distinctive normalization) over a
  * mixed-pattern corpus, and the event-model extraction (toSolrArray:143 —
  * LIDO data hangs off typed events) over an
  * array<struct<event_type,actor,role,display_date,display_place,
  * material>> column: actors-with-roles filtered by event type
  * (getActors:722), display dates/places (:758,:786), first non-empty work
  * type (getObjectWorkType:678), event materials (:952).
  */
object LidoQueries {

  /** DuckDB mirror of [[lidoDateRange]] (correlated-scalar-subquery form,
    * same shape as the other shared string-semantics templates).
    */
  def ldrSql(x: String, yearNow: Int = 2026): String = {
    def fill2(v: String) =
      s"(case when length($v) = 2 then cast(1900 + try_cast($v as int) as varchar) else $v end)"
    def centuryFill(s: String, v: String) =
      s"(case when length($v) = 2 then cast(try_cast(substr($s,1,2) || '00' as int) + try_cast($v as int) as varchar) else $v end)"
    def processed(s0: String, e0: String) =
      s"""(select case when try_cast(s as int) > $yearNow or try_cast(e as int) > $yearNow then NULL
         |  else s || '-01-01T00:00:00Z,' || e || '-12-31T23:59:59Z' end
         | from (select s, ${centuryFill("s", "e0")} as e
         |       from (select ${fill2("s0")} as s, e0
         |             from (select $s0 as s0, $e0 as e0) _p1) _p2) _p3)""".stripMargin
    def dayPrec(y: String, m: String, d: String) =
      s"""(select case when try_cast(y as int) >= $yearNow then NULL
         |  else dt || 'T00:00:00Z,' || dt || 'T23:59:59Z' end
         | from (select y, y || '-' || lpad(m, 2, '0') || '-' || lpad(d, 2, '0') as dt
         |       from (select $y as y, $m as m, $d as d) _d1) _d2)""".stripMargin
    val r1 = """(\d\d\d\d) ?- (\d\d\d\d)"""
    val r2 = """(\d\d\d\d)-(\d\d?)-(\d\d?)"""
    val r3 = """(\d\d?)\s*.\s*(\d\d?)\s*.\s*(\d\d\d\d)"""
    val r4 = """(\d?\d?\d\d) ?\?"""
    val r5 = """(\d?\d?\d\d)"""
    def ex(re: String, i: Int) = s"regexp_extract(lin, '$re', $i)"
    s"""(select case
       |  when ${ex(r1, 1)} != '' then ${processed(ex(r1, 1), ex(r1, 2))}
       |  when ${ex(r2, 1)} != '' then ${dayPrec(ex(r2, 1), ex(r2, 2), ex(r2, 3))}
       |  when ${ex(r3, 3)} != '' then ${dayPrec(ex(r3, 3), ex(r3, 2), ex(r3, 1))}
       |  when ${ex(r4, 1)} != '' then ${processed(
        s"cast(try_cast(${ex(r4, 1)} as int) - 3 as varchar)",
        s"cast(try_cast(${ex(r4, 1)} as int) + 3 as varchar)"
      )}
       |  when ${ex(r5, 1)} != '' then ${processed(ex(r5, 1), ex(r5, 1))}
       |  else NULL end
       | from (select lower(trim($x)) as lin) _ldr)""".stripMargin
  }

  private def eventsOf(f: Column, eventType: String): Column =
    filter(f, e => e.getField("event_type") === eventType)

  val all: Seq[Q] = Seq(
    Q(
      "lido_daterange",
      (s, d) => {
        val k = col("o_orderkey")
        val y = (lit(1900) + k % 80).cast("string")
        val input = when(k % 13 === 0, concat(lit("2030 - 2040")))
          .when(k % 7 === 0, concat(y, lit(" - "), (lit(1905) + k % 80).cast("string")))
          .when(k % 7 === 1,
            concat(y, lit("-"), (lit(1) + k % 12).cast("string"), lit("-"), (lit(1) + k % 27).cast("string")))
          .when(k % 7 === 2,
            concat((lit(1) + k % 27).cast("string"), lit("."), (lit(1) + k % 12).cast("string"), lit("."), y))
          .when(k % 7 === 3, concat((lit(10) + k % 80).cast("string"), lit(" ?")))
          .when(k % 7 === 4, concat(y, lit(" ?")))
          .when(k % 7 === 5, when(k % 2 === 0, y).otherwise((lit(20) + k % 70).cast("string")))
          .otherwise(lit("unknown date"))
        Tables
          .orders(s, d)
          .select(
            k.as("record_id"),
            input.as("display_date"),
            lidoDateRange(input).as("date_range")
          )
      },
      Some {
        val y = "cast(1900 + o_orderkey % 80 as varchar)"
        val input =
          s"""(CASE WHEN o_orderkey % 13 = 0 THEN '2030 - 2040'
             | WHEN o_orderkey % 7 = 0 THEN $y || ' - ' || cast(1905 + o_orderkey % 80 as varchar)
             | WHEN o_orderkey % 7 = 1 THEN $y || '-' || cast(1 + o_orderkey % 12 as varchar) || '-' || cast(1 + o_orderkey % 27 as varchar)
             | WHEN o_orderkey % 7 = 2 THEN cast(1 + o_orderkey % 27 as varchar) || '.' || cast(1 + o_orderkey % 12 as varchar) || '.' || $y
             | WHEN o_orderkey % 7 = 3 THEN cast(10 + o_orderkey % 80 as varchar) || ' ?'
             | WHEN o_orderkey % 7 = 4 THEN $y || ' ?'
             | WHEN o_orderkey % 7 = 5 THEN (CASE WHEN o_orderkey % 2 = 0 THEN $y ELSE cast(20 + o_orderkey % 70 as varchar) END)
             | ELSE 'unknown date' END)""".stripMargin
        s"""SELECT o_orderkey AS record_id, $input AS display_date,
           |  ${ldrSql(input)} AS date_range
           |FROM orders""".stripMargin
      }
    ),
    Q(
      "lido_extract",
      (s, d) => {
        val k = col("l_orderkey")
        val evType = when(col("l_linenumber") % 3 === 0, lit("creation"))
          .when(col("l_linenumber") % 3 === 1, lit("use"))
          .otherwise(lit("acquisition"))
        val ev = struct(
          evType.as("event_type"),
          concat(lit("Actor "), col("l_suppkey").cast("string")).as("actor"),
          when(col("l_linenumber") % 2 === 0, lit("valmistaja"))
            .otherwise(lit("skribent")).as("role"),
          concat((lit(1900) + col("l_partkey") % 100).cast("string")).as("display_date"),
          concat(lit("Place "), (col("l_partkey") % 50).cast("string")).as("display_place"),
          when(col("l_linenumber") % 2 === 0, lit("oil on canvas"))
            .otherwise(lit("bronze")).as("material")
        )
        val records = Tables
          .lineitem(s, d)
          .select(k.as("record_id"), ev.as("ev"))
          .groupBy("record_id")
          .agg(sort_array(collect_list(col("ev"))).as("events"))
        val f = col("events")
        val creation = eventsOf(f, "creation")
        records.select(
          col("record_id"),
          // getActors('creation', includeRoles): "name, role"
          array_join(
            transform(
              creation,
              e => concat(e.getField("actor"), lit(", "), e.getField("role"))
            ),
            "|"
          ).as("authors"),
          // getEventDisplayDate('creation') — first creation display date,
          // run through parseDateRange for the era field
          coalesce(
            lidoDateRange(get(transform(creation, e => e.getField("display_date")), lit(0))),
            lit("")
          ).as("era_range"),
          // getEventDisplayPlaces (all events); sorted-distinct because
          // DuckDB list_distinct does not preserve encounter order
          array_join(
            array_sort(array_distinct(transform(f, e => e.getField("display_place")))),
            "|"
          ).as("places"),
          // getEventMaterials('creation'), sorted-distinct likewise
          array_join(
            array_sort(array_distinct(transform(creation, e => e.getField("material")))),
            "|"
          ).as("materials"),
          size(f).as("n_events")
        )
      },
      Some {
        s"""WITH ev AS (
           |  SELECT l_orderkey AS record_id,
           |    struct_pack(
           |      event_type := (CASE WHEN l_linenumber % 3 = 0 THEN 'creation'
           |                          WHEN l_linenumber % 3 = 1 THEN 'use'
           |                          ELSE 'acquisition' END),
           |      actor := 'Actor ' || cast(l_suppkey as varchar),
           |      role := (CASE WHEN l_linenumber % 2 = 0 THEN 'valmistaja' ELSE 'skribent' END),
           |      display_date := cast(1900 + l_partkey % 100 as varchar),
           |      display_place := 'Place ' || cast(l_partkey % 50 as varchar),
           |      material := (CASE WHEN l_linenumber % 2 = 0 THEN 'oil on canvas' ELSE 'bronze' END)
           |    ) AS e
           |  FROM lineitem),
           |recs AS (
           |  SELECT record_id, list_sort(list(e)) AS events FROM ev GROUP BY record_id),
           |ext AS (
           |  SELECT record_id, events,
           |    list_filter(events, e -> e.event_type = 'creation') AS creation
           |  FROM recs)
           |SELECT record_id,
           |  coalesce(array_to_string(list_transform(creation, e -> e.actor || ', ' || e.role), '|'), '') AS authors,
           |  coalesce(${ldrSql("coalesce(list_transform(creation, e -> e.display_date)[1], '')")}, '') AS era_range,
           |  coalesce(array_to_string(list_sort(list_distinct(list_transform(events, e -> e.display_place))), '|'), '') AS places,
           |  coalesce(array_to_string(list_sort(list_distinct(list_transform(creation, e -> e.material))), '|'), '') AS materials,
           |  cast(len(events) as int) AS n_events
           |FROM ext""".stripMargin
      }
    )
  )
}
