package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maintenance/consistency operators — the operator-shaped remainder of
  * the reference's command suite (the console/DB plumbing around them is
  * out of scope; the data transformations are not):
  *
  *  - `Command/Records/CheckDedup.php` → `DedupHandler.php:176`
  *    checkDedupRecord: validate every dedup-group membership, reporting
  *    the FIRST problem per member in the reference's priority order.
  *  - `Command/Records/CountValues.php`: value-frequency census of a
  *    record field across a source.
  *  - `Command/Solr/CheckIndex.php`: records present in the search index
  *    but no longer live in the record store (orphans to delete).
  *  - `Utils/XmlSecurity.php` heuristicScanString (Laminas heuristic):
  *    flag XML carrying ENTITY declarations before any parse.
  */
object MaintenanceQueries {

  /** Distributed checkDedupRecord: one row per problematic membership.
    *
    * `membership`: (dedup_id, member_ord, member_id, group_deleted) —
    * the dedup record's ordered id list. `records`: (id, source_id,
    * deleted, dedup_id). Problems, in the reference's veto order
    * (DedupHandler.php:210-224): missing record; second member from an
    * already-seen source (order = the ids-array walk); deleted dedup
    * record; deleted record; singleton group; missing back-link; back-
    * link to a different dedup record. The strict pairwise matchRecords
    * re-check (:225-243) is the composition of this with
    * [[Dedup.matchPredicate]] over the group's candidate pairs — already
    * certified by `dedup_records` — and is omitted here.
    *
    * Scale shape: one left join on member_id + two windows partitioned
    * by (dedup_id[, source_id]) — group sizes are bounded (the reference
    * caps groups), so window partitions are tiny.
    */
  def checkDedup(membership: DataFrame, records: DataFrame): DataFrame = {
    // Join-marker existence test: a data column (source_id) can be
    // legitimately null on an existing record, which would misreport it
    // as missing; the marker is null exactly when the join found no row.
    val joined = membership.join(
      records.select(
        col("id").as("member_id"),
        col("source_id"),
        col("deleted").as("rec_deleted"),
        col("dedup_id").as("rec_dedup_id"),
        lit(true).as("__exists")
      ),
      Seq("member_id"),
      "left"
    )
    val wSize = Window.partitionBy("dedup_id")
    val wSource = Window.partitionBy("dedup_id", "source_id").orderBy("member_ord")
    val exists = coalesce(col("__exists"), lit(false))
    val problem = when(!exists, lit("record does not exist"))
      .when(
        row_number().over(wSource) > 1,
        lit("already deduplicated with a record from same source")
      )
      .when(col("group_deleted"), lit("dedup record deleted"))
      .when(col("rec_deleted"), lit("record deleted"))
      .when(count(lit(1)).over(wSize) < 2, lit("single record in a dedup group"))
      .when(col("rec_dedup_id").isNull, lit("record is missing dedup_id"))
      .when(col("rec_dedup_id") =!= col("dedup_id"), lit("record linked with another dedup record"))
      .otherwise(lit(""))
    joined
      .select(col("dedup_id"), col("member_id"), problem.as("problem"))
      .filter(col("problem") =!= "")
  }

  /** The synthesized group/record fixture both `dedup_check` sides use:
    * consecutive part keys pair into groups, with deterministic problem
    * injections per class.
    */
  private val FixtureSql =
    """mem0 AS (
      |  SELECT 'g.' || cast(p_partkey // 2 as varchar) AS dedup_id,
      |    cast(p_partkey % 2 as int) AS member_ord,
      |    'r.' || cast(p_partkey as varchar) AS member_id,
      |    ((p_partkey // 2) % 23 = 0) AS group_deleted,
      |    p_partkey AS k, p_partkey // 2 AS g
      |  FROM part),
      |mem AS (SELECT * FROM mem0 WHERE NOT (g % 7 = 0 AND member_ord = 1)),
      |recs AS (
      |  SELECT 'r.' || cast(p_partkey as varchar) AS id,
      |    CASE WHEN (p_partkey // 2) % 13 = 0 THEN 'dupsrc'
      |         ELSE 's' || cast(p_partkey % 5 as varchar) END AS source_id,
      |    (p_partkey % 19 = 0) AS deleted,
      |    CASE WHEN p_partkey % 29 = 0 THEN NULL
      |         WHEN p_partkey % 31 = 0 THEN 'g.other'
      |         ELSE 'g.' || cast(p_partkey // 2 as varchar) END AS dedup_id
      |  FROM part WHERE p_partkey % 17 != 0)""".stripMargin

  val all: Seq[Q] = Seq(
    Q(
      "dedup_check",
      (s, d) => {
        val k = col("p_partkey")
        val g = floor(k / 2).cast("long")
        val membership = Tables
          .part(s, d)
          .select(
            concat(lit("g."), g.cast("string")).as("dedup_id"),
            (k % 2).cast("int").as("member_ord"),
            concat(lit("r."), k.cast("string")).as("member_id"),
            (g % 23 === 0).as("group_deleted"),
            g.as("g")
          )
          .filter(!(col("g") % 7 === 0 && col("member_ord") === 1))
          .drop("g")
        val records = Tables
          .part(s, d)
          .filter(k % 17 =!= 0)
          .select(
            concat(lit("r."), k.cast("string")).as("id"),
            when(g % 13 === 0, lit("dupsrc"))
              .otherwise(concat(lit("s"), (k % 5).cast("string"))).as("source_id"),
            (k % 19 === 0).as("deleted"),
            when(k % 29 === 0, lit(null).cast("string"))
              .when(k % 31 === 0, lit("g.other"))
              .otherwise(concat(lit("g."), g.cast("string"))).as("dedup_id")
          )
        checkDedup(membership, records)
      },
      Some(
        s"""WITH $FixtureSql,
           |j AS (
           |  SELECT m.dedup_id, m.member_id, m.member_ord, m.group_deleted,
           |    r.source_id, r.deleted AS rec_deleted, r.dedup_id AS rec_dedup_id,
           |    count(*) OVER (PARTITION BY m.dedup_id) AS grp_size,
           |    row_number() OVER (PARTITION BY m.dedup_id, r.source_id ORDER BY m.member_ord) AS src_rank
           |  FROM mem m LEFT JOIN recs r ON r.id = m.member_id),
           |p AS (
           |  SELECT dedup_id, member_id,
           |    CASE WHEN source_id IS NULL THEN 'record does not exist'
           |         WHEN src_rank > 1 THEN 'already deduplicated with a record from same source'
           |         WHEN group_deleted THEN 'dedup record deleted'
           |         WHEN rec_deleted THEN 'record deleted'
           |         WHEN grp_size < 2 THEN 'single record in a dedup group'
           |         WHEN rec_dedup_id IS NULL THEN 'record is missing dedup_id'
           |         WHEN rec_dedup_id != dedup_id THEN 'record linked with another dedup record'
           |         ELSE '' END AS problem
           |  FROM j)
           |SELECT dedup_id, member_id, problem FROM p WHERE problem != ''""".stripMargin
      )
    ),
    Q(
      // CountValues: frequency census of a field's values across records
      // (one groupBy on the value — map-side combinable at any scale).
      "records_count_values",
      (s, d) => {
        val counts = Tables
          .part(s, d)
          .select(explode(split(col("p_name"), " ")).as("value"))
          .groupBy("value")
          .agg(count(lit(1)).as("n_occurrences"))
        // The global distinct-count attaches via a broadcast hash join on
        // a computed constant key (a literal key would constant-fold into
        // a nested-loop cross join; an empty-partition window would
        // funnel the whole census through ONE task — the anti-pattern
        // for a high-cardinality value census).
        // x - x + 1 (not x * 0 + 1): Catalyst folds multiply-by-zero to a
        // literal, which would fold the key away and re-plan the nested
        // loop this join exists to avoid (same idiom as
        // KMeans.centroidsRow).
        val total = counts
          .agg(count(lit(1)).as("n_distinct_total"))
          .select(
            (col("n_distinct_total") - col("n_distinct_total") + 1).cast("int").as("j"),
            col("n_distinct_total")
          )
        counts
          .withColumn("j", (length(col("value")) - length(col("value")) + 1).cast("int"))
          .join(broadcast(total), Seq("j"))
          .drop("j")
      },
      Some(
        """WITH v AS (SELECT unnest(string_split(p_name, ' ')) AS value FROM part),
          |g AS (SELECT value, count(*) AS n_occurrences FROM v GROUP BY value)
          |SELECT value, n_occurrences, count(*) OVER () AS n_distinct_total FROM g""".stripMargin
      )
    ),
    Q(
      // CheckIndex: ids in the search index with no live record behind
      // them — a broadcast/hash anti-join, the scalable shape for index
      // garbage collection. Every 41st indexed id is a synthetic orphan,
      // and deleted records (every 19th) orphan their index entry too.
      "index_orphans",
      (s, d) => {
        val k = col("p_partkey")
        val indexIds = Tables
          .part(s, d)
          .select(concat(lit("part."), k.cast("string")).as("id"))
          .union(
            Tables
              .part(s, d)
              .filter(k % 41 === 0)
              .select(concat(lit("gone."), k.cast("string")).as("id"))
          )
        val live = Tables
          .part(s, d)
          .filter(k % 19 =!= 0)
          .select(concat(lit("part."), k.cast("string")).as("id"))
        indexIds.join(live, Seq("id"), "left_anti")
      },
      Some(
        """WITH idx AS (
          |  SELECT 'part.' || cast(p_partkey as varchar) AS id FROM part
          |  UNION ALL
          |  SELECT 'gone.' || cast(p_partkey as varchar) FROM part WHERE p_partkey % 41 = 0),
          |live AS (SELECT 'part.' || cast(p_partkey as varchar) AS id FROM part WHERE p_partkey % 19 != 0)
          |SELECT id FROM idx WHERE id NOT IN (SELECT id FROM live)""".stripMargin
      )
    ),
    Q(
      // XmlSecurity heuristic entity scan (Laminas heuristicScan): any
      // ENTITY declaration — internal or in a DOCTYPE subset — flags the
      // document before a parser ever sees it. Map-only security gate in
      // front of the XSL/record-parse paths.
      "xml_entity_scan",
      (s, d) => {
        val k = col("doc_id")
        val payload = when(
          k % 37 === 0,
          lit("""<?xml version="1.0"?><!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/passwd">]><r>&x;</r>""")
        ).when(k % 11 === 0, lit("<!doctype r><r>ok</r>"))
          .otherwise(concat(lit("<r>"), col("lang"), lit("</r>")))
        Tables
          .documents(s, d)
          .select(
            k.as("doc_id"),
            (lower(payload).contains("<!entity")).as("has_entity"),
            (lower(payload).contains("<!doctype")).as("has_doctype")
          )
      },
      Some(
        """SELECT doc_id,
          |  (doc_id % 37 = 0) AS has_entity,
          |  (doc_id % 37 = 0 OR doc_id % 11 = 0) AS has_doctype
          |FROM documents""".stripMargin
      )
    )
  )
}
