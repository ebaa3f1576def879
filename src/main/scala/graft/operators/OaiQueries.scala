package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** OAI-PMH envelope splitting — the DATA side of the reference's harvest
  * loop (`Harvest/OaiPmh.php:507-570` processRecords: per `<record>`,
  * read the `<header>` identifier + datestamp, treat
  * `status="deleted"` headers as deletions with no metadata payload,
  * keep the `<metadata>` subtree for the record parser). The HTTP
  * transport and resumption-token loop are out of scope (live I/O); the
  * envelope → records transformation is what a Spark ingest of archived
  * harvest responses needs: one row per envelope in, one row per
  * contained record out, all via xpath arrays + posexplode — map-only,
  * no shuffle beyond the synthetic envelope build.
  */
object OaiQueries {

  val all: Seq[Q] = Seq(
    Q(
      // Envelopes are synthesized five records apiece (a groupBy brings
      // the members together, mirroring a paged ListRecords response),
      // then split back into records by xpath: the identifiers/
      // datestamps/status arrays align positionally, and deleted
      // records carry no <metadata>.
      "oai_envelope_split",
      (s, d) => {
        val id = col("doc_id").cast("string")
        val deleted = col("doc_id") % 13 === 0
        val header = concat(
          lit("<header"),
          when(deleted, lit(" status=\"deleted\"")).otherwise(lit("")),
          lit("><identifier>oai:demo:"), id,
          lit("</identifier><datestamp>2024-01-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
          lit("</datestamp></header>")
        )
        // coalesce: a null lang must not null-propagate through concat
        // and silently delete the whole record from its envelope.
        val recXml = concat(
          lit("<record>"),
          header,
          when(deleted, lit(""))
            .otherwise(
              concat(lit("<metadata><lang>"), coalesce(col("lang"), lit("")), lit("</lang></metadata>"))
            ),
          lit("</record>")
        )
        val envelopes = Tables
          .documents(s, d)
          .select((col("doc_id") / 5).cast("long").as("envelope_id"), col("doc_id"), recXml.as("rec"))
          .groupBy("envelope_id")
          .agg(
            concat(
              lit("<OAI-PMH><ListRecords>"),
              array_join(
                transform(
                  array_sort(collect_list(struct(col("doc_id"), col("rec")))),
                  _.getField("rec")
                ),
                ""
              ),
              lit("</ListRecords></OAI-PMH>")
            ).as("xml")
          )
        val ids = xpath(col("xml"), lit("//record/header/identifier/text()"))
        val dates = xpath(col("xml"), lit("//record/header/datestamp/text()"))
        // Envelope-level counts only: //record/header/@status yields
        // entries for DELETED records alone, so it does NOT align
        // positionally with the identifier array — a per-record deleted
        // flag must come from each header's own subtree, not from
        // zipping these arrays. n_live is derived as total headers minus
        // deleted headers (counting <metadata> nodes instead would
        // undercount when a live record's payload is empty).
        val statuses = xpath(col("xml"), lit("//record/header/@status"))
        envelopes
          .select(
            col("envelope_id"),
            posexplode(arrays_zip(ids, dates)).as(Seq("pos", "z")),
            (size(ids) - size(statuses)).as("n_live"),
            size(statuses).as("n_deleted")
          )
          .select(
            col("envelope_id"),
            col("z.0").as("identifier"),
            col("z.1").as("datestamp"),
            col("n_live"),
            col("n_deleted")
          )
      },
      Some(
        """WITH e AS (SELECT doc_id // 5 AS envelope_id, doc_id,
          |  'oai:demo:' || cast(doc_id as varchar) AS identifier,
          |  '2024-01-' || lpad(cast(doc_id % 28 + 1 as varchar), 2, '0') AS datestamp,
          |  (doc_id % 13 = 0) AS deleted
          |  FROM documents),
          |env AS (SELECT envelope_id,
          |  count(*) - count(*) FILTER (WHERE deleted) AS n_live,
          |  count(*) FILTER (WHERE deleted) AS n_deleted
          |  FROM e GROUP BY envelope_id)
          |SELECT e.envelope_id, e.identifier, e.datestamp,
          |  cast(env.n_live as int) AS n_live,
          |  cast(env.n_deleted as int) AS n_deleted
          |FROM e JOIN env USING (envelope_id)""".stripMargin
      )
    ),
    Q(
      // OAI-PMH provider list page (`Controller/OaiPmhProvider.php:243`
      // listRecords + :594 getRecordSets): records filtered by the
      // requested set's field constraints and the from/until datestamp
      // range (short dates widen to 00:00:00 / 23:59:59), sorted by
      // update time, offset by the resumption cursor, and capped at
      // result_limit. The reference reads result_limit+1 records to
      // decide whether more remain — mirrored here as one extra row
      // carrying the resumption token `set|prefix|from|until|nextpos`
      // (cursor ≙ the page's start offset). Deleted records emit a
      // header with no metadata payload. Each emitted record also
      // carries every set it belongs to (all sets whose constraints
      // match). Ordering ties on the timestamp break by id — a
      // deterministic refinement of the reference's store order. The
      // row_number window is bounded by the page end, so Spark's
      // rank-limit pushdown (WindowGroupLimit) pre-filters every
      // partition to the first `position+limit+1` rows before the
      // final ordered merge. SMALL-CORPUS CONVENIENCE FORM: the final
      // merge still collects task_count x (position+limit+1) survivors
      // on one task, so at cluster scale the certified page shape is
      // `oai_provider_keyset` below (constant-bounded final merge);
      // this offset form is kept for clients that genuinely need
      // arbitrary-position jumps on bounded corpora.
      "oai_provider_page",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val position = 200
        val limit = 500
        val fromS = "1995-01-01"
        val untilS = "1996-12-31"
        val o = Tables.orders(s, d)
        val id = concat(lit("ord."), col("o_orderkey").cast("string"))
        val inOpen = col("o_orderstatus") === "O"
        val inUrgent = col("o_orderpriority") === "1-URGENT"
        val filtered = o
          .where(
            inOpen &&
              col("o_orderdate") >= lit(s"$fromS 00:00:00").cast("timestamp") &&
              col("o_orderdate") <= lit(s"$untilS 23:59:59").cast("timestamp")
          )
          .select(
            id.as("id"),
            col("o_orderdate").as("updated"),
            concat_ws(
              "|",
              when(inOpen, lit("open")),
              when(inUrgent, lit("urgent")),
              when(inOpen && inUrgent, lit("open_urgent"))
            ).as("sets"),
            (col("o_orderkey") % 13 === 0).as("deleted")
          )
        val w = Window.orderBy(col("updated"), col("id"))
        val token =
          s"open|oai_dc|$fromS|$untilS|${position + limit}"
        filtered
          .withColumn("row_index", row_number().over(w))
          .where(col("row_index") > position && col("row_index") <= position + limit + 1)
          .select(
            col("row_index"),
            when(col("row_index") === position + limit + 1, lit("token"))
              .otherwise(lit("record")).as("row_type"),
            when(col("row_index") === position + limit + 1, lit(null).cast("string"))
              .otherwise(col("id")).as("id"),
            when(col("row_index") === position + limit + 1, lit(null).cast("string"))
              .otherwise(date_format(col("updated"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
              .as("datestamp"),
            when(col("row_index") === position + limit + 1, lit(null).cast("string"))
              .otherwise(col("sets")).as("sets"),
            when(col("row_index") === position + limit + 1, lit(null).cast("boolean"))
              .otherwise(col("deleted")).as("deleted"),
            when(
              col("row_index") === position + limit + 1 || col("deleted"),
              lit(null).cast("string")
            ).otherwise(
              concat(lit("<oai_dc:dc><dc:identifier>"), col("id"), lit("</dc:identifier></oai_dc:dc>"))
            ).as("metadata"),
            when(col("row_index") === position + limit + 1, lit(token))
              .otherwise(lit(null).cast("string")).as("resumption_token")
          )
      },
      Some {
        """WITH f AS (SELECT 'ord.' || cast(o_orderkey as varchar) AS id,
          |  o_orderdate AS updated,
          |  concat_ws('|', 'open',
          |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' END,
          |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'open_urgent' END) AS sets,
          |  (o_orderkey % 13 = 0) AS deleted
          |  FROM orders
          |  WHERE o_orderstatus = 'O'
          |    AND o_orderdate >= timestamp '1995-01-01 00:00:00'
          |    AND o_orderdate <= timestamp '1996-12-31 23:59:59'),
          |r AS (SELECT *, row_number() OVER (ORDER BY updated, id) AS row_index FROM f)
          |SELECT row_index,
          |  (CASE WHEN row_index = 701 THEN 'token' ELSE 'record' END) AS row_type,
          |  (CASE WHEN row_index = 701 THEN NULL ELSE id END) AS id,
          |  (CASE WHEN row_index = 701 THEN NULL ELSE strftime(updated, '%Y-%m-%dT%H:%M:%SZ') END) AS datestamp,
          |  (CASE WHEN row_index = 701 THEN NULL ELSE sets END) AS sets,
          |  (CASE WHEN row_index = 701 THEN NULL ELSE deleted END) AS deleted,
          |  (CASE WHEN row_index = 701 OR deleted THEN NULL
          |        ELSE '<oai_dc:dc><dc:identifier>' || id || '</dc:identifier></oai_dc:dc>' END) AS metadata,
          |  (CASE WHEN row_index = 701 THEN 'open|oai_dc|1995-01-01|1996-12-31|700' END) AS resumption_token
          |FROM r
          |WHERE row_index > 200 AND row_index <= 701""".stripMargin
      }
    ),
    Q(
      // KEYSET-cursor form of the provider page — the certified scale
      // path (`Controller/OaiPmhProvider.php:243` pages by resumption
      // cursor; the cursor carries state, so "(updated, id) strictly
      // after the last-seen pair" reproduces the page without ranking
      // anything before it). No unpartitioned window over unbounded
      // data: the page is a top-(limit+1) smallest by (updated, id),
      // taken in two phases — a per-SALT row_number (256 hash
      // subgroups; Spark's WindowGroupLimit pre-filters every task to
      // its first limit+1 rows per salt before the shuffle) keeps each
      // salt's limit+1 earliest, then the final ordered window ranks
      // only the <= 256*(limit+1) survivors: single-task work is a
      // CONSTANT, independent of corpus and task count — unlike the
      // offset form above, whose final merge grows with task count.
      // The emitted resumption token is the NEXT page's start keyset
      // ((updated, id) of the first unreturned row, inclusive-start
      // semantics), which is exactly the state the reference threads
      // through its token.
      "oai_provider_keyset",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val limit = 500
        val salts = 256
        val fromS = "1995-01-01"
        val untilS = "1996-12-31"
        val curU = lit("1995-06-01 00:00:00").cast("timestamp")
        val curId = lit("")
        val o = Tables.orders(s, d)
        val id = concat(lit("ord."), col("o_orderkey").cast("string"))
        val inOpen = col("o_orderstatus") === "O"
        val inUrgent = col("o_orderpriority") === "1-URGENT"
        val filtered = o
          .where(
            inOpen &&
              col("o_orderdate") >= lit(s"$fromS 00:00:00").cast("timestamp") &&
              col("o_orderdate") <= lit(s"$untilS 23:59:59").cast("timestamp")
          )
          .select(
            id.as("id"),
            col("o_orderdate").as("updated"),
            concat_ws(
              "|",
              when(inOpen, lit("open")),
              when(inUrgent, lit("urgent")),
              when(inOpen && inUrgent, lit("open_urgent"))
            ).as("sets"),
            (col("o_orderkey") % 13 === 0).as("deleted")
          )
          .where(
            col("updated") > curU || (col("updated") === curU && col("id") > curId)
          )
        val wSalt = Window
          .partitionBy(pmod(xxhash64(col("id")), lit(salts)))
          .orderBy(col("updated"), col("id"))
        val survivors = filtered
          .withColumn("__sr", row_number().over(wSalt))
          .where(col("__sr") <= limit + 1)
          .drop("__sr")
        val wFinal = Window.orderBy(col("updated"), col("id"))
        val isToken = col("row_index") === limit + 1
        val token = concat(
          lit(s"open|oai_dc|$fromS|$untilS|"),
          date_format(col("updated"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
          lit("|"),
          col("id")
        )
        survivors
          .withColumn("row_index", row_number().over(wFinal))
          .where(col("row_index") <= limit + 1)
          .select(
            col("row_index"),
            when(isToken, lit("token")).otherwise(lit("record")).as("row_type"),
            when(isToken, lit(null).cast("string")).otherwise(col("id")).as("id"),
            when(isToken, lit(null).cast("string"))
              .otherwise(date_format(col("updated"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
              .as("datestamp"),
            when(isToken, lit(null).cast("string")).otherwise(col("sets")).as("sets"),
            when(isToken, lit(null).cast("boolean")).otherwise(col("deleted")).as("deleted"),
            when(isToken || col("deleted"), lit(null).cast("string"))
              .otherwise(
                concat(lit("<oai_dc:dc><dc:identifier>"), col("id"), lit("</dc:identifier></oai_dc:dc>"))
              ).as("metadata"),
            when(isToken, token).otherwise(lit(null).cast("string")).as("resumption_token")
          )
      },
      Some {
        """WITH f AS (SELECT 'ord.' || cast(o_orderkey as varchar) AS id,
          |  o_orderdate AS updated,
          |  concat_ws('|', 'open',
          |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' END,
          |    CASE WHEN o_orderpriority = '1-URGENT' THEN 'open_urgent' END) AS sets,
          |  (o_orderkey % 13 = 0) AS deleted
          |  FROM orders
          |  WHERE o_orderstatus = 'O'
          |    AND o_orderdate >= timestamp '1995-01-01 00:00:00'
          |    AND o_orderdate <= timestamp '1996-12-31 23:59:59'
          |    AND (o_orderdate > timestamp '1995-06-01 00:00:00'
          |         OR (o_orderdate = timestamp '1995-06-01 00:00:00'
          |             AND 'ord.' || cast(o_orderkey as varchar) > ''))),
          |r AS (SELECT *, row_number() OVER (ORDER BY updated, id) AS row_index FROM f)
          |SELECT row_index,
          |  (CASE WHEN row_index = 501 THEN 'token' ELSE 'record' END) AS row_type,
          |  (CASE WHEN row_index = 501 THEN NULL ELSE id END) AS id,
          |  (CASE WHEN row_index = 501 THEN NULL ELSE strftime(updated, '%Y-%m-%dT%H:%M:%SZ') END) AS datestamp,
          |  (CASE WHEN row_index = 501 THEN NULL ELSE sets END) AS sets,
          |  (CASE WHEN row_index = 501 THEN NULL ELSE deleted END) AS deleted,
          |  (CASE WHEN row_index = 501 OR deleted THEN NULL
          |        ELSE '<oai_dc:dc><dc:identifier>' || id || '</dc:identifier></oai_dc:dc>' END) AS metadata,
          |  (CASE WHEN row_index = 501
          |        THEN 'open|oai_dc|1995-01-01|1996-12-31|' || strftime(updated, '%Y-%m-%dT%H:%M:%SZ') || '|' || id END) AS resumption_token
          |FROM r
          |WHERE row_index <= 501""".stripMargin
      }
    )
  )
}
