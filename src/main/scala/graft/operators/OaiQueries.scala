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
    )
  )
}
