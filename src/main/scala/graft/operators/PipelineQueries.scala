package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import graft.sources.Iso2709
import graft.sources.Iso2709.Subfield
import org.apache.spark.sql.functions._

/** End-to-end ingest pipeline and corpus-statistics registrations.
  *
  * `ingest_pipeline` is the reference's whole ingest path in one query:
  * wire-format records (ISO 2709) → distributed parse → field extraction →
  * normalization (title key, ISBN-13, year) → value mapping — the
  * composition a RecordManager user actually runs. The oracle states the
  * expected end-to-end result directly, so it only passes when every
  * stage (including the wire round trip) is faithful.
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    Q(
      "ingest_pipeline",
      (s, d) => {
        import s.implicits._
        // The ISO2709 serialize/parse round trip below is a heavy
        // per-row kernel sitting directly on the scan — fan the
        // single-row-group input out to the session's cores first
        // (measured 0.93 → 0.43 s at sf0.1; no-op at cluster scale, see
        // Tables.fanOutForCpu).
        val base = Tables
          .fanOutForCpu(Tables.part(s, d).select("p_partkey", "p_name", "p_type"))
          .as[(Long, String, String)]
        // Stage 1-2: serialize to ISO 2709 and parse back (distributed).
        val parsed = base.map { case (k, name, typ) =>
          val author = name.split(" ").take(2).mkString(" ")
          val isbnBase = f"${k * 7919 % 1000000000}%09d"
          val sum = (1 to 9).map(p => (11 - p) * (isbnBase(p - 1) - '0')).sum
          val rem = (11 - sum % 11) % 11
          val check = if (rem == 10) "X" else rem.toString
          val year = s"c${1900 + k % 100}."
          val wire = Iso2709.build(
            Seq(
              Subfield("001", "", s"rec$k"),
              Subfield("245", "a", name),
              Subfield("100", "a", author),
              Subfield("020", "a", isbnBase + check),
              Subfield("260", "c", year)
            )
          )
          val f = Iso2709.parse(wire)
          def first(tag: String) = f.find(_.tag == tag).map(_.value).getOrElse("")
          (k, first("245"), first("100"), first("020"), first("260"), typ)
        }.toDF("record_id", "title", "author", "isbn_raw", "year_raw", "p_type")
        // Stage 3-4: normalization + mapping (column expressions).
        parsed.select(
          col("record_id"),
          col("title"),
          createTitleKey(col("title")).as("title_key"),
          convertAuthorLastFirst(col("author")).as("author_last_first"),
          normalizeIsbn(col("isbn_raw")).as("isbn13"),
          extractYear(col("year_raw")).as("pub_year"),
          FieldMapping
            .regexpMapping(
              col("p_type"),
              Seq(
                "^STANDARD ?(.*)$" -> "Std:$1",
                "^(ECONOMY|PROMO) ?(.*)$" -> "Value:$1",
                "^(SMALL|MEDIUM|LARGE)(.*)$" -> "Size:$1"
              ),
              Some("Unmapped")
            )
            .as("format")
        )
      },
      Some {
        import MetadataQueries._
        val base = "lpad(cast(p_partkey*7919 % 1000000000 as varchar), 9, '0')"
        s"""WITH t AS (SELECT p_partkey AS record_id, p_name AS title,
           |  array_to_string(string_split(p_name, ' ')[1:2], ' ') AS author,
           |  b || ${isbn10CheckCharSql("b")} AS isbn_raw,
           |  'c' || cast(1900 + p_partkey % 100 as varchar) || '.' AS year_raw,
           |  p_type
           |  FROM (SELECT *, $base AS b FROM part) _p),
           |m AS (SELECT *, regexp_extract(replace(isbn_raw, '-', ''), '([0-9]{9,12}[0-9xX])', 1) AS m FROM t)
           |SELECT record_id, title,
           |  ${titleKeySql("title")} AS title_key,
           |  regexp_replace(author, '^(.*) ([^ ]+)$$', '\\2, \\1') AS author_last_first,
           |  ${normIsbnSql("m")} AS isbn13,
           |  regexp_extract(year_raw, '(-?\\d{4})', 1) AS pub_year,
           |  CASE WHEN regexp_matches(p_type, '^STANDARD ?(.*)$$') THEN regexp_replace(p_type, '^STANDARD ?(.*)$$', 'Std:\\1')
           |       WHEN regexp_matches(p_type, '^(ECONOMY|PROMO) ?(.*)$$') THEN regexp_replace(p_type, '^(ECONOMY|PROMO) ?(.*)$$', 'Value:\\1')
           |       WHEN regexp_matches(p_type, '^(SMALL|MEDIUM|LARGE)(.*)$$') THEN regexp_replace(p_type, '^(SMALL|MEDIUM|LARGE)(.*)$$', 'Size:\\1')
           |       ELSE 'Unmapped' END AS format
           |FROM m""".stripMargin
      },
      bench = true
    ),
    Q(
      "corpus_stats",
      (s, d) => {
        val ws = split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")
        Tables
          .documents(s, d)
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(ws)).as("total_words"),
            sum(length(col("text"))).as("total_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars")
          )
      },
      Some(
        """SELECT lang, source, count(*) AS n_docs,
          |  cast(sum(len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) as bigint) AS total_words,
          |  cast(sum(length(text)) as bigint) AS total_chars,
          |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
          |FROM documents GROUP BY lang, source""".stripMargin
      )
    ),
    Q(
      // Authority/vocabulary enrichment (reference: Enrichment/
      // SkosmosEnrichment.php, AuthEnrichment.php — external vocabulary
      // lookups, which the reference caches locally). Re-expressed as a
      // broadcast join against the authority dataset: the nation/region
      // tables stand in for a SKOS vocabulary (preferred + broader labels).
      "enrich_authority",
      (s, d) => {
        val auth = Tables
          .nation(s, d)
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .select(
            col("n_nationkey").as("auth_id"),
            col("n_name").as("pref_label"),
            col("r_name").as("broader_label")
          )
        Tables
          .supplier(s, d)
          .join(broadcast(auth), col("s_nationkey") === col("auth_id"), "left")
          .select(
            col("s_suppkey"),
            col("s_name"),
            coalesce(col("pref_label"), lit("[Unresolved]")).as("pref_label"),
            coalesce(col("broader_label"), lit("[Unresolved]")).as("broader_label")
          )
      },
      Some(
        """SELECT s_suppkey, s_name,
          |  coalesce(n_name, '[Unresolved]') AS pref_label,
          |  coalesce(r_name, '[Unresolved]') AS broader_label
          |FROM supplier
          |LEFT JOIN nation ON s_nationkey = n_nationkey
          |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin
      )
    ),
    Q(
      // Incremental-update selection (the reference's updatedSince path in
      // SolrUpdater). On a date-partitioned production layout this predicate
      // prunes partitions; here it filters right above the scan (the ns->us
      // conversion in Tables.events sits between, by necessity).
      "updated_since",
      (s, d) =>
        Tables
          .events(s, d)
          .filter(col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")))
          .select(
            col("event_id"),
            col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("updated_at")
          ),
      Some(
        """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS updated_at
          |FROM events WHERE ts >= timestamp '2024-01-10 00:00:00'""".stripMargin
      )
    )
  )
}
