package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus curation operators beyond the Gopher rule set: the C4
  * cleaning pipeline (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning", §2.2 — line-level retention + page-level
  * rejection) and a broadcast domain-blocklist filter (the
  * crawl-curation step that drops whole hosts before any content
  * analysis). Both are map-only — at 100 TB they pipeline with the scan;
  * the blocklist ships as a broadcast literal (config-sized), never a
  * shuffle.
  */
object CurationQueries2 {

  /** C4 line retention: ends in terminal punctuation AND has >= 3 words
    * AND doesn't mention javascript (case-insensitive).
    */
  private def keepLine(l: Column): Column =
    l.rlike("[.!?\"]\\s*$") &&
      size(split(trim(l), "\\s+")) >= 3 &&
      !lower(l).contains("javascript")

  val all: Seq[Q] = Seq(
    Q(
      "docs_c4_rules",
      (s, d) => {
        val id = col("doc_id")
        // Build a deterministic multi-line page from the word-soup corpus:
        // per-line terminators/noise vary by doc and line index so every
        // rule branch fires. Line i of doc k gets: a terminal mark unless
        // (k+i)%5==0; fewer than 3 words when (k+i)%7==0; a javascript
        // mention when (k+i)%11==0. Page-level: '{' when k%13==0, 'lorem
        // ipsum' when k%17==0.
        import graft.functions.MetadataFunctions.bindOnce
        val lineCount = lit(6)
        // bindOnce ladder (the fingerprintHashes lesson): without the
        // bindings, every output column inlines the whole page-synthesis
        // tree — 6 lines × 2 slices of an inlined split each, times the
        // kept/cleaned re-references — ~100 split evaluations per row.
        val lines = bindOnce(split(col("text"), " ")) { words =>
          transform(
            sequence(lit(0), lineCount - 1),
            i => {
              val base = when(
                (id + i) % 7 === 0,
                concat_ws(" ", slice(words, 1, 2))
              ).otherwise(
                concat_ws(" ", slice(words, (i * 5 + 1).cast("int"), lit(5)))
              )
              val withJs = when(
                (id + i) % 11 === 0,
                concat(base, lit(" JavaScript required"))
              ).otherwise(base)
              val terminated = when((id + i) % 5 === 0, withJs)
                .otherwise(concat(withJs, element_at(array(lit("."), lit("!"), lit("?")), (i % 3 + 1).cast("int"))))
              terminated
            }
          )
        }
        val pageNoise = when(id % 13 === 0, lit("\nfunction f() { return 1; }"))
          .otherwise(when(id % 17 === 0, lit("\nLorem ipsum dolor sit amet.")).otherwise(lit("")))
        val page = concat(array_join(lines, "\n"), pageNoise)

        // ---- the operator under test: the C4 pipeline over `page` ----
        val out = bindOnce(page) { p =>
          bindOnce(filter(split(p, "\n"), keepLine(_))) { kept =>
            bindOnce(array_join(kept, "\n")) { cleaned =>
              val marks = length(cleaned) - length(regexp_replace(cleaned, "[.!?\"]", ""))
              val hasBrace = p.contains("{")
              val hasLorem = lower(p).contains("lorem ipsum")
              struct(
                size(split(p, "\n")).as("n_lines"),
                size(kept).as("n_kept_lines"),
                marks.as("n_sentences"),
                hasBrace.as("has_brace"),
                hasLorem.as("has_lorem"),
                (marks >= 5 && !hasBrace && !hasLorem).as("kept"),
                md5(cleaned).as("cleaned_md5")
              )
            }
          }
        }

        Tables
          .documents(s, d)
          .select(
            id.as("doc_id"),
            out.getField("n_lines").as("n_lines"),
            out.getField("n_kept_lines").as("n_kept_lines"),
            out.getField("n_sentences").as("n_sentences"),
            out.getField("has_brace").as("has_brace"),
            out.getField("has_lorem").as("has_lorem"),
            out.getField("kept").as("kept"),
            out.getField("cleaned_md5").as("cleaned_md5")
          )
      },
      Some(
        """WITH pages AS (
          |  SELECT doc_id,
          |    list_transform(range(0, 6), i ->
          |      (CASE WHEN (doc_id + i) % 5 = 0 THEN
          |         (CASE WHEN (doc_id + i) % 7 = 0
          |            THEN array_to_string(string_split(text, ' ')[1:2], ' ')
          |            ELSE coalesce(array_to_string(string_split(text, ' ')[(i*5+1):(i*5+5)], ' '), '') END)
          |         || (CASE WHEN (doc_id + i) % 11 = 0 THEN ' JavaScript required' ELSE '' END)
          |       ELSE
          |         (CASE WHEN (doc_id + i) % 7 = 0
          |            THEN array_to_string(string_split(text, ' ')[1:2], ' ')
          |            ELSE coalesce(array_to_string(string_split(text, ' ')[(i*5+1):(i*5+5)], ' '), '') END)
          |         || (CASE WHEN (doc_id + i) % 11 = 0 THEN ' JavaScript required' ELSE '' END)
          |         || (['.', '!', '?'])[cast(i % 3 + 1 as int)]
          |       END)) AS lines,
          |    (CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'function f() { return 1; }'
          |          WHEN doc_id % 17 = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet.'
          |          ELSE '' END) AS noise
          |  FROM documents),
          |t AS (
          |  SELECT doc_id,
          |    array_to_string(lines, chr(10)) || noise AS page
          |  FROM pages),
          |l AS (
          |  SELECT doc_id, page,
          |    list_filter(string_split(page, chr(10)), x ->
          |      regexp_matches(x, '[.!?"]\s*$')
          |      AND len(list_filter(string_split(trim(x), ' '), w -> w != '')) >= 3
          |      AND NOT contains(lower(x), 'javascript')) AS kept_lines
          |  FROM t)
          |SELECT doc_id,
          |  len(string_split(page, chr(10))) AS n_lines,
          |  len(kept_lines) AS n_kept_lines,
          |  length(coalesce(array_to_string(kept_lines, chr(10)), ''))
          |    - length(regexp_replace(coalesce(array_to_string(kept_lines, chr(10)), ''), '[.!?"]', '', 'g')) AS n_sentences,
          |  contains(page, '{') AS has_brace,
          |  contains(lower(page), 'lorem ipsum') AS has_lorem,
          |  (length(coalesce(array_to_string(kept_lines, chr(10)), ''))
          |    - length(regexp_replace(coalesce(array_to_string(kept_lines, chr(10)), ''), '[.!?"]', '', 'g')) >= 5)
          |   AND NOT contains(page, '{') AND NOT contains(lower(page), 'lorem ipsum') AS kept,
          |  md5(coalesce(array_to_string(kept_lines, chr(10)), '')) AS cleaned_md5
          |FROM l ORDER BY doc_id""".stripMargin
      )
    ),
    Q(
      "docs_domain_filter",
      (s, d) => {
        val id = col("doc_id")
        val ids = id.cast("string")
        // Deterministic URL synthesis (same family as docs_url_canon).
        val host = concat(
          lit("www"),
          (id % 5).cast("string"),
          element_at(
            array(
              lit(".news.example.com"),
              lit(".spam-tracker.biz"),
              lit(".blog.example.org"),
              lit(".adfarm.example.net"),
              lit(".docs.example.io")
            ),
            (id % 5 + 1).cast("int")
          )
        )
        // Config-sized blocklists resolve at plan build → broadcast
        // literals inside one codegen'd projection; domain suffix match
        // covers subdomain wildcarding.
        val blockedDomains = Seq("spam-tracker.biz", "adfarm.example.net")
        val blockedReason = blockedDomains
          .foldLeft(when(lit(false), lit(""))) { (acc, dom) =>
            acc.when(host === dom || host.endsWith("." + dom), lit(dom))
          }
          .otherwise(lit(""))
        Tables
          .documents(s, d)
          .select(
            id.as("doc_id"),
            host.as("host"),
            (blockedReason === "").as("allowed"),
            blockedReason.as("blocked_by")
          )
      },
      Some(
        """SELECT doc_id,
          |  'www' || cast(doc_id % 5 as varchar) ||
          |    (['.news.example.com', '.spam-tracker.biz', '.blog.example.org',
          |      '.adfarm.example.net', '.docs.example.io'])[cast(doc_id % 5 + 1 as int)] AS host,
          |  (doc_id % 5 = 1 OR doc_id % 5 = 3) = false AS allowed,
          |  (CASE WHEN doc_id % 5 = 1 THEN 'spam-tracker.biz'
          |        WHEN doc_id % 5 = 3 THEN 'adfarm.example.net'
          |        ELSE '' END) AS blocked_by
          |FROM documents ORDER BY doc_id""".stripMargin
      )
    )
  )
}
