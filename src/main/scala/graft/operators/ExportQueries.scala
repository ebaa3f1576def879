package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import graft.functions.Wkt
import org.apache.spark.sql.functions._

/** Export shaping + WKT centroid registrations. */
object ExportQueries {

  /** True when any value of a field matches a `suppressOnField` filter:
    * a slash-wrapped filter — optionally with trailing PCRE flags, since
    * the reference passes the spec verbatim to preg_match — is a regular
    * expression over the values, anything else is a pipe-separated
    * exact-value list. Reference: Record/AbstractRecord.php:445
    * `getSuppressed` (note: the PHP tests the slash-wrapping on the
    * *value* rather than the filter — an evident inversion, since the
    * suppressOnField config documents the filter as `/regex/` or
    * `value1|value2`; the default implements the documented semantics).
    *
    * `referenceCompat = true` reproduces the PHP's actual behavior
    * bug-for-bug, for clean parity diffs against a live RecordManager:
    * the slash test runs on each VALUE — a slash-wrapped value is
    * preg_match'ed against the filter (no match when the filter is not a
    * valid delimited pattern, as preg_match errors there), every other
    * value is compared against the exploded pipe list — so a `/regex/`
    * filter never regex-fires on ordinary values.
    */
  def suppressMatch(
      values: org.apache.spark.sql.Column,
      filterSpec: String,
      referenceCompat: Boolean = false
  ) = {
    val RegexSpec = "(?s)^/(.*)/([a-zA-Z]*)$".r
    // "/" alone is not a regex spec (PHP preg_match would error and
    // treat it as no match); require both delimiters to be present.
    val pattern: Option[String] = filterSpec match {
      case RegexSpec(body, flags) if filterSpec.length >= 2 =>
        val inline = flags.filter("imsxu".contains(_))
        Some(if (inline.isEmpty) body else s"(?$inline)$body")
      case _ => None
    }
    val exact = filterSpec.split("\\|").toSeq
    if (referenceCompat)
      exists(
        values,
        v =>
          when(
            v.startsWith("/") && v.endsWith("/"),
            pattern.map(p => v.rlike(p)).getOrElse(lit(false))
          ).otherwise(v.isin(exact: _*))
      )
    else
      pattern match {
        case Some(p) => exists(values, v => v.rlike(p))
        case None    => exists(values, v => v.isin(exact: _*))
      }
  }

  val all: Seq[Q] = Seq(
    Q(
      // Search-index document building (reference: Solr/SolrUpdater.php —
      // the JSON update documents sent to Solr). Built with deterministic
      // string concatenation (inputs are clean ASCII), identical in both
      // engines, so the oracle validates the export byte-for-byte.
      "solr_export",
      (s, d) => {
        val title = col("p_name")
        val author = array_join(slice(split(col("p_name"), " "), 1, 2), " ")
        val year = (lit(1900) + col("p_partkey") % 100).cast("string")
        val doc = concat(
          lit("{\"id\":\"part."),
          col("p_partkey").cast("string"),
          lit("\",\"title\":\""),
          title,
          lit("\",\"title_sort\":\""),
          createSortTitle(title),
          lit("\",\"author\":\""),
          convertAuthorLastFirst(author),
          lit("\",\"publish_year\":"),
          year,
          lit("}")
        )
        Tables
          .part(s, d)
          .select(col("p_partkey"), doc.as("solr_doc"))
      },
      Some {
        import MetadataQueries._
        val author = "array_to_string(string_split(p_name, ' ')[1:2], ' ')"
        s"""WITH a AS (SELECT p_partkey, p_name, ${stripArticleSql("p_name")} AS t1 FROM part),
           |b AS (SELECT p_partkey, p_name, t1, ${stripPunctSql("t1")} AS t2 FROM a),
           |c AS (SELECT p_partkey, p_name,
           |  lower(CASE WHEN substr(t2,1,1) != substr(t1,1,1) THEN ${stripArticleSql("t2")} ELSE t2 END) AS title_sort
           |  FROM b)
           |SELECT p_partkey,
           |  '{"id":"part.' || cast(p_partkey as varchar) ||
           |  '","title":"' || p_name ||
           |  '","title_sort":"' || title_sort ||
           |  '","author":"' || regexp_replace($author, '^(.*) ([^ ]+)$$', '\\2, \\1') ||
           |  '","publish_year":' || cast(1900 + p_partkey % 100 as varchar) || '}' AS solr_doc
           |FROM c""".stripMargin
      }
    ),
    Q(
      // Config-driven record suppression (reference:
      // Record/AbstractRecord.php:445 getSuppressed + the suppressOnField
      // data-source setting): a record is suppressed when any value of a
      // configured Solr field matches that field's filter — regex when
      // slash-wrapped, else a pipe-separated exact list. Used by the
      // ingest pipeline to skip/delete records at update time. Map-only
      // projection; the filter evaluates inside the scan's codegen stage.
      "records_suppressed",
      (s, d) => {
        val k = col("p_partkey")
        val fmt1 = when(k % 7 === 0, lit("Electronic Book")).otherwise(lit("Book"))
        val fmt2 = when(k % 3 === 0, lit("Online")).otherwise(lit(""))
        val status = when(k % 5 === 0, lit("deleted")).otherwise(lit("active"))
        val formats = filter(array(fmt1, fmt2), v => v =!= "")
        val byFormat = suppressMatch(formats, "/^Electronic/")
        val byStatus = suppressMatch(array(status), "deleted|hidden")
        Tables
          .part(s, d)
          .select(
            concat(lit("part."), k.cast("string")).as("record_id"),
            array_join(formats, "|").as("format"),
            status.as("status"),
            (byFormat || byStatus).as("suppressed"),
            when(byFormat, lit("format"))
              .when(byStatus, lit("status"))
              .otherwise(lit("")).as("suppressed_by")
          )
      },
      Some {
        s"""WITH t AS (SELECT p_partkey AS k,
           |  (CASE WHEN p_partkey % 7 = 0 THEN 'Electronic Book' ELSE 'Book' END) AS fmt1,
           |  (CASE WHEN p_partkey % 3 = 0 THEN 'Online' ELSE '' END) AS fmt2,
           |  (CASE WHEN p_partkey % 5 = 0 THEN 'deleted' ELSE 'active' END) AS st
           |  FROM part),
           |f AS (SELECT k, fmt1, fmt2, st,
           |  regexp_matches(fmt1, '^Electronic') OR (fmt2 != '' AND regexp_matches(fmt2, '^Electronic')) AS by_format,
           |  st IN ('deleted', 'hidden') AS by_status
           |  FROM t)
           |SELECT 'part.' || cast(k as varchar) AS record_id,
           |  (CASE WHEN fmt2 != '' THEN fmt1 || '|' || fmt2 ELSE fmt1 END) AS format,
           |  st AS status,
           |  (by_format OR by_status) AS suppressed,
           |  (CASE WHEN by_format THEN 'format' WHEN by_status THEN 'status' ELSE '' END) AS suppressed_by
           |FROM f""".stripMargin
      }
    ),
    Q(
      // The referenceCompat suppression mode under the oracle gate
      // (AbstractRecord.php:455 bug-for-bug): the /regex/ filter never
      // fires on ordinary values — 'Electronic Book' falls through to the
      // exploded-pipe comparison and stays unsuppressed — while
      // slash-WRAPPED values are preg_match'ed against the filter
      // ('/Electronic archive/' matches, '/Paper archive/' does not).
      "records_suppressed_compat",
      (s, d) => {
        val k = col("p_partkey")
        val fmt1 = when(k % 7 === 0, lit("Electronic Book")).otherwise(lit("Book"))
        val fmt2 = when(k % 3 === 0, lit("/Electronic archive/"))
          .when(k % 3 === 1, lit("/Paper archive/"))
          .otherwise(lit(""))
        val status = when(k % 5 === 0, lit("deleted")).otherwise(lit("active"))
        val formats = filter(array(fmt1, fmt2), v => v =!= "")
        val byFormat = suppressMatch(formats, "/^.?Electronic/", referenceCompat = true)
        val byStatus = suppressMatch(array(status), "deleted|hidden", referenceCompat = true)
        Tables
          .part(s, d)
          .select(
            concat(lit("part."), k.cast("string")).as("record_id"),
            array_join(formats, "|").as("format"),
            status.as("status"),
            (byFormat || byStatus).as("suppressed"),
            when(byFormat, lit("format"))
              .when(byStatus, lit("status"))
              .otherwise(lit("")).as("suppressed_by")
          )
      },
      Some {
        s"""WITH t AS (SELECT p_partkey AS k,
           |  (CASE WHEN p_partkey % 7 = 0 THEN 'Electronic Book' ELSE 'Book' END) AS fmt1,
           |  (CASE WHEN p_partkey % 3 = 0 THEN '/Electronic archive/'
           |        WHEN p_partkey % 3 = 1 THEN '/Paper archive/' ELSE '' END) AS fmt2,
           |  (CASE WHEN p_partkey % 5 = 0 THEN 'deleted' ELSE 'active' END) AS st
           |  FROM part),
           |f AS (SELECT k, fmt1, fmt2, st,
           |  (fmt2 != '' AND substr(fmt2, 1, 1) = '/' AND substr(fmt2, length(fmt2), 1) = '/'
           |   AND regexp_matches(fmt2, '^.?Electronic')) AS by_format,
           |  st IN ('deleted', 'hidden') AS by_status
           |  FROM t)
           |SELECT 'part.' || cast(k as varchar) AS record_id,
           |  (CASE WHEN fmt2 != '' THEN fmt1 || '|' || fmt2 ELSE fmt1 END) AS format,
           |  st AS status,
           |  (by_format OR by_status) AS suppressed,
           |  (CASE WHEN by_format THEN 'format' WHEN by_status THEN 'status' ELSE '' END) AS suppressed_by
           |FROM f""".stripMargin
      }
    ),
    Q(
      // Full-text enrichment shaping (reference: Record/FullTextTrait.php:88
      // getFullTextfields): xpath-collected fragments joined with ' ', then
      // the line-break de-hyphenation fixup (:124). The HTTP fetch branch is
      // out of scope (live I/O); the joined-fragment + fixup path is the
      // data transformation.
      "fulltext_dehyphenate",
      (s, d) => {
        val id = col("doc_id").cast("string")
        val fragments = array(
          concat(lit("Exam-\n  ple text "), id, lit(" hyphen-ated")),
          concat(lit("normaa-\r\n   li Etela-Suomi jat-\nkuu loppu-"))
        )
        Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            dehyphenateFullText(array_join(fragments, " ")).as("fulltext")
          )
      },
      Some {
        val frag =
          "'Exam-' || chr(10) || '  ple text ' || cast(doc_id as varchar) || ' hyphen-ated' || ' ' || " +
            "'normaa-' || chr(13) || chr(10) || '   li Etela-Suomi jat-' || chr(10) || 'kuu loppu-'"
        s"""SELECT doc_id,
           |  regexp_replace($frag, '(\\S+)-\\s*[\\n\\r]+\\s*', '\\1', 'g') AS fulltext
           |FROM documents""".stripMargin
      }
    ),
    Q(
      "wkt_centroid",
      (s, d) => {
        val k = col("p_partkey")
        def n(m: Int, off: Int) = (k % m - off).cast("string")
        val input = when(
          k % 3 === 0,
          concat(lit("POINT("), n(360, 180), lit(".5 "), n(180, 90), lit(".5)"))
        ).when(
          k % 3 === 1,
          concat(
            lit("LINESTRING("),
            n(100, 50), lit(" "), n(80, 40), lit(", "),
            n(100, 48), lit(" "), n(80, 38), lit(")")
          )
        ).otherwise(
          concat(
            lit("POLYGON(("),
            n(100, 50), lit(" "), n(80, 40), lit(", "),
            (k % 100 - 46).cast("string"), lit(" "), n(80, 40), lit(", "),
            (k % 100 - 46).cast("string"), lit(" "), (k % 80 - 36).cast("string"), lit(", "),
            n(100, 50), lit(" "), (k % 80 - 36).cast("string"), lit(", "),
            n(100, 50), lit(" "), n(80, 40), lit("))")
          )
        )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            input.as("wkt"),
            Wkt.wktType(input).as("wkt_type"),
            round(Wkt.centroidX(input), 6).as("centroid_x"),
            round(Wkt.centroidY(input), 6).as("centroid_y")
          )
      },
      Some {
        val coords =
          "list_transform(string_split(regexp_extract(wkt, '\\(+([^()]+)\\)+', 1), ', '), p -> struct_pack(x := cast(string_split(trim(p), ' ')[1] as double), y := cast(string_split(trim(p), ' ')[2] as double)))"
        def cross(i: String) = s"(c[$i].x * c[$i+1].y - c[$i+1].x * c[$i].y)"
        def polyC(f: String) =
          s"(list_sum(list_transform(range(1, len(c)), i -> (c[i].$f + c[i+1].$f) * ${cross("i")})) / (3.0 * list_sum(list_transform(range(1, len(c)), i -> ${cross("i")}))))"
        s"""WITH t AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 3 = 0 THEN 'POINT(' || cast(p_partkey % 360 - 180 as varchar) || '.5 ' || cast(p_partkey % 180 - 90 as varchar) || '.5)'
           |        WHEN p_partkey % 3 = 1 THEN 'LINESTRING(' || cast(p_partkey % 100 - 50 as varchar) || ' ' || cast(p_partkey % 80 - 40 as varchar) || ', ' || cast(p_partkey % 100 - 48 as varchar) || ' ' || cast(p_partkey % 80 - 38 as varchar) || ')'
           |        ELSE 'POLYGON((' || cast(p_partkey % 100 - 50 as varchar) || ' ' || cast(p_partkey % 80 - 40 as varchar) || ', ' || cast(p_partkey % 100 - 46 as varchar) || ' ' || cast(p_partkey % 80 - 40 as varchar) || ', ' || cast(p_partkey % 100 - 46 as varchar) || ' ' || cast(p_partkey % 80 - 36 as varchar) || ', ' || cast(p_partkey % 100 - 50 as varchar) || ' ' || cast(p_partkey % 80 - 36 as varchar) || ', ' || cast(p_partkey % 100 - 50 as varchar) || ' ' || cast(p_partkey % 80 - 40 as varchar) || '))' END) AS wkt
           |  FROM part),
           |p AS (SELECT p_partkey, wkt, upper(regexp_extract(wkt, '^\\s*([A-Za-z]+)', 1)) AS wkt_type, $coords AS c FROM t)
           |SELECT p_partkey, wkt, wkt_type,
           |  round(CASE WHEN wkt_type = 'POINT' THEN c[1].x
           |             WHEN wkt_type = 'LINESTRING' THEN list_sum(list_transform(c, q -> q.x)) / len(c)
           |             WHEN wkt_type = 'POLYGON' THEN ${polyC("x")} END, 6) AS centroid_x,
           |  round(CASE WHEN wkt_type = 'POINT' THEN c[1].y
           |             WHEN wkt_type = 'LINESTRING' THEN list_sum(list_transform(c, q -> q.y)) / len(c)
           |             WHEN wkt_type = 'POLYGON' THEN ${polyC("y")} END, 6) AS centroid_y
           |FROM p""".stripMargin
      }
    ),
    // MULTI* WKT centroids (the remaining geoPHP shapes of
    // MetadataUtils.php:987): MULTIPOINT / MULTILINESTRING vertex means,
    // MULTIPOLYGON exact area-weighted union centroid via combined
    // shoelace sums. The oracle recomputes the centroids in closed form
    // from the same generator parameters — every coordinate is an exact
    // small integer, so both sides divide identical exact numerators and
    // agree bit-for-bit before the final round.
    Q(
      "wkt_multi",
      (s, d) => {
        val k = col("p_partkey")
        def c(e: org.apache.spark.sql.Column) = e.cast("string")
        val s1 = k % 5 + 1
        val s2 = k % 3 + 1
        val input = when(
          k % 3 === 0,
          concat(
            lit("MULTIPOINT("),
            c(k % 7), lit(" "), c(k % 11), lit(", "),
            c(k % 5 + 2), lit(" "), c(k % 13), lit(")")
          )
        ).when(
          k % 3 === 1,
          concat(
            lit("MULTILINESTRING(("),
            c(k % 4), lit(" "), c(k % 6), lit(", "),
            c(k % 4 + 2), lit(" "), c(k % 6 + 2), lit("),("),
            lit("10 20, 12 22))")
          )
        ).otherwise(
          concat(
            lit("MULTIPOLYGON(((0 0, "), c(s1), lit(" 0, "), c(s1), lit(" "), c(s1),
            lit(", 0 "), c(s1), lit(", 0 0)),((10 0, "), c(s2 + 10), lit(" 0, "),
            c(s2 + 10), lit(" "), c(s2), lit(", 10 "), c(s2), lit(", 10 0)))")
          )
        )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            input.as("wkt"),
            Wkt.wktType(input).as("wkt_type"),
            round(Wkt.centroidX(input), 6).as("centroid_x"),
            round(Wkt.centroidY(input), 6).as("centroid_y")
          )
      },
      Some {
        s"""WITH t AS (SELECT p_partkey, p_partkey AS k,
           |  cast(p_partkey % 5 + 1 as double) AS s1,
           |  cast(p_partkey % 3 + 1 as double) AS s2
           |  FROM part)
           |SELECT p_partkey,
           |  (CASE WHEN k % 3 = 0 THEN 'MULTIPOINT(' || cast(k % 7 as varchar) || ' ' || cast(k % 11 as varchar) || ', ' || cast(k % 5 + 2 as varchar) || ' ' || cast(k % 13 as varchar) || ')'
           |        WHEN k % 3 = 1 THEN 'MULTILINESTRING((' || cast(k % 4 as varchar) || ' ' || cast(k % 6 as varchar) || ', ' || cast(k % 4 + 2 as varchar) || ' ' || cast(k % 6 + 2 as varchar) || '),(10 20, 12 22))'
           |        ELSE 'MULTIPOLYGON(((0 0, ' || cast(k % 5 + 1 as varchar) || ' 0, ' || cast(k % 5 + 1 as varchar) || ' ' || cast(k % 5 + 1 as varchar) || ', 0 ' || cast(k % 5 + 1 as varchar) || ', 0 0)),((10 0, ' || cast(k % 3 + 11 as varchar) || ' 0, ' || cast(k % 3 + 11 as varchar) || ' ' || cast(k % 3 + 1 as varchar) || ', 10 ' || cast(k % 3 + 1 as varchar) || ', 10 0)))' END) AS wkt,
           |  (CASE WHEN k % 3 = 0 THEN 'MULTIPOINT' WHEN k % 3 = 1 THEN 'MULTILINESTRING' ELSE 'MULTIPOLYGON' END) AS wkt_type,
           |  round(CASE WHEN k % 3 = 0 THEN (cast(k % 7 as double) + (k % 5 + 2)) / 2
           |             WHEN k % 3 = 1 THEN (cast(k % 4 as double) + (k % 4 + 2) + 10 + 12) / 4
           |             ELSE (s1*s1*(s1/2) + s2*s2*(10 + s2/2)) / (s1*s1 + s2*s2) END, 6) AS centroid_x,
           |  round(CASE WHEN k % 3 = 0 THEN (cast(k % 11 as double) + (k % 13)) / 2
           |             WHEN k % 3 = 1 THEN (cast(k % 6 as double) + (k % 6 + 2) + 20 + 22) / 4
           |             ELSE (s1*s1*(s1/2) + s2*s2*(s2/2)) / (s1*s1 + s2*s2) END, 6) AS centroid_y
           |FROM t""".stripMargin
      }
    )
  )
}
