package graft.operators

import graft.{Q, Tables}
import graft.functions.CallNumbers
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MARC component-part (host-item) linkage and call-number rollup.
  *
  * Reference semantics (Record/Marc.php):
  *   - getIsComponentPart:640 — presence of a 773 field.
  *   - getHostRecordIDs:657 — 941$a overrides; else 773$w, and with
  *     003InLinkingID set, ids without a leading '(' get the 003 agency
  *     prefix "(003)id".
  *   - getVolume:703 / getIssue:723 / getStartPage:745 — the three 773$g
  *     citation patterns: 'V (YYYY) : I', 'YYYY : I', and the
  *     ', p. N-M' / leading 'p. N-M' page forms (first page of the range).
  *   - getContainerTitle:769 — 773$t with trailing punctuation stripped.
  *   - toSolrArray callnumber block:493-548 — callnumber-first is the
  *     first of 099$a/090$a/050$a; callnumber-subject the leading letters
  *     of the first 090/050 uppercased; callnumber-label its pre-dot part
  *     uppercased; callnumber-raw all 080/084/050 $ab uppercased; the
  *     sort key comes from the first VALID LC call number, falling back
  *     to the first raw entry (the sort-key computation itself is
  *     oracle-verified by `lc_callnum`; here the selection is the tested
  *     semantic, so the chosen source string is the output).
  */
object MarcHostQueries {

  private val host = Q(
    "marc_host_item",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val has773 = k % 3 < 2
      val hostRef = concat(lit("H"), (k % 500).cast("string"))
      val w773 = when(!has773, lit(""))
        .when(k % 2 === 0, concat(lit("(FI-X)"), hostRef))
        .otherwise(hostRef)
      val vol = (k % 9 + 1).cast("string")
      val iss = (k % 12 + 1).cast("string")
      val yr = (lit(1900) + k % 100).cast("string")
      val p1 = (k % 300 + 10).cast("string")
      val p2 = (k % 300 + 20).cast("string")
      val g773 = when(!has773, lit(""))
        .when(k % 3 === 0, concat(vol, lit(" ("), yr, lit(") : "), iss, lit(", s. "), p1, lit("-"), p2))
        .otherwise(concat(yr, lit(" : "), iss, lit(", s. "), p1))
      val t773 = when(has773, concat(lit("Host Journal "), (k % 20).cast("string"), lit(" /")))
        .otherwise(lit(""))
      val a941 = when(k % 5 === 0, concat(lit("OVR"), ks)).otherwise(lit(""))
      val f003 = lit("FI-NL")

      // getHostRecordIDs: 941 override, else 773$w with the 003 prefix rule.
      val hostIds = when(a941 =!= "", a941)
        .when(w773 === "", lit(""))
        .when(w773.startsWith("("), w773)
        .otherwise(concat(lit("("), f003, lit(")"), w773))

      val volRe = "(\\d*)\\s*\\((\\d{4})\\)\\s*:\\s*(\\d*)"
      val volume = when(g773 === "", lit(""))
        .otherwise(regexp_extract(g773, volRe, 1))
      val issue = when(g773 === "", lit(""))
        .when(regexp_extract(g773, volRe, 0) =!= "", regexp_extract(g773, volRe, 3))
        .otherwise(regexp_extract(g773, "(\\d{4})\\s*:\\s*(\\d*)", 2))
      val pageCap = when(
        regexp_extract(g773, ",\\s*\\w\\.?\\s*([\\d,\\-]+)", 1) =!= "",
        regexp_extract(g773, ",\\s*\\w\\.?\\s*([\\d,\\-]+)", 1)
      ).otherwise(regexp_extract(g773, "^\\w\\.?\\s*([\\d,\\-]+)", 1))
      val startPage = when(g773 === "", lit(""))
        .otherwise(element_at(split(pageCap, "-"), 1))

      Tables
        .part(s, d)
        .select(
          concat(lit("c"), ks).as("record_id"),
          has773.as("is_component_part"),
          hostIds.as("host_ids"),
          volume.as("volume"),
          issue.as("issue"),
          startPage.as("start_page"),
          when(t773 === "", lit(""))
            .otherwise(stripTrailingPunctuation(t773)).as("container_title")
        )
    },
    Some {
      s"""SELECT
         |  'c' || cast(p_partkey as varchar) AS record_id,
         |  (p_partkey % 3 < 2) AS is_component_part,
         |  (CASE WHEN p_partkey % 5 = 0 THEN 'OVR' || cast(p_partkey as varchar)
         |        WHEN p_partkey % 3 = 2 THEN ''
         |        WHEN p_partkey % 2 = 0 THEN '(FI-X)H' || cast(p_partkey % 500 as varchar)
         |        ELSE '(FI-NL)H' || cast(p_partkey % 500 as varchar) END) AS host_ids,
         |  (CASE WHEN p_partkey % 3 = 0 THEN cast(p_partkey % 9 + 1 as varchar) ELSE '' END) AS volume,
         |  (CASE WHEN p_partkey % 3 = 0 THEN cast(p_partkey % 12 + 1 as varchar)
         |        WHEN p_partkey % 3 = 1 THEN cast(p_partkey % 12 + 1 as varchar)
         |        ELSE '' END) AS issue,
         |  (CASE WHEN p_partkey % 3 = 2 THEN ''
         |        ELSE cast(p_partkey % 300 + 10 as varchar) END) AS start_page,
         |  (CASE WHEN p_partkey % 3 = 2 THEN ''
         |        ELSE 'Host Journal ' || cast(p_partkey % 20 as varchar) END) AS container_title
         |FROM part""".stripMargin
    }
  )

  private val callnumbers = Q(
    "marc_callnumber_fields",
    (s, d) => {
      val k = col("p_partkey")
      val c099 = when(k % 4 === 0, lit("Qq 99.1 Foo")).otherwise(lit(""))
      val c090 = when(k % 3 === 0, lit("qa76.9.a25")).otherwise(lit(""))
      val c050a = when(k % 6 === 0, lit("(local)"))
        .otherwise(concat(lit("PS"), (k % 10).cast("string"), lit("35.A"), (k % 50).cast("string")))
      val c050b = lit(".K3 1977")
      val c080 = when(k % 2 === 0, lit("004.67")).otherwise(lit(""))
      val c084 = lit("86.2 ykl")

      val cnFirst = coalesce(
        get(filter(array(c099, c090, c050a), x => x =!= ""), lit(0)),
        lit("")
      )
      val subjVal = coalesce(
        get(filter(array(c090, c050a), x => x =!= ""), lit(0)),
        lit("")
      )
      val subject = regexp_extract(upper(subjVal), "^([A-Z]+)", 1)
      val label = upper(element_at(split(subjVal, "\\.", 2), 1))
      val raw = filter(
        transform(
          array(c080, c084, concat_ws(" ", c050a, c050b)),
          upper(_)
        ),
        x => x =!= ""
      )
      val firstValid = get(filter(raw, cn => CallNumbers.lcValid(cn)), lit(0))
      val sortSrc = coalesce(firstValid, get(raw, lit(0)), lit(""))

      Tables
        .part(s, d)
        .select(
          col("p_partkey"),
          cnFirst.as("callnumber_first"),
          subject.as("callnumber_subject"),
          label.as("callnumber_label"),
          array_join(raw, "|").as("callnumber_raw"),
          // The selection is the semantic under test here; the sort-key
          // arithmetic itself is oracle-verified by `lc_callnum`.
          sortSrc.as("callnumber_sort_src"),
          CallNumbers.lcValid(sortSrc).as("sort_src_valid")
        )
    },
    Some {
      val ps = "'PS' || cast(p_partkey % 10 as varchar) || '35.A' || cast(p_partkey % 50 as varchar) || ' .K3 1977'"
      s"""WITH b AS (
         |  SELECT p_partkey,
         |    (CASE WHEN p_partkey % 4 = 0 THEN 'Qq 99.1 Foo'
         |          WHEN p_partkey % 3 = 0 THEN 'qa76.9.a25'
         |          WHEN p_partkey % 6 = 0 THEN '(local)'
         |          ELSE 'PS' || cast(p_partkey % 10 as varchar) || '35.A' || cast(p_partkey % 50 as varchar) END) AS cn_first,
         |    (CASE WHEN p_partkey % 3 = 0 THEN 'qa76.9.a25'
         |          WHEN p_partkey % 6 = 0 THEN '(local)'
         |          ELSE 'PS' || cast(p_partkey % 10 as varchar) || '35.A' || cast(p_partkey % 50 as varchar) END) AS subj_val,
         |    (CASE WHEN p_partkey % 2 = 0 THEN '004.67|' ELSE '' END)
         |      || '86.2 YKL|'
         |      || (CASE WHEN p_partkey % 6 = 0 THEN '(LOCAL) .K3 1977' ELSE upper($ps) END) AS raw,
         |    (CASE WHEN p_partkey % 6 = 0 THEN
         |            (CASE WHEN p_partkey % 2 = 0 THEN '004.67' ELSE '86.2 YKL' END)
         |          ELSE upper($ps) END) AS sort_src,
         |    (p_partkey % 6 != 0) AS src_valid
         |  FROM part)
         |SELECT p_partkey,
         |  cn_first AS callnumber_first,
         |  regexp_extract(upper(subj_val), '^([A-Z]+)', 1) AS callnumber_subject,
         |  upper(string_split(subj_val, '.')[1]) AS callnumber_label,
         |  raw AS callnumber_raw,
         |  sort_src AS callnumber_sort_src,
         |  src_valid AS sort_src_valid
         |FROM b""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(host, callnumbers)
}
