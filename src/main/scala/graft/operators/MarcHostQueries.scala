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

  /** MARC unique control numbers (reference: Record/Marc.php
    * getUniqueIDs:887): 010$a LCCN / 010$b NUCMC — including the
    * reference's quirk of emitting "(nucmc)<lccn>" (the LCCN value, not
    * the normalized $b) — 015/016 national-bibliography numbers prefixed
    * by their $2 source, 024 standard numbers with the indicator-1 source
    * map (istc/upc/ismn/ian/sici/$2-for-7), ISMN 13-digit validation, the
    * ian space-truncation rule, and 035 system control numbers kept only
    * when they match the scnPatterns list (CONSER/DLC/OCoLC, EXLCZ,
    * EXLNZ-, ISIL-style).
    */
  private val uniqueIds = Q(
    "marc_unique_ids",
    (s, d) => {
      val k = col("p_partkey")
      val ks = k.cast("string")
      val e = lit("")

      val a010 = when(k % 4 === 0, concat(lit(" 78-"), (k % 100000).cast("string"))).otherwise(e)
      val b010 = when(k % 8 === 0, lit("x")).otherwise(e)
      val lccn = normalizeKey(a010)
      val nucmc = normalizeKey(b010)

      val a015 = when(k % 3 === 0, concat(lit("F-"), (k % 1000).cast("string"))).otherwise(e)
      val src015 = lit("skl")
      val n015 = normalizeKey(a015)

      val a016 = when(k % 5 === 0, concat(lit("BN"), (k % 1000).cast("string"))).otherwise(e)
      val src016 = when(k % 10 === 0, e).otherwise(lit("dnb"))
      val n016 = normalizeKey(a016)

      val ind024 = element_at(
        array(lit("0"), lit("1"), lit("2"), lit("3"), lit("4"), lit("7"), lit("5"), lit("8")),
        (k % 8 + 1).cast("int")
      )
      val a024 = when(ind024 === "0", concat(lit("IS"), ks))
        .when(ind024 === "1", concat(lit("UPC "), ks))
        .when(ind024 === "2",
          when(k % 16 === 2, concat(lit("9790"), lpad((k % 1000000000).cast("string"), 9, "0")))
            .otherwise(lit("M-26000")))
        .when(ind024 === "3", concat(ks, lit(" tail")))
        .when(ind024 === "4", concat(lit("SICI/"), ks))
        .otherwise(concat(lit("DD"), ks))
      val sub2024 = lit("doi")
      val src024 = when(ind024 === "0", lit("istc"))
        .when(ind024 === "1", lit("upc"))
        .when(ind024 === "2", lit("ismn"))
        .when(ind024 === "3", lit("ian"))
        .when(ind024 === "4", lit("sici"))
        .when(ind024 === "7", sub2024)
        .otherwise(e)
      // ian: cut at the first space (PHP strpos truthiness: position > 0).
      val p = instr(a024, " ")
      val aIan = when(src024 === "ian" && p > 1, a024.substr(lit(1), p - 1)).otherwise(a024)
      val n024raw = normalizeKey(aIan)
      val n024 = when(
        src024 === "ismn" && regexp_extract(n024raw, "([0-9]{13})", 1) === "",
        e
      ).otherwise(n024raw)

      val f035 = array(
        concat(lit("(OCoLC)ocm"), ks),
        when(k % 2 === 0, concat(lit("(FI-MELINDA)"), ks)).otherwise(concat(lit("local"), ks))
      )
      val scnPatterns = Seq(
        "^\\((CONSER|DLC|OCoLC)\\).+",
        "^\\(EXLCZ\\).+",
        "^\\(EXLNZ-.+\\).+",
        "^\\(\\w\\w-\\w+\\).+"
      )
      val kept035 = transform(
        filter(f035, nr => scnPatterns.map(nr.rlike(_)).reduce(_ || _)),
        nr => normalizeKey(nr)
      )

      val ids = filter(
        concat(
          array(
            when(lccn =!= "", concat(lit("(lccn)"), lccn)).otherwise(e),
            when(nucmc =!= "", concat(lit("(nucmc)"), lccn)).otherwise(e),
            when(src015 =!= "" && n015 =!= "", concat(lit("("), src015, lit(")"), n015)).otherwise(e),
            when(src016 =!= "" && n016 =!= "", concat(lit("("), src016, lit(")"), n016)).otherwise(e),
            when(src024 =!= "" && n024 =!= "", concat(lit("("), src024, lit(")"), n024)).otherwise(e)
          ),
          kept035
        ),
        x => x =!= ""
      )

      Tables
        .part(s, d)
        .select(concat(lit("u"), ks).as("record_id"), array_join(ids, "|").as("unique_ids"))
    },
    Some {
      import MetadataQueries.nkSql
      s"""WITH b AS (
         |  SELECT p_partkey AS k,
         |    (CASE WHEN p_partkey % 4 = 0 THEN '78' || cast(p_partkey % 100000 as varchar) ELSE '' END) AS lccn,
         |    (p_partkey % 8 = 0) AS has_nucmc,
         |    (CASE WHEN p_partkey % 3 = 0 THEN 'f' || cast(p_partkey % 1000 as varchar) ELSE '' END) AS n015,
         |    (CASE WHEN p_partkey % 5 = 0 AND p_partkey % 10 != 0 THEN 'bn' || cast(p_partkey % 1000 as varchar) ELSE '' END) AS n016,
         |    (CASE WHEN p_partkey % 8 = 0 THEN '(istc)is' || cast(p_partkey as varchar)
         |          WHEN p_partkey % 8 = 1 THEN '(upc)upc' || cast(p_partkey as varchar)
         |          WHEN p_partkey % 8 = 2 THEN
         |            (CASE WHEN p_partkey % 16 = 2 THEN '(ismn)9790' || lpad(cast(p_partkey % 1000000000 as varchar), 9, '0') ELSE '' END)
         |          WHEN p_partkey % 8 = 3 THEN '(ian)' || cast(p_partkey as varchar)
         |          WHEN p_partkey % 8 = 4 THEN '(sici)sici' || cast(p_partkey as varchar)
         |          WHEN p_partkey % 8 = 5 THEN '(doi)dd' || cast(p_partkey as varchar)
         |          ELSE '' END) AS id024,
         |    'ocolcocm' || cast(p_partkey as varchar) AS scn1,
         |    (CASE WHEN p_partkey % 2 = 0 THEN ${nkSql("'(FI-MELINDA)' || cast(p_partkey as varchar)")} ELSE '' END) AS scn2
         |  FROM part)
         |SELECT 'u' || cast(k as varchar) AS record_id,
         |  array_to_string(list_filter([
         |    (CASE WHEN lccn != '' THEN '(lccn)' || lccn ELSE '' END),
         |    (CASE WHEN has_nucmc THEN '(nucmc)' || lccn ELSE '' END),
         |    (CASE WHEN n015 != '' THEN '(skl)' || n015 ELSE '' END),
         |    (CASE WHEN n016 != '' THEN '(dnb)' || n016 ELSE '' END),
         |    id024,
         |    scn1,
         |    scn2
         |  ], x -> x != ''), '|') AS unique_ids
         |FROM b""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(host, callnumbers, uniqueIds)
}
