package graft.operators

import graft.{Q, Tables}
import graft.operators.MetadataQueries.{nkSql, stripPunctSql}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Driver-gate certification for the [[MarcToSolr]] assembly: synthesized
  * full-fidelity MARC records (leader + 008 + 100/700/245/264/650/852
  * fields with indicators) are built as nested literals from `part`, run
  * through the REAL `solrColumns`/`workKeys` projections, and the DuckDB
  * oracle replays the arithmetic over the same flat synthesis. The
  * record shapes mirror the reference's own fixtures (one field per
  * tag, ISBD punctuation in the data), so every wiring step — non-filing
  * indicators, relator gating, 008 slicing, format decision, work-key
  * fan-out — is hash-checked by the driver, while full general-shape
  * parity is covered by MarcFixtureSpec on the reference fixtures.
  */
object MarcToSolrQueries {

  private def sub(c: String, v: Column) =
    struct(lit(c).as("c"), v.as("v"))
  private def fld(tag: String, i1: Column, i2: Column, subs: Column*) =
    struct(
      lit(tag).as("tag"),
      i1.as("i1"),
      i2.as("i2"),
      array(subs: _*).as("subs")
    )

  val all: Seq[Q] = Seq(
    Q(
      "marc_tosolr_assembly",
      (s, d) => {
        val k = col("p_partkey")
        val e = lit("")

        // Leader: rt 'e' (Map) every 7th record, else 'a' with bl 'm'
        // (Book) — the exact fixture leaders.
        val rt = when(k % 7 === 0, lit("e")).otherwise(lit("a"))
        val leader = concat(lit("00000c"), rt, lit("m a22000004i 4500"))

        val year = (lit(1900) + (k % 120)).cast("string")
        val lang = element_at(array(lit("fin"), lit("eng"), lit("swe")), (k % 3 + 1).cast("int"))
        val ill = when(k % 3 === 0, lit("a")).otherwise(lit(" "))
        // 008: pos 7-10 year, 18 illustration code, 35-37 language.
        // Positions (0-based): 7-10 year, 18 illustration, 35-37 language.
        val f008 = concat(
          lit("140327s"),
          year,
          lit("    fi "),
          ill,
          lit("                "),
          lang,
          lit(" d")
        )
        val controls = array(
          struct(lit("001").as("tag"), concat(lit("rec"), k.cast("string")).as("v")),
          struct(lit("008").as("tag"), f008.as("v"))
        )

        val theA = concat(
          when(k % 4 === 0, lit("The ")).otherwise(e),
          lit("Title "),
          (k % 100).cast("string")
        )
        val hasB = k % 2 === 1
        val bVal = concat(lit("Subtitle "), (k % 10).cast("string"))
        val ind2 = when(k % 4 === 0, lit("4")).otherwise(lit("0"))
        val f245 = fld(
          "245",
          lit("1"),
          ind2,
          sub("a", theA),
          sub("b", when(hasB, bVal).otherwise(e)),
          sub("c", concat(lit("By Author "), (k % 30).cast("string")))
        )
        // A '' subfield value is the PHP empty-string case the spec
        // evaluator skips; keep it only when populated.
        val f245clean = when(
          hasB,
          f245
        ).otherwise(
          fld(
            "245",
            lit("1"),
            ind2,
            sub("a", theA),
            sub("c", concat(lit("By Author "), (k % 30).cast("string")))
          )
        )

        val author100 = concat(lit("Author, Name "), (k % 50).cast("string"))
        val hasRelator = k % 5 === 0
        // Alternate-script twin via 880 $6 linkage on every 4th record:
        // exercises the GET_BOTH occurrence matching under the oracle
        // (the author name strings gain the linked form).
        val hasAlt = k % 4 === 1
        val altAuthor = concat(lit("Alt Author "), (k % 25).cast("string"))
        val f100 = when(
          hasRelator && hasAlt,
          fld("100", lit("1"), lit(" "), sub("a", author100),
            sub("e", lit("kirjoittaja.")), sub("6", lit("880-01")))
        ).when(
          hasRelator,
          fld("100", lit("1"), lit(" "), sub("a", author100), sub("e", lit("kirjoittaja.")))
        ).when(
          hasAlt,
          fld("100", lit("1"), lit(" "), sub("a", author100), sub("6", lit("880-01")))
        ).otherwise(fld("100", lit("1"), lit(" "), sub("a", author100)))
        val f880 = fld("880", lit("1"), lit(" "), sub("6", lit("100-01")), sub("a", altAuthor))

        val has700 = k % 3 === 0
        val author700 = concat(lit("Second, Author "), (k % 20).cast("string"))
        val f700 = fld("700", lit("1"), lit(" "), sub("a", author700))

        val f264 = fld(
          "264",
          lit(" "),
          lit("1"),
          sub("b", concat(lit("Publisher "), (k % 15).cast("string"), lit(","))),
          sub(
            "c",
            when(k % 2 === 0, concat(lit("9999 ["), year, lit("?]")))
              .otherwise(concat(year, lit(".")))
          )
        )

        val topic1 = concat(lit("topic"), (k % 20).cast("string"))
        val hasEra = k % 6 === 0
        val f650a = when(
          hasEra,
          fld("650", lit(" "), lit("7"), sub("a", topic1), sub("y", lit("1500-1800")))
        ).otherwise(fld("650", lit(" "), lit("7"), sub("a", topic1)))

        val f852 = fld(
          "852",
          lit("8"),
          lit(" "),
          sub("b", concat(lit("B"), (k % 9).cast("string")))
        )

        val fields0 = array(f245clean, f100, f264, f650a, f852)
        val fields1 = when(has700, concat(fields0, array(f700))).otherwise(fields0)
        val fieldsCol = when(hasAlt, concat(fields1, array(f880))).otherwise(fields1)

        // Stage the record synthesis into its own projection: solrColumns
        // references `fields` hundreds of times, and substituting the
        // whole literal-construction tree at each site blows the plan up
        // exponentially (the PLANS.md staged-select/bindOnce house rule).
        val records = Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            leader.as("leader"),
            controls.as("controls"),
            fieldsCol.as("fields")
          )
        val solr = MarcToSolr
          .solrColumns(col("leader"), col("controls"), col("fields"))
          .toMap
        val keys = MarcToSolr.workKeys(col("fields"))

        records
          .select(
            col("p_partkey"),
            solr("title").as("title"),
            solr("title_sort").as("title_sort"),
            solr("title_full").as("title_full"),
            array_join(solr("author"), "|").as("author_csv"),
            array_join(solr("author2"), "|").as("author2_csv"),
            array_join(solr("author2_role"), "|").as("author2_role_csv"),
            solr("author_sort").as("author_sort"),
            array_join(solr("language"), "|").as("language_csv"),
            solr("publishDateSort").as("publish_date_sort"),
            array_join(solr("publisher"), "|").as("publisher_csv"),
            array_join(solr("topic"), "|").as("topic_csv"),
            array_join(solr("era_facet"), "|").as("era_facet_csv"),
            array_join(solr("building"), "|").as("building_csv"),
            solr("illustrated").as("illustrated"),
            array_join(solr("format"), "|").as("format_csv"),
            array_join(keys, "|").as("work_keys_csv")
          )
      },
      Some {
        val title0 =
          "(CASE WHEN k % 2 = 1 THEN a245 || ' : ' || b245 ELSE a245 END)"
        val titleC = s"($title0 || ' ' || c245)"
        // title_full joins raw subfields with plain spaces (no ISBD seps).
        val fullRaw =
          "(a245 || (CASE WHEN k % 2 = 1 THEN ' ' || b245 ELSE '' END) || ' ' || c245)"
        // Non-filing strip for filing forms (ind2=4 on 'The ' rows).
        val titleCStrip = s"(CASE WHEN k % 4 = 0 THEN substr($titleC, 5) ELSE $titleC END)"
        val wkTitle = "(CASE WHEN k % 2 = 1 THEN a245 || ' ' || b245 ELSE a245 END)"
        val wkTitleStrip = s"(CASE WHEN k % 4 = 0 THEN substr($wkTitle, 5) ELSE $wkTitle END)"
        s"""WITH base AS (
           |  SELECT p_partkey AS k,
           |    (CASE WHEN p_partkey % 4 = 0 THEN 'The ' ELSE '' END)
           |      || 'Title ' || cast(p_partkey % 100 as varchar) AS a245,
           |    'Subtitle ' || cast(p_partkey % 10 as varchar) AS b245,
           |    'By Author ' || cast(p_partkey % 30 as varchar) AS c245,
           |    'Author, Name ' || cast(p_partkey % 50 as varchar) AS a100,
           |    'Author, Name ' || cast(p_partkey % 50 as varchar)
           |      || (CASE WHEN p_partkey % 4 = 1
           |          THEN ' Alt Author ' || cast(p_partkey % 25 as varchar) ELSE '' END) AS a100x,
           |    'Second, Author ' || cast(p_partkey % 20 as varchar) AS a700,
           |    cast(1900 + p_partkey % 120 as varchar) AS yr,
           |    (['fin','eng','swe'])[cast(p_partkey % 3 + 1 as int)] AS lang,
           |    'topic' || cast(p_partkey % 20 as varchar) AS topic1
           |  FROM part),
           |t AS (
           |  SELECT *,
           |    $title0 AS title_raw,
           |    lower(${stripPunctSql(titleCStrip)}) AS title_sort,
           |    $fullRaw AS title_full_raw,
           |    $wkTitleStrip AS wk_t1,
           |    $wkTitle AS wk_t2,
           |    (k % 5 = 0) AS has_rel,
           |    (k % 3 = 0) AS has700
           |  FROM base)
           |SELECT k AS p_partkey,
           |  title_raw AS title,
           |  title_sort,
           |  title_full_raw AS title_full,
           |  (CASE WHEN has_rel THEN '' ELSE a100x END) AS author_csv,
           |  (CASE WHEN has_rel AND has700 THEN a100x || '|' || a700
           |        WHEN has_rel THEN a100x
           |        WHEN has700 THEN a700
           |        ELSE '' END) AS author2_csv,
           |  (CASE WHEN has_rel AND has700 THEN 'kirjoittaja|'
           |        WHEN has_rel THEN 'kirjoittaja'
           |        WHEN has700 THEN ''
           |        ELSE '' END) AS author2_role_csv,
           |  a100x AS author_sort,
           |  lang AS language_csv,
           |  yr AS publish_date_sort,
           |  'Publisher ' || cast(k % 15 as varchar) AS publisher_csv,
           |  topic1 || (CASE WHEN k % 6 = 0 THEN ' 1500-1800' ELSE '' END) AS topic_csv,
           |  (CASE WHEN k % 6 = 0 THEN '1500-1800' ELSE '' END) AS era_facet_csv,
           |  'B' || cast(k % 9 as varchar) AS building_csv,
           |  (CASE WHEN k % 7 != 0 AND k % 3 = 0 THEN 'Illustrated'
           |        ELSE 'Not Illustrated' END) AS illustrated,
           |  (CASE WHEN k % 7 = 0 THEN 'Map' ELSE 'Book' END) AS format_csv,
           |  (CASE WHEN k % 4 = 0
           |        THEN 'AT ' || ${nkSql("a100")} || ' ' || ${nkSql("wk_t1")}
           |          || (CASE WHEN has700 THEN '|AT ' || ${nkSql("a700")} || ' ' || ${nkSql("wk_t1")} ELSE '' END)
           |          || '|AT ' || ${nkSql("a100")} || ' ' || ${nkSql("wk_t2")}
           |          || (CASE WHEN has700 THEN '|AT ' || ${nkSql("a700")} || ' ' || ${nkSql("wk_t2")} ELSE '' END)
           |        ELSE 'AT ' || ${nkSql("a100")} || ' ' || ${nkSql("wk_t1")}
           |          || (CASE WHEN has700 THEN '|AT ' || ${nkSql("a700")} || ' ' || ${nkSql("wk_t1")} ELSE '' END)
           |        END) AS work_keys_csv
           |FROM t ORDER BY p_partkey""".stripMargin
      }
    ),
    Q(
      // Koha/Alma holdings normalization (Marc.php:1368) under the
      // driver gate: synthesized 952 item fields collapse to per-location
      // holdings in all three modes — Koha (branch $b, lost-marker +
      // status availability), Koha home-branch ($a grouping), and Alma
      // ($1 = '1' availability) — with the available-marker subfield $9
      // appended exactly as the reference does. Item shapes make every
      // branch reachable: shared vs distinct grouping keys (even/odd k),
      // lost markers every 5th record, status codes cycling k % 4.
      "marc_holdings_norm",
      (s, d) => {
        val k = col("p_partkey")
        val f245 = fld("245", lit("1"), lit("0"), sub("a", concat(lit("T"), k.cast("string"))))
        val aHome = concat(lit("A"), (k % 2).cast("string"))
        val b = concat(lit("B"), (k % 3).cast("string"))
        val c1 = concat(lit("C"), (k % 2).cast("string"))
        val h = concat(lit("H"), (k % 5).cast("string"))
        def item(subs: Column*) = fld("952", lit(" "), lit(" "), subs: _*)
        val item1k = item(
          sub("a", aHome),
          sub("b", b),
          sub("c", c1),
          sub("h", h),
          sub("7", (k % 4).cast("string")),
          sub("0", when(k % 5 === 0, lit("L")).otherwise(lit("")))
        )
        val item2k = item(
          sub("a", lit("A1")),
          sub("b", b),
          sub("c", when(k % 2 === 0, lit("C0")).otherwise(lit("D"))),
          sub("h", h),
          sub("7", lit("0"))
        )
        val kohaFields = array(f245, item1k, item2k)
        val item1a = item(
          sub("b", b),
          sub("c", c1),
          sub("h", h),
          sub("1", when(k % 3 === 0, lit("1")).otherwise(lit("0")))
        )
        val item2a = item(sub("b", b), sub("c", lit("D2")), sub("h", h), sub("1", lit("0")))
        val almaFields = array(f245, item1a, item2a)
        def render(fields: Column): Column = array_join(
          transform(
            MarcToSolr.flds(fields, "952"),
            f => array_join(transform(f("subs"), x => concat(x("c"), lit("="), x("v"))), ",")
          ),
          "|"
        )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            render(MarcToSolr.normalizeHoldings(kohaFields, alma = false)).as("holdings_koha"),
            render(MarcToSolr.normalizeHoldings(kohaFields, alma = false, useHome = true))
              .as("holdings_home"),
            render(MarcToSolr.normalizeHoldings(almaFields, alma = true)).as("holdings_alma"),
            size(MarcToSolr.normalizeHoldings(kohaFields, alma = false)).cast("long").as("n_fields")
          )
      },
      Some {
        // avail1: item 1 is available when no lost marker (k % 5) and the
        // status code is 0/1 (k % 4 < 2). Item 2 is always available in
        // Koha mode and never in Alma mode.
        s"""WITH base AS (
           |  SELECT p_partkey AS k,
           |    'A' || cast(p_partkey % 2 as varchar) AS ahome,
           |    'B' || cast(p_partkey % 3 as varchar) AS b,
           |    'C' || cast(p_partkey % 2 as varchar) AS c1,
           |    'H' || cast(p_partkey % 5 as varchar) AS h,
           |    (p_partkey % 5 != 0 AND p_partkey % 4 < 2) AS avail1
           |  FROM part)
           |SELECT k AS p_partkey,
           |  (CASE WHEN k % 2 = 0
           |    THEN 'b=' || b || ',c=C0,h=' || h || ',9=1'
           |    ELSE 'b=' || b || ',c=C1,h=' || h
           |      || (CASE WHEN avail1 THEN ',9=1' ELSE '' END)
           |      || '|b=' || b || ',c=D,h=' || h || ',9=1'
           |    END) AS holdings_koha,
           |  (CASE WHEN k % 2 = 0
           |    THEN 'b=A0,c=C0,h=' || h || (CASE WHEN avail1 THEN ',9=1' ELSE '' END)
           |      || '|b=A1,c=C0,h=' || h || ',9=1'
           |    ELSE 'b=A1,c=C1,h=' || h || (CASE WHEN avail1 THEN ',9=1' ELSE '' END)
           |      || '|b=A1,c=D,h=' || h || ',9=1'
           |    END) AS holdings_home,
           |  'b=' || b || ',c=' || c1 || ',h=' || h
           |    || (CASE WHEN k % 3 = 0 THEN ',9=1' ELSE '' END)
           |    || '|b=' || b || ',c=D2,h=' || h AS holdings_alma,
           |  cast(CASE WHEN k % 2 = 0 THEN 2 ELSE 3 END as bigint) AS n_fields
           |FROM base ORDER BY k""".stripMargin
      }
    )
  )
}
