package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions.{arrayTrim, normalizeUnicode, stripLeadingPunctuation, validateIso8601Date}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Second batch of metadata operators: author initials, case-insensitive
  * unique, trailing-punctuation detection, language-array normalization
  * and hidden-component-part classification.
  */
object MetadataQueries2 {

  /** Author initials (reference: MetadataUtils.php:1184 getAuthorInitials,
    * after VuFind's processInitials): lowercase letters-only tokens,
    * personal names ("Last, First…") rotated so the surname initial comes
    * last, hyphenated names contribute both initials, plus smushed
    * variants for matching.
    */
  def authorInitials(name: Column): Column = {
    val q = instr(name, ",")
    val isPersonal = q > 1 && q < length(name)
    val cleaned = lower(regexp_replace(name, "[^\\p{L} -]", ""))
    val names0 = split(cleaned, " ")
    val names = when(
      isPersonal,
      concat(slice(names0, 2, 10000), slice(names0, 1, 1))
    ).otherwise(names0)
    val nonEmpty = filter(names, n => n =!= "")
    val inits = transform(
      nonEmpty,
      n => {
        val hp = instr(n, "-")
        val base = substring(n, 1, 1)
        when(
          hp > 1 && hp < length(n),
          concat(base, lit(" "), n.substr(hp + 1, lit(1)))
        ).otherwise(base)
      }
    )
    // PHP builds " $initial" per token => leading space before join.
    val result = concat(lit(" "), array_join(inits, " "))
    val smushAll = regexp_replace(result, " ", "")
    val withPers = when(
      size(names) > 2 && isPersonal,
      concat(
        result,
        lit(" "),
        regexp_replace(result.substr(lit(1), length(result) - 1), " ", "")
      )
    ).otherwise(result)
    val withAll = when(
      trim(withPers) =!= smushAll,
      concat(withPers, lit(" "), smushAll)
    ).otherwise(withPers)
    trim(withAll)
  }

  /** Case-insensitive unique keeping first occurrences (reference:
    * MetadataUtils.php:721 array_iunique).
    */
  def iUnique(arr: Column): Column =
    filter(
      arr,
      (x, i) =>
        !exists(
          zip_with(arr, sequence(lit(0), size(arr) - 1), (y, j) => lower(y) === lower(x) && j < i),
          b => b
        )
    )

  /** Reference: MetadataUtils.php:507 hasTrailingPunctuation. */
  def hasTrailingPunctuation(c: Column): Column = {
    val r = rtrim(c, " ")
    val last = substring(r, -1, 1)
    val fromBasic = last.isin("/", ":", ";", ",", "=", "(", "[")
    val thirdFromEnd =
      when(length(c) >= 3, substring(c, -3, 1)).otherwise(substring(c, 1, 1))
    (length(c) > 0) && (fromBasic || (c.endsWith(".") && thirdFromEnd =!= " "))
  }

  /** Array form of language normalization (reference:
    * MetadataUtils.php:1056): trim + lower each entry, drop empties.
    */
  def normalizeLanguageArray(arr: Column): Column =
    filter(transform(arr, l => lower(trim(l))), l => l =!= "")

  /** Reference: MetadataUtils.php:947 isHiddenComponentPart. Default
    * format lists: allArticleFormats = eJournalArticle, JournalArticle,
    * Article; articleFormats = JournalArticle, Article.
    */
  def isHiddenComponentPart(
      hasHost: Column,
      componentParts: Column,
      format: Column
  ): Column = {
    val allArticle = format.isin("eJournalArticle", "JournalArticle", "Article")
    val article = format.isin("JournalArticle", "Article")
    hasHost && (
      componentParts === "merge_all" ||
        (componentParts.isin("merge_non_articles", "merge_non_earticles") &&
          (!allArticle || article))
    )
  }

  val all: Seq[Q] = Seq(
    Q(
      "issn_normalize",
      (s, d) => {
        val k = col("p_partkey")
        val base7 = lpad((k * 31 % 10000000).cast("string"), 7, "0")
        val check = graft.functions.MetadataFunctions.issnCheckChar(base7)
        val input = when(k % 3 === 0, concat(substring(base7, 1, 4), lit("-"), substring(base7, 5, 3), check))
          .when(k % 3 === 1, concat(base7, lit("5"))) // usually bad checksum
          .otherwise(concat(lit("no issn "), k.cast("string")))
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            input.as("issn_input"),
            graft.functions.MetadataFunctions.normalizeIssn(input).as("issn")
          )
      },
      Some {
        def sumSql(b: String) =
          (1 to 7).map(p => s"${9 - p}*cast(substr($b,$p,1) as int)").mkString(" + ")
        def remSql(b: String) = s"((11 - ((${sumSql(b)}) % 11)) % 11)"
        def checkSql(b: String) =
          s"(CASE WHEN ${remSql(b)} = 10 THEN 'X' ELSE cast(${remSql(b)} as varchar) END)"
        s"""WITH t AS (SELECT p_partkey, lpad(cast(p_partkey*31 % 10000000 as varchar), 7, '0') AS b7 FROM part),
           |u AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 3 = 0 THEN substr(b7,1,4) || '-' || substr(b7,5,3) || ${checkSql("b7")}
           |        WHEN p_partkey % 3 = 1 THEN b7 || '5'
           |        ELSE 'no issn ' || cast(p_partkey as varchar) END) AS issn_input
           |  FROM t),
           |v AS (SELECT p_partkey, issn_input, upper(regexp_replace(issn_input, '[- ]', '', 'g')) AS c FROM u)
           |SELECT p_partkey, issn_input,
           |  (CASE WHEN regexp_matches(c, '^[0-9]{7}[0-9X]$$')
           |        THEN (CASE WHEN substr(c, 8, 1) = ${checkSql("c")}
           |                   THEN substr(c,1,4) || '-' || substr(c,5,4) ELSE '' END)
           |        ELSE '' END) AS issn
           |FROM v""".stripMargin
      }
    ),
    Q(
      "author_initials",
      (s, d) => {
        val ws = split(col("p_name"), " ")
        val w = (i: Int) => element_at(ws, i)
        val input = when(col("p_partkey") % 4 === 0, concat(w(2), lit(", "), w(1)))
          .when(col("p_partkey") % 4 === 1, concat(w(1), lit(" "), w(2)))
          .when(col("p_partkey") % 4 === 2, concat(w(1), lit("-"), w(2), lit(" "), w(1)))
          .otherwise(concat(w(2), lit(", "), w(1), lit(" "), w(2)))
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("author_name"),
            authorInitials(input).as("initials")
          )
      },
      Some {
        val inits =
          """list_transform(nonempty, n ->
            |  CASE WHEN strpos(n, '-') > 1 AND strpos(n, '-') < length(n)
            |       THEN substr(n,1,1) || ' ' || substr(n, strpos(n,'-')+1, 1)
            |       ELSE substr(n,1,1) END)""".stripMargin
        s"""WITH t AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 4 = 0 THEN string_split(p_name,' ')[2] || ', ' || string_split(p_name,' ')[1]
           |        WHEN p_partkey % 4 = 1 THEN string_split(p_name,' ')[1] || ' ' || string_split(p_name,' ')[2]
           |        WHEN p_partkey % 4 = 2 THEN string_split(p_name,' ')[1] || '-' || string_split(p_name,' ')[2] || ' ' || string_split(p_name,' ')[1]
           |        ELSE string_split(p_name,' ')[2] || ', ' || string_split(p_name,' ')[1] || ' ' || string_split(p_name,' ')[2]
           |   END) AS author_name FROM part),
           |a AS (SELECT p_partkey, author_name,
           |  (strpos(author_name, ',') > 1 AND strpos(author_name, ',') < length(author_name)) AS is_personal,
           |  string_split(lower(regexp_replace(author_name, '[^\\p{L} -]', '', 'g')), ' ') AS names0
           |  FROM t),
           |b AS (SELECT *, (CASE WHEN is_personal THEN list_concat(names0[2:], names0[1:1]) ELSE names0 END) AS names FROM a),
           |c AS (SELECT *, list_filter(names, n -> n != '') AS nonempty FROM b),
           |e AS (SELECT *, ' ' || array_to_string($inits, ' ') AS result FROM c),
           |f AS (SELECT *, replace(result, ' ', '') AS smush_all,
           |  (CASE WHEN len(names) > 2 AND is_personal
           |        THEN result || ' ' || replace(substr(result, 1, length(result) - 1), ' ', '')
           |        ELSE result END) AS with_pers FROM e)
           |SELECT p_partkey, author_name,
           |  trim(CASE WHEN trim(with_pers) != smush_all THEN with_pers || ' ' || smush_all ELSE with_pers END) AS initials
           |FROM f""".stripMargin
      }
    ),
    Q(
      "uniq_values",
      (s, d) => {
        val arr = array(
          col("event_type"),
          upper(col("event_type")),
          lit("extra"),
          initcap(col("event_type"))
        )
        Tables
          .events(s, d)
          .select(
            col("event_id"),
            array_join(iUnique(arr), ",").as("uniq_csv")
          )
      },
      Some(
        """WITH t AS (SELECT event_id,
          |  [event_type, upper(event_type), 'extra',
          |   upper(substr(event_type,1,1)) || substr(event_type,2)] AS arr
          |  FROM events)
          |SELECT event_id,
          |  array_to_string(list_filter(arr, (x, i) ->
          |    len(list_filter(list_zip(arr, range(1, len(arr)+1)),
          |        z -> lower(z[1]) = lower(x) AND z[2] < i)) = 0), ',') AS uniq_csv
          |FROM t""".stripMargin
      )
    ),
    Q(
      "has_trail_punct",
      (s, d) => {
        val suffix = element_at(
          array(lit("/"), lit(" ;"), lit("."), lit(" A."), lit(")"), lit(" x")),
          (col("p_partkey") % 6 + 1).cast("int")
        )
        val input = concat(col("p_name"), suffix)
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("raw"),
            hasTrailingPunctuation(input).as("has_punct")
          )
      },
      Some(
        """WITH t AS (SELECT p_partkey,
          |  p_name || (['/', ' ;', '.', ' A.', ')', ' x'])[cast(p_partkey % 6 + 1 as int)] AS raw
          |  FROM part)
          |SELECT p_partkey, raw,
          |  (length(raw) > 0 AND (
          |    substr(rtrim(raw, ' '), -1, 1) IN ('/', ':', ';', ',', '=', '(', '[')
          |    OR (ends_with(raw, '.') AND
          |        (CASE WHEN length(raw) >= 3 THEN substr(raw, length(raw)-2, 1) ELSE substr(raw,1,1) END) != ' ')
          |  )) AS has_punct
          |FROM t""".stripMargin
      )
    ),
    Q(
      "lang_array_norm",
      (s, d) => {
        val arr = array(
          col("lang"),
          concat(lit("  "), upper(col("lang")), lit(" ")),
          lit(""),
          lit(" EN ")
        )
        Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            array_join(normalizeLanguageArray(arr), ",").as("langs_csv")
          )
      },
      Some(
        """SELECT doc_id,
          |  array_to_string(list_filter(
          |    list_transform([lang, '  ' || upper(lang) || ' ', '', ' EN '], l -> lower(trim(l))),
          |    l -> l != ''), ',') AS langs_csv
          |FROM documents""".stripMargin
      )
    ),
    Q(
      "hidden_component",
      (s, d) => {
        val k = col("l_orderkey")
        val settings = element_at(
          array(lit("merge_all"), lit("merge_non_articles"), lit("as_is")),
          (k % 3 + 1).cast("int")
        )
        val format = element_at(
          array(lit("eJournalArticle"), lit("Book"), lit("JournalArticle"), lit("Serial")),
          (col("l_partkey") % 4 + 1).cast("int")
        )
        val hasHost = col("l_linenumber") > 1
        Tables
          .lineitem(s, d)
          .select(
            k.as("host_id"),
            col("l_linenumber").as("line_no"),
            settings.as("component_parts"),
            format.as("format"),
            isHiddenComponentPart(hasHost, settings, format).as("hidden")
          )
      },
      Some(
        """WITH t AS (SELECT l_orderkey AS host_id, l_linenumber AS line_no,
          |  (['merge_all', 'merge_non_articles', 'as_is'])[cast(l_orderkey % 3 + 1 as int)] AS component_parts,
          |  (['eJournalArticle', 'Book', 'JournalArticle', 'Serial'])[cast(l_partkey % 4 + 1 as int)] AS format,
          |  (l_linenumber > 1) AS has_host
          |  FROM lineitem)
          |SELECT host_id, line_no, component_parts, format,
          |  (has_host AND (component_parts = 'merge_all' OR
          |    (component_parts IN ('merge_non_articles', 'merge_non_earticles') AND
          |     (NOT format IN ('eJournalArticle', 'JournalArticle', 'Article')
          |      OR format IN ('JournalArticle', 'Article'))))) AS hidden
          |FROM t""".stripMargin
      )
    ),
    // The remaining MetadataUtils string utilities: leading-punctuation
    // strip with punctuation-only preservation (:645), strict ISO 8601
    // validation (:785), element-wise array trim (:926), and NFC Unicode
    // normalization (:902) through the native NormalizeUnicodeExpr (DuckDB
    // checks it with its built-in nfc_normalize).
    Q(
      "string_edge_ops",
      (s, d) => {
        val k = col("p_partkey")
        val raws = when(k % 4 === 0, concat(lit("¡*Hola "), col("p_name")))
          .when(k % 4 === 1, concat(lit(".., ["), col("p_name"), lit("]")))
          .when(k % 4 === 2, lit("!??"))
          .otherwise(col("p_name"))
        val iso = when(k % 5 === 0, concat(lit("-"), lpad((k % 9999).cast("string"), 4, "0"), lit("-03-15T10:20:30Z")))
          .when(k % 5 === 1, concat((lit(1900) + k % 100).cast("string"), lit("-13-15T10:20:30Z")))
          .when(k % 5 === 2, concat((lit(1900) + k % 100).cast("string"), lit("-03-15T10:20:30")))
          .when(k % 5 === 3, concat((lit(1900) + k % 100).cast("string"), lit("-03-15T25:20:30Z")))
          .otherwise(concat((lit(1900) + k % 100).cast("string"), lit("-03-15T10:20:30Z")))
        val arr = array(
          concat(lit("  "), col("p_type"), lit("\t")),
          lit(" x "),
          col("p_brand")
        )
        val decomposed = concat(lit("Café "), (k % 10).cast("string"))
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            stripLeadingPunctuation(raws).as("lead_stripped"),
            validateIso8601Date(iso).as("iso_valid"),
            array_join(arrayTrim(arr), "|").as("trimmed"),
            normalizeUnicode(decomposed).as("nfc")
          )
      },
      Some(
        """WITH t AS (SELECT p_partkey, p_name, p_type, p_brand,
          |  (CASE WHEN p_partkey % 4 = 0 THEN '¡*Hola ' || p_name
          |        WHEN p_partkey % 4 = 1 THEN '.., [' || p_name || ']'
          |        WHEN p_partkey % 4 = 2 THEN '!??'
          |        ELSE p_name END) AS raws,
          |  (CASE WHEN p_partkey % 5 = 0 THEN '-' || lpad(cast(p_partkey % 9999 as varchar), 4, '0') || '-03-15T10:20:30Z'
          |        WHEN p_partkey % 5 = 1 THEN cast(1900 + p_partkey % 100 as varchar) || '-13-15T10:20:30Z'
          |        WHEN p_partkey % 5 = 2 THEN cast(1900 + p_partkey % 100 as varchar) || '-03-15T10:20:30'
          |        WHEN p_partkey % 5 = 3 THEN cast(1900 + p_partkey % 100 as varchar) || '-03-15T25:20:30Z'
          |        ELSE cast(1900 + p_partkey % 100 as varchar) || '-03-15T10:20:30Z' END) AS iso
          |  FROM part),
          |u AS (SELECT *, regexp_replace(raws, '^[ \t#*!¡?/:;.,=(\[''"´`”\x{0308}]*', '') AS ls FROM t)
          |SELECT p_partkey,
          |  (CASE WHEN ls = '' THEN raws ELSE ls END) AS lead_stripped,
          |  (regexp_matches(iso, '^(\-?\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z$')
          |   AND try_cast(regexp_extract(iso, '^(\-?\d{4})-(\d{2})-(\d{2})T', 2) as int) BETWEEN 1 AND 12
          |   AND try_cast(regexp_extract(iso, '^(\-?\d{4})-(\d{2})-(\d{2})T', 3) as int) BETWEEN 1 AND 31
          |   AND try_cast(regexp_extract(iso, 'T(\d{2}):(\d{2}):(\d{2})Z$', 1) as int) BETWEEN 0 AND 23
          |   AND try_cast(regexp_extract(iso, 'T(\d{2}):(\d{2}):(\d{2})Z$', 2) as int) BETWEEN 0 AND 59
          |   AND try_cast(regexp_extract(iso, 'T(\d{2}):(\d{2}):(\d{2})Z$', 3) as int) BETWEEN 0 AND 59) AS iso_valid,
          |  trim(p_type, ' ' || chr(9) || chr(10) || chr(13) || chr(11)) || '|x|' || trim(p_brand, ' ' || chr(9) || chr(10) || chr(13) || chr(11)) AS trimmed,
          |  nfc_normalize('Cafe' || chr(769) || ' ' || cast(p_partkey % 10 as varchar)) AS nfc
          |FROM u""".stripMargin
      )
    ),
    Q(
      // trimXmlWhitespace under the oracle gate (MetadataUtils.php:818):
      // the Java regex needs a backreference (closing-tag match) that
      // RE2/DuckDB lacks, so the oracle replays the SEMANTICS over
      // synthesized XML instead — inter-tag whitespace (incl. newlines
      // and document edges) removed, text-node content kept verbatim
      // (including a leading space inside an element every 3rd record,
      // the case a naive '>\\s+<' collapse would also pass but a
      // text-trimming implementation would fail).
      "xml_trim_whitespace",
      (s, d) => {
        val k = col("p_partkey")
        val txt = concat(lit("v "), (k % 10).cast("string"))
        val lead = when(k % 3 === 0, lit(" lead")).otherwise(lit("no"))
        val xml = concat(
          lit("  <r> <t>"), txt, lit("</t> \n "),
          when(k % 2 === 0, lit("<e/>  ")).otherwise(lit("")),
          lit("<u>"), lead, lit("</u> </r> ")
        )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            graft.functions.MetadataFunctions.trimXmlWhitespace(xml).as("trimmed")
          )
      },
      Some(
        """SELECT p_partkey,
          |  '<r><t>v ' || cast(p_partkey % 10 as varchar) || '</t>'
          |    || (CASE WHEN p_partkey % 2 = 0 THEN '<e/>' ELSE '' END)
          |    || '<u>' || (CASE WHEN p_partkey % 3 = 0 THEN ' lead' ELSE 'no' END)
          |    || '</u></r>' AS trimmed
          |FROM part""".stripMargin
      )
    )
  )
}
