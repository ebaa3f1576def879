package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.functions._

/** SparkEntry query registrations for the metadata normalization library.
  *
  * Each query applies one library function to deterministic inputs derived
  * from the testdata tables, and carries a DuckDB oracle that re-expresses
  * the same semantics in ANSI-ish SQL. The DuckDB SQL snippets are generated
  * from the templates below so the Spark and oracle sides cannot drift
  * independently.
  */
object MetadataQueries {

  // ---- DuckDB SQL templates mirroring MetadataFunctions ----

  private val KeyStripRe = "[\\x00-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7f]"

  /** NFC fixture titles for the romanization query — Russian, Ukrainian
    * and Greek classics plus a mixed-script row; every non-ASCII char is
    * covered by the embedded transliteration table.
    */
  private val TranslitTitles = Seq(
    "Война и мир",
    "Преступление и наказание",
    "Мёртвые души",
    "Братья Карамазовы",
    "Анна Каренина",
    "Кобзар України",
    "Οδύσσεια",
    "Ιλιάς",
    "Αντιγόνη",
    "Πολιτεία",
    "Война и мир War and Peace 1869",
    // Arabic / Persian classics (ISO 233 rows; r10)
    "ألف ليلة وليلة",
    "كتاب الحيوان",
    "مقدمة ابن خلدون",
    "شاهنامه فردوسی",
    "العدد ٣ سنة ١٩٢٥",
    // Japanese (Hepburn kana rows; r11) — yōon digraphs, sokuon
    // gemination incl. tch, chōonpu, katakana+hiragana mixed
    "ぎんが てつどう の よる",
    "きゃべつ と しょうゆ",
    "さっぽろ ラーメン まっちゃ",
    "ノルウェイ の 森",
    // Korean (Revised-Romanization rows; r11) — algorithmic syllable
    // decomposition, double-consonant leads, cluster tails
    "한국어 문법",
    "훈민정음 해례본",
    "아리랑 연가 1926",
    // Chinese classics (bounded pinyin table; r13) — simplified AND
    // traditional forms of the same title must fold to the same key
    "红楼梦",
    "紅樓夢",
    "三国演义",
    "三國演義",
    "西游记",
    "水浒传 Water Margin",
    "论语",
    "道德经",
    "孙子兵法",
    "史记 1959"
  )

  def nkSql(x: String): String =
    s"lower(trim(regexp_replace($x, '$KeyStripRe', '', 'g')))"

  def titleKeySql(t: String): String = {
    val ws = s"string_split($t, ' ')"
    nkSql(
      s"substr(coalesce(array_to_string(list_filter($ws, (w,i) -> " +
        s"coalesce(length(array_to_string($ws[1:i-1], '')), 0) <= 35 and " +
        s"coalesce(len(list_filter($ws[1:i-1], x -> length(x) > 3)), 0) <= 3" +
        s"), ''), ''), 1, 200)"
    )
  }

  /** ISBN-10 checksum remainder: (11 - sum(weight*digit) % 11) % 11. */
  private def isbn10RemSql(b: String): String = {
    val s = (1 to 9).map(p => s"${11 - p}*cast(substr($b,$p,1) as int)").mkString(" + ")
    s"((11 - (($s) % 11)) % 11)"
  }

  def isbn10CheckCharSql(b: String): String =
    s"(case when ${isbn10RemSql(b)} = 10 then 'X' else cast(${isbn10RemSql(b)} as varchar) end)"

  def isbn13CheckDigitSql(b: String): String = {
    val odd = Seq(1, 3, 5, 7, 9).map(p => s"cast(substr($b,$p,1) as int)").mkString(" + ")
    val even = Seq(2, 4, 6, 8).map(p => s"cast(substr($b,$p,1) as int)").mkString(" + ")
    s"cast((10 - ((38 + 3*($odd) + ($even)) % 10)) % 10 as varchar)"
  }

  def isbn10to13Sql(b: String): String =
    s"(case when regexp_matches($b, '^[0-9]{9}[0-9xX]$$') " +
      s"and upper(substr($b,10,1)) = ${isbn10CheckCharSql(b)} " +
      s"then '978' || substr($b,1,9) || ${isbn13CheckDigitSql(b)} else '' end)"

  /** normalizeISBN over a pre-extracted candidate `m`. */
  def normIsbnSql(m: String): String =
    s"(case when $m = '' then '' when length($m) = 10 then ${isbn10to13Sql(m)} else $m end)"

  private val Articles = DefaultArticles

  def stripArticleSql(x: String): String = {
    val cases = Articles
      .map { a =>
        val q = a.replace("'", "''")
        s"when substr(lw,1,${a.length}) = '$q' then substr(lw,${a.length + 1})"
      }
      .mkString(" ")
    s"(select case $cases else lw end from (select lower($x) as lw) _a)"
  }

  private val PunctRe = "[\\t\\p{P}=´`” ̈]+"

  def stripPunctSql(x: String): String =
    s"(select case when r = '' then $x else r end from " +
      s"(select trim(regexp_replace($x, '$PunctRe', ' ', 'g')) as r) _p)"

  /** CTE stages implementing stripTrailingPunctuation over column `in` of
    * CTE `prev`, ending in a CTE named `${p}4` that carries all prior
    * columns plus `out`. Shared by every oracle needing the four-stage
    * chain so the semantics live in one place.
    */
  def stripTrailStagesSql(prev: String, in: String, out: String, p: String): String =
    s"""${p}1 AS (SELECT *, rtrim($in, ' /:;,=([') AS ${p}_s1 FROM $prev),
       |${p}2 AS (SELECT *,
       |  CASE WHEN ends_with(${p}_s1, '.')
       |        AND (CASE WHEN length(${p}_s1) >= 3 THEN substr(${p}_s1, length(${p}_s1)-2, 1) ELSE substr(${p}_s1,1,1) END) != ' '
       |        AND NOT regexp_matches(regexp_extract(${p}_s1, '([^ ]*)\\.$$', 1), '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$$')
       |       THEN substr(${p}_s1, 1, length(${p}_s1)-1) ELSE ${p}_s1 END AS ${p}_s2 FROM ${p}1),
       |${p}3 AS (SELECT *,
       |  CASE WHEN ends_with(${p}_s2, '. -') THEN substr(${p}_s2, 1, length(${p}_s2)-3) ELSE ${p}_s2 END AS ${p}_s3 FROM ${p}2),
       |${p}4 AS (SELECT *,
       |  CASE WHEN ends_with(${p}_s3, ')') AND strpos(${p}_s3, '(') = 0 THEN substr(${p}_s3, 1, length(${p}_s3)-1)
       |       WHEN ends_with(${p}_s3, ']') AND strpos(${p}_s3, '[') = 0 THEN substr(${p}_s3, 1, length(${p}_s3)-1)
       |       ELSE ${p}_s3 END AS $out FROM ${p}3)""".stripMargin

  /** CTE stages implementing createSortTitle over column `in` of CTE
    * `prev`, ending in a CTE named `${p}3` carrying all prior columns plus
    * `out` (strip article → strip punctuation → re-strip when the first
    * character changed → lowercase).
    */
  def sortTitleStagesSql(prev: String, in: String, out: String, p: String): String =
    s"""${p}1 AS (SELECT *, ${stripArticleSql(in)} AS ${p}_t1 FROM $prev),
       |${p}2 AS (SELECT *, ${stripPunctSql(s"${p}_t1")} AS ${p}_t2 FROM ${p}1),
       |${p}3 AS (SELECT *,
       |  lower(CASE WHEN substr(${p}_t2,1,1) != substr(${p}_t1,1,1)
       |        THEN ${stripArticleSql(s"${p}_t2")} ELSE ${p}_t2 END) AS $out
       |  FROM ${p}2)""".stripMargin

  def authorMatchSql(a1: String, a2: String): String = {
    val w1 = s"string_split($a1, ' ')"
    val w2 = s"string_split($a2, ' ')"
    s"(case when $a1 = $a2 then true " +
      s"when length($a1) < 6 or length($a2) < 6 then false " +
      s"when substr($a1,1,least(length($a1),length($a2))) = substr($a2,1,least(length($a1),length($a2))) then true " +
      s"else list_aggregate(list_transform(range(1, least(len($w1), len($w2)) + 1), " +
      s"i -> $w1[i] = $w2[i] or (i > 1 and substr($w1[i],1,1) = substr($w2[i],1,1))), 'bool_and') end)"
  }

  // ---- query registrations ----

  val all: Seq[Q] = Seq(
    Q(
      // The folded column exercises the configured folding-table path
      // (MetadataUtils.php:416-433): accents are injected (a→ä e→é o→ö
      // s→š), then the DEFAULT reference table folds them back, so the
      // result must round-trip to the unfolded key of the original name.
      // Any folding defect (a missed table entry, fold applied after the
      // strip, a broken multi-char value) breaks the round-trip and the
      // oracle catches it.
      "norm_key",
      (s, d) => {
        val accented = translate(col("p_name"), "aeos", "äéöš")
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            normalizeKey(col("p_name")).as("norm_key"),
            normalizeKey(accented, MetadataFunctions.DefaultFoldingTable)
              .as("norm_key_folded")
          )
      },
      Some(
        s"""SELECT p_partkey, ${nkSql("p_name")} AS norm_key,
           |  ${nkSql("p_name")} AS norm_key_folded FROM part""".stripMargin
      )
    ),
    Q(
      "title_key",
      (s, d) => {
        val accented = translate(col("p_name"), "aeos", "äéöš")
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            createTitleKey(col("p_name")).as("title_key"),
            createTitleKey(accented, MetadataFunctions.DefaultFoldingTable)
              .as("title_key_folded")
          )
      },
      Some(
        s"""SELECT p_partkey, ${titleKeySql("p_name")} AS title_key,
           |  ${titleKeySql("p_name")} AS title_key_folded FROM part""".stripMargin
      )
    ),
    Q(
      // The ICU-rules normalizeKey path (the reference default when intl
      // is present): NFD + mark-removal folds the injected accents back
      // to ASCII, so both columns must round-trip to the plain key —
      // computing that on the Spark side requires the real NFD pipeline.
      "norm_key_rules",
      (s, d) => {
        val accented = translate(col("p_name"), "aeos", "äéöš")
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            normalizeKeyRules(col("p_name")).as("rules_key"),
            normalizeKeyRules(accented).as("rules_key_accented")
          )
      },
      Some(
        s"""SELECT p_partkey, ${nkSql("p_name")} AS rules_key,
           |  ${nkSql("p_name")} AS rules_key_accented FROM part""".stripMargin
      )
    ),
    Q(
      // The flag-gated `:: Latin;` romanization stage over Cyrillic and
      // Greek bibliographic titles (MetadataUtils.php:159; embedded
      // ISO 9 / ELOT 743 table — see KeyFoldRulesExpr). Both sides
      // derive the per-char mapping from the SAME Scala table: the
      // oracle is a generated lower() + replace-chain + strip, so a
      // table edit that breaks parity breaks the hash.
      "norm_key_translit",
      (s, d) => {
        val titles = array(TranslitTitles.map(lit): _*)
        val title = element_at(titles, (col("p_partkey") % TranslitTitles.size).cast("int") + 1)
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            title.as("title_raw"),
            normalizeKeyRules(title, romanize = true).as("translit_key")
          )
      },
      Some {
        val list = TranslitTitles.map(t => s"'$t'").mkString("[", ", ", "]")
        // The full table (Cyrillic + Greek + Arabic + kana, r11) is
        // 400+ mappings — one nested replace() chain would blow
        // DuckDB's 128-deep expression binder, so the chain is CHUNKED
        // across nested subselects (each layer ≤ 60 replaces, binder
        // depth resets per SELECT). ORDER is semantic for the r11
        // contextual rows: Hangul syllables (disjoint domain, derived
        // from the SAME algorithmic decomposition for every syllable
        // the titles use), then yōon digraphs BEFORE the per-char kana
        // rows, then sokuon+consonant pairs over the already-romanized
        // tail, then the leftover-sokuon drops.
        import graft.plans.{KeyFoldRulesExpr => KF}
        val hangul = TranslitTitles
          .flatMap(_.toCharArray)
          .filter(c => c >= 0xac00 && c <= 0xd7a3)
          .distinct
          .map(c => c.toString -> KF.hangulRoman(c))
        val charPairs = (KF.CyrillicLatin ++ KF.GreekLatin ++ KF.ArabicLatin ++ KF.HanLatin)
          .map { case (c, v) => c.toString -> v }
        val kanaPairs = KF.KanaLatin.map { case (c, v) => c.toString -> v }
        val chunks = (hangul ++ KF.KanaDigraphs ++ charPairs ++ kanaPairs ++
          KF.SokuonPairs ++ KF.SokuonDrops).grouped(60).toSeq
        var src =
          s"""(SELECT p_partkey, t AS title_raw, lower(t) AS x
             |  FROM (SELECT p_partkey,
             |          ($list)[cast(p_partkey % ${TranslitTitles.size} as int) + 1] AS t
             |        FROM part) _q0)""".stripMargin
        chunks.zipWithIndex.foreach { case (chunk, idx) =>
          val chain =
            chunk.foldLeft("x") { case (acc, (from, to)) => s"replace($acc, '$from', '$to')" }
          src = s"(SELECT p_partkey, title_raw, $chain AS x FROM $src _q${idx + 1})"
        }
        s"""SELECT p_partkey, title_raw,
           |  regexp_replace(x, '$KeyStripRe', '', 'g') AS translit_key
           |FROM $src _qf""".stripMargin
      }
    ),
    Q(
      "isbn_normalize",
      (s, d) => {
        val base = lpad((col("p_partkey") * 7919 % 1000000000).cast("string"), 9, "0")
        val checkChar = graft.functions.MetadataFunctions.isbn10CheckChar(base)
        val input = when(col("p_partkey") % 3 === 0, concat(base, checkChar))
          .when(col("p_partkey") % 3 === 1, concat(base, lit("0")))
          .otherwise(concat(lit("978-"), base, lit("4")))
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("isbn_input"),
            normalizeIsbn(input).as("isbn13")
          )
      },
      Some {
        val base = "lpad(cast(p_partkey*7919 % 1000000000 as varchar), 9, '0')"
        val input =
          s"(case when p_partkey % 3 = 0 then b || ${isbn10CheckCharSql("b")} " +
            s"when p_partkey % 3 = 1 then b || '0' " +
            s"else '978-' || b || '4' end)"
        s"""WITH t AS (SELECT p_partkey, $base AS b FROM part),
           |u AS (SELECT p_partkey, $input AS isbn_input FROM t),
           |v AS (SELECT p_partkey, isbn_input,
           |  regexp_extract(replace(isbn_input, '-', ''), '([0-9]{9,12}[0-9xX])', 1) AS m FROM u)
           |SELECT p_partkey, isbn_input, ${normIsbnSql("m")} AS isbn13 FROM v""".stripMargin
      }
    ),
    Q(
      "extract_year",
      (s, d) => {
        val ds = date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
        val input = concat(lit("published "), ds)
        Tables
          .orders(s, d)
          .select(
            col("o_orderkey"),
            input.as("date_str"),
            extractYear(input).as("year")
          )
      },
      Some(
        """SELECT o_orderkey,
          |  'published ' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS date_str,
          |  regexp_extract('published ' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '(-?\d{4})', 1) AS year
          |FROM orders""".stripMargin
      )
    ),
    Q(
      "strip_lead_article",
      (s, d) => {
        val input = substring(col("text"), 1, 40)
        Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            input.as("prefix"),
            stripLeadingArticle(input).as("stripped")
          )
      },
      Some(
        s"""SELECT doc_id, substr(text, 1, 40) AS prefix,
           |  ${stripArticleSql("substr(text, 1, 40)")} AS stripped
           |FROM documents""".stripMargin
      )
    ),
    Q(
      "strip_trail_punct",
      (s, d) => {
        val suffix = element_at(
          array(lit("/"), lit(" ;"), lit("."), lit(". -"), lit(")"), lit(" =")),
          (col("p_partkey") % 6 + 1).cast("int")
        )
        val input = concat(col("p_name"), suffix)
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("raw"),
            stripTrailingPunctuation(input).as("stripped")
          )
      },
      Some(
        s"""WITH t AS (
           |  SELECT p_partkey,
           |    p_name || (['/', ' ;', '.', '. -', ')', ' ='])[cast(p_partkey % 6 + 1 as int)] AS raw
           |  FROM part),
           |${stripTrailStagesSql("t", "raw", "stripped", "sp")}
           |SELECT p_partkey, raw, stripped FROM sp4""".stripMargin
      )
    ),
    Q(
      "sort_title",
      (s, d) => {
        val input = when(col("p_partkey") % 3 === 0, concat(lit("The "), col("p_name")))
          .when(col("p_partkey") % 3 === 1, concat(lit("A "), col("p_name")))
          .otherwise(col("p_name"))
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("title"),
            createSortTitle(input).as("sort_title")
          )
      },
      Some {
        val input =
          "(case when p_partkey % 3 = 0 then 'The ' || p_name " +
            "when p_partkey % 3 = 1 then 'A ' || p_name else p_name end)"
        s"""WITH t AS (SELECT p_partkey, $input AS title FROM part),
           |a AS (SELECT p_partkey, title, ${stripArticleSql("title")} AS t1 FROM t),
           |b AS (SELECT p_partkey, title, t1, ${stripPunctSql("t1")} AS t2 FROM a)
           |SELECT p_partkey, title,
           |  lower(CASE WHEN substr(t2,1,1) != substr(t1,1,1) THEN ${stripArticleSql("t2")} ELSE t2 END) AS sort_title
           |FROM b""".stripMargin
      }
    ),
    Q(
      "author_ops",
      (s, d) => {
        val a1 = array_join(slice(split(col("p_name"), " "), 1, 2), " ")
        val w2 = element_at(split(col("p_name"), " "), 2)
        val a2 = concat(
          element_at(split(col("p_name"), " "), 1),
          lit(" "),
          substring(w2, 1, 1),
          lit("zz")
        )
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            a1.as("author"),
            convertAuthorLastFirst(a1).as("last_first"),
            authorMatch(a1, a2).as("matched")
          )
      },
      Some {
        val a1 = "array_to_string(string_split(p_name, ' ')[1:2], ' ')"
        val a2 =
          "(string_split(p_name, ' ')[1] || ' ' || substr(string_split(p_name, ' ')[2], 1, 1) || 'zz')"
        s"""WITH t AS (SELECT p_partkey, $a1 AS a1, $a2 AS a2 FROM part)
           |SELECT p_partkey, a1 AS author,
           |  regexp_replace(a1, '^(.*) ([^ ]+)$$', '\\2, \\1') AS last_first,
           |  ${authorMatchSql("a1", "a2")} AS matched
           |FROM t""".stripMargin
      }
    ),
    Q(
      "coord_decimal",
      (s, d) => {
        val k = col("p_partkey")
        val d3 = lpad((k % 179).cast("string"), 3, "0")
        val mm = lpad((k % 60).cast("string"), 2, "0")
        val ss = lpad((k % 59).cast("string"), 2, "0")
        val input = when(k % 4 === 0, concat(lit("N"), d3, mm, ss))
          .when(k % 4 === 1, concat(lit("W"), d3, lit("."), lpad((k % 1000).cast("string"), 3, "0")))
          .when(k % 4 === 2, concat(lit("E"), d3, mm, lit(".5")))
          .otherwise(concat(lit("-"), (k % 89).cast("string"), lit(".25")))
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("coord"),
            coordinateToDecimal(input).as("decimal_deg")
          )
      },
      Some {
        val p1 = "^([eEwWnNsS])(\\d{3})(\\d{2})((\\d{2})(\\.(\\d{3}))?)"
        val p2 = "^([eEwWnNsS+-])?(\\d{3}\\.\\d+)"
        val p3 = "^([eEwWnNsS])?(\\d{3})(\\d{2}\\.\\d+)"
        val p4 = "^([eEwWnNsS+-])?(\\d+\\.\\d+)"
        val p5 = "^([eEwWnNsS])(\\d+)(\\d{2})((\\d{2})(\\.(\\d{3}))?)$"
        def neg(h: String) = s"$h in ('w','W','s','S','-')"
        s"""WITH t AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 4 = 0 THEN 'N' || lpad(cast(p_partkey % 179 as varchar),3,'0') || lpad(cast(p_partkey % 60 as varchar),2,'0') || lpad(cast(p_partkey % 59 as varchar),2,'0')
           |        WHEN p_partkey % 4 = 1 THEN 'W' || lpad(cast(p_partkey % 179 as varchar),3,'0') || '.' || lpad(cast(p_partkey % 1000 as varchar),3,'0')
           |        WHEN p_partkey % 4 = 2 THEN 'E' || lpad(cast(p_partkey % 179 as varchar),3,'0') || lpad(cast(p_partkey % 60 as varchar),2,'0') || '.5'
           |        ELSE '-' || cast(p_partkey % 89 as varchar) || '.25' END) AS coord FROM part)
           |SELECT p_partkey, coord,
           |  (CASE WHEN coord = '' THEN 'NaN'::double
           |   WHEN regexp_matches(coord, '$p1') THEN (CASE WHEN ${neg(s"regexp_extract(coord, '$p1', 1)")} THEN -1 ELSE 1 END) * (cast(regexp_extract(coord, '$p1', 2) as double) + cast(regexp_extract(coord, '$p1', 3) as double)/60 + cast(regexp_extract(coord, '$p1', 4) as double)/3600)
           |   WHEN regexp_matches(coord, '$p2') THEN (CASE WHEN ${neg(s"regexp_extract(coord, '$p2', 1)")} THEN -1 ELSE 1 END) * cast(regexp_extract(coord, '$p2', 2) as double)
           |   WHEN regexp_matches(coord, '$p3') THEN (CASE WHEN ${neg(s"regexp_extract(coord, '$p3', 1)")} THEN -1 ELSE 1 END) * (cast(regexp_extract(coord, '$p3', 2) as double) + cast(regexp_extract(coord, '$p3', 3) as double)/60)
           |   WHEN regexp_matches(coord, '$p4') THEN (CASE WHEN ${neg(s"regexp_extract(coord, '$p4', 1)")} THEN -1 ELSE 1 END) * cast(regexp_extract(coord, '$p4', 2) as double)
           |   WHEN regexp_matches(coord, '$p5') THEN (CASE WHEN ${neg(s"regexp_extract(coord, '$p5', 1)")} THEN -1 ELSE 1 END) * (cast(regexp_extract(coord, '$p5', 2) as double) + cast(regexp_extract(coord, '$p5', 3) as double)/60 + cast(regexp_extract(coord, '$p5', 4) as double)/3600)
           |   ELSE coalesce(cast(nullif(regexp_extract(coord, '^[-+]?\\d+(\\.\\d+)?', 0), '') as double), 0.0) END) AS decimal_deg
           |FROM t""".stripMargin
      }
    ),
    Q(
      "geo_envelope",
      (s, d) => {
        val k = col("p_partkey")
        val w = (k % 360 - 180).cast("string")
        val e = (k % 360 - 179).cast("string")
        val n = (k % 180 - 90).cast("string")
        val sc = (k % 180 - 89).cast("string")
        val input =
          concat(lit("ENVELOPE("), w, lit(".5, "), e, lit(".5, "), n, lit(".5, "), sc, lit(".5)"))
        Tables
          .part(s, d)
          .select(
            col("p_partkey"),
            input.as("wkt"),
            envelopeCenterLon(input).as("center_lon"),
            envelopeCenterLat(input).as("center_lat"),
            geoDisplayField(input).as("geo_display")
          )
      },
      Some {
        val re =
          "ENVELOPE\\s*\\((-?[\\d.]+),\\s*(-?[\\d.]+),\\s*(-?[\\d.]+),\\s*(-?[\\d.]+)\\)"
        def g(i: Int) = s"regexp_extract(wkt, '(?i)$re', $i)"
        s"""WITH t AS (SELECT p_partkey,
           |  'ENVELOPE(' || cast(p_partkey % 360 - 180 as varchar) || '.5, ' || cast(p_partkey % 360 - 179 as varchar) || '.5, ' || cast(p_partkey % 180 - 90 as varchar) || '.5, ' || cast(p_partkey % 180 - 89 as varchar) || '.5)' AS wkt
           |  FROM part)
           |SELECT p_partkey, wkt,
           |  (cast(${g(1)} as double) + cast(${g(2)} as double)) / 2 AS center_lon,
           |  (cast(${g(3)} as double) + cast(${g(4)} as double)) / 2 AS center_lat,
           |  ${g(1)} || ' ' || ${g(2)} || ' ' || ${g(3)} || ' ' || ${g(4)} AS geo_display
           |FROM t""".stripMargin
      }
    ),
    Q(
      "relator_norm",
      (s, d) => {
        val input = concat(lit(" "), col("event_type"), lit(",!"))
        Tables
          .events(s, d)
          .select(
            col("event_id"),
            input.as("raw_relator"),
            normalizeRelator(input).as("relator")
          )
      },
      Some(
        """SELECT event_id, ' ' || event_type || ',!' AS raw_relator,
          |  lower(regexp_replace(trim(' ' || event_type || ',!'), '\p{P}+', '', 'g')) AS relator
          |FROM events""".stripMargin
      )
    ),
    Q(
      "id_sort_key",
      (s, d) => {
        val id1 = concat(lit("cust"), col("c_custkey").cast("string"))
        Tables
          .customer(s, d)
          .select(
            col("c_custkey"),
            createIdSortKey(id1).as("sort_key_plain"),
            createIdSortKey(col("c_name")).as("sort_key_name"),
            sourceFromId(concat(col("c_mktsegment"), lit("."), col("c_custkey").cast("string")))
              .as("source_id")
          )
      },
      Some {
        def idSort(x: String) =
          s"(case when regexp_matches($x, '^\\w*\\d+$$') then regexp_extract($x, '^\\w*(\\d+)$$', 1) else $x end)"
        s"""SELECT c_custkey,
           |  ${idSort("('cust' || cast(c_custkey as varchar))")} AS sort_key_plain,
           |  ${idSort("c_name")} AS sort_key_name,
           |  string_split(c_mktsegment || '.' || cast(c_custkey as varchar), '.')[1] AS source_id
           |FROM customer""".stripMargin
      }
    ),
    Q(
      "validate_date",
      (s, d) => {
        val ds = date_format(col("o_orderdate"), "yyyy-MM-dd")
        val input = when(col("o_orderkey") % 3 === 0, ds)
          .when(
            col("o_orderkey") % 3 === 1,
            concat(substring(ds, 1, 5), lit("13"), substring(ds, 8, 3))
          )
          .otherwise(concat(substring(ds, 1, 8), lit("31")))
        Tables
          .orders(s, d)
          .select(
            col("o_orderkey"),
            input.as("date_str"),
            validateDate(input).as("valid_date")
          )
      },
      Some(
        """WITH t AS (SELECT o_orderkey,
          |  (CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
          |        WHEN o_orderkey % 3 = 1 THEN substr(strftime(o_orderdate, '%Y-%m-%d'),1,5) || '13' || substr(strftime(o_orderdate, '%Y-%m-%d'),8,3)
          |        ELSE substr(strftime(o_orderdate, '%Y-%m-%d'),1,8) || '31' END) AS date_str
          |  FROM orders)
          |SELECT o_orderkey, date_str,
          |  (CASE WHEN regexp_matches(date_str, '^\d{4}-\d{2}-\d{2}$')
          |         AND try_cast(date_str AS date) IS NOT NULL
          |         AND strftime(try_cast(date_str AS date), '%Y-%m-%d') = date_str
          |        THEN try_cast(date_str AS date) END) AS valid_date
          |FROM t""".stripMargin
      )
    ),
    Q(
      "format_ts",
      (s, d) =>
        Tables
          .events(s, d)
          .select(
            col("event_id"),
            formatTimestamp(col("ts")).as("iso_ts"),
            ucFirst(col("event_type")).as("type_uc"),
            normalizeLanguageString(concat(lit("  "), upper(col("event_type")), lit(" ")))
              .as("lang_norm")
          ),
      Some(
        """SELECT event_id,
          |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
          |  upper(substr(event_type,1,1)) || substr(event_type,2) AS type_uc,
          |  lower(trim('  ' || upper(event_type) || ' ')) AS lang_norm
          |FROM events""".stripMargin
      )
    )
  )
}
