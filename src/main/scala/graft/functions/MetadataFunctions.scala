package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metadata-record normalization library.
  *
  * Spark-native re-expression of the normalization semantics of
  * RecordManager's `Utils/MetadataUtils.php` (reference:
  * src/RecordManager/Base/Utils/MetadataUtils.php). Every function here is a
  * pure `Column` expression built from `org.apache.spark.sql.functions` —
  * whole-stage-codegen friendly, no UDFs — so Catalyst can push, prune and
  * fold around them. All are deterministic and distributable (no driver
  * state), which is what lets the same expressions run over 100 TB.
  */
object MetadataFunctions {

  /** Characters removed by key normalization: ASCII control chars, space and
    * all ASCII punctuation (reference: MetadataUtils.php:416 `normalizeKey`,
    * regex `[\x00-\x20\x21-\x2F\x3A-\x40,\x5B-\x60,\x7B-\x7F]`; the ranges
    * 00-20 and 21-2F are contiguous).
    */
  private val KeyStripRe = "[\\x00-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7f]"

  /** Lowercased comparison key: strip ASCII punctuation/space/control chars,
    * trim, lowercase. Reference: MetadataUtils.php:416.
    */
  def normalizeKey(c: Column): Column =
    lower(trim(regexp_replace(c, KeyStripRe, "")))

  /** The reference's default normalization folding table
    * (MetadataUtils.php:138-152): Latin-1/Latin-2 letters folded to ASCII
    * before key comparison, so e.g. Scandinavian title variants produce
    * identical dedup keys. Deployments drop entries via
    * `folding_ignore_characters` (:236) — model that by filtering this
    * seq before passing it to the folded variants.
    */
  val DefaultFoldingTable: Seq[(Char, String)] = Seq(
    'Š' -> "S", 'š' -> "s", 'Ž' -> "Z", 'ž' -> "z", 'À' -> "A",
    'Á' -> "A", 'Â' -> "A", 'Ã' -> "A", 'Ä' -> "A", 'Å' -> "A",
    'Æ' -> "A", 'Ç' -> "C", 'È' -> "E", 'É' -> "E", 'Ê' -> "E",
    'Ë' -> "E", 'Ì' -> "I", 'Í' -> "I", 'Î' -> "I", 'Ï' -> "I",
    'Ñ' -> "N", 'Ò' -> "O", 'Ó' -> "O", 'Ô' -> "O", 'Õ' -> "O",
    'Ö' -> "O", 'Ø' -> "O", 'Ù' -> "U", 'Ú' -> "U", 'Û' -> "U",
    'Ü' -> "U", 'Ý' -> "Y", 'Þ' -> "B", 'ß' -> "Ss", 'à' -> "a",
    'á' -> "a", 'â' -> "a", 'ã' -> "a", 'ä' -> "a", 'å' -> "a",
    'æ' -> "a", 'ç' -> "c", 'è' -> "e", 'é' -> "e", 'ê' -> "e",
    'ë' -> "e", 'ì' -> "i", 'í' -> "i", 'î' -> "i", 'ï' -> "i",
    'ð' -> "o", 'ñ' -> "n", 'ò' -> "o", 'ó' -> "o", 'ô' -> "o",
    'õ' -> "o", 'ö' -> "o", 'ø' -> "o", 'ù' -> "u", 'ú' -> "u",
    'û' -> "u", 'ü' -> "u", 'ý' -> "y", 'þ' -> "b", 'ÿ' -> "y"
  )

  /** Apply a character folding table (strtr semantics for single-char
    * keys, MetadataUtils.php:423). The 1→1 entries compile to ONE
    * `translate` pass; 1→many entries (only 'ß' → "Ss" in the default
    * table) chain `replace` calls. Key and replacement domains are
    * disjoint (non-ASCII → ASCII), so sequential application equals
    * strtr's simultaneous substitution.
    */
  def foldChars(c: Column, table: Seq[(Char, String)]): Column = {
    val (single, multi) = table.partition(_._2.length == 1)
    val translated =
      if (single.isEmpty) c
      else translate(c, single.map(_._1).mkString, single.map(_._2).mkString)
    multi.foldLeft(translated) { case (acc, (from, to)) =>
      replace(acc, lit(from.toString), lit(to))
    }
  }

  /** Folding-table key normalization (the reference's configured-fold
    * path: strtr THEN strip/lowercase). Matches
    * `NormalizeKeyExpr(child, folding)` bit for bit (spec-asserted).
    */
  def normalizeKey(c: Column, folding: Seq[(Char, String)]): Column =
    normalizeKey(foldChars(c, folding))

  /** The reference's DEFAULT `key_folding_rules` ICU pipeline
    * (MetadataUtils.php:159, used by normalizeKey:419 whenever intl is
    * present): NFD → lower → drop non-letter/number → NFKC, exact for
    * Latin-script input. See [[graft.plans.KeyFoldRulesExpr]] for the
    * one documented divergence (no romanization of non-Latin scripts).
    */
  def normalizeKeyRules(c: Column): Column = normalizeKeyRules(c, romanize = false)

  /** [[normalizeKeyRules]] with the flag-gated embedded Cyrillic/Greek
    * romanization (the `:: Latin;` stage of MetadataUtils.php:159,
    * approximated — see [[graft.plans.KeyFoldRulesExpr]] for the table
    * and the documented deviations from full ICU).
    */
  def normalizeKeyRules(c: Column, romanize: Boolean): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.plans.KeyFoldRulesExpr(org.apache.spark.sql.GraftColumn.exprOf(c), romanize)
    )

  /** Evaluate `c` once and reference it cheaply in `f` via a lambda
    * variable (1-element-array transform). Column-expression trees have no
    * let-binding: a combinator like [[stripTrailingPunctuation]] that
    * mentions its input ~300× multiplies the input's whole subtree into
    * the plan, which serializes tens of MiB when the input is itself a
    * large expression. Binding keeps the tree linear. Use at call sites
    * already inside higher-order-function lambdas (where codegen doesn't
    * apply anyway) or where the input tree is demonstrably large.
    */
  def bindOnce(c: Column)(f: Column => Column): Column =
    get(transform(array(c), f), lit(0))

  /** Dedup title key: concatenate leading words until more than 3 "long"
    * (>3 char) words or more than 35 significant chars have been taken, cap
    * at 200 chars, then normalize. Reference: MetadataUtils.php:369
    * `createTitleKey`. A word is included iff the running totals over the
    * words before it are still within bounds (the PHP loop breaks after the
    * word that exceeds them, so that word is still included).
    */
  def createTitleKey(c: Column): Column =
    normalizeKey(createTitleKeyRaw(c))

  /** Folding-table title key: budgets count pre-fold characters (the
    * reference folds inside the final normalizeKey call only —
    * MetadataUtils.php:405).
    */
  def createTitleKey(c: Column, folding: Seq[(Char, String)]): Column =
    bindOnce(createTitleKeyRaw(c))(k => normalizeKey(k, folding))

  /** The word-budget walk + 200 cap WITHOUT normalization — shared by
    * the plain and folded title keys.
    */
  private def createTitleKeyRaw(c: Column): Column = {
    val ws = split(c, " ")
    val zero = struct(
      lit("").as("key"),
      lit(0).as("klen"),
      lit(0).as("lw"),
      lit(false).as("stop")
    )
    val folded = aggregate(
      ws,
      zero,
      (acc, w) => {
        val nKey = concat(acc.getField("key"), w)
        val nLen = acc.getField("klen") + length(w)
        val nLw = acc.getField("lw") + when(length(w) > 3, 1).otherwise(0)
        when(acc.getField("stop"), acc).otherwise(
          struct(
            nKey.as("key"),
            nLen.as("klen"),
            nLw.as("lw"),
            (nLw > 3 || nLen > 35).as("stop")
          )
        )
      },
      acc => acc.getField("key")
    )
    substring(folded, 1, 200)
  }

  private def dig(d: Column, pos: Int): Column =
    substring(d, pos, 1).cast("int")

  /** ISBN-10 check character (reference: MetadataUtils.php:1291). Public
    * so test corpora can synthesize valid ISBNs from the same formula.
    */
  def isbn10CheckChar(d: Column): Column = {
    val s = (1 to 9).map(p => dig(d, p) * lit(11 - p)).reduce(_ + _)
    val rem = (lit(11) - (s % 11)) % 11
    when(rem === 10, lit("X")).otherwise(rem.cast("string"))
  }

  /** ISBN-13 check digit computed from the first 9 digits of an ISBN-10
    * (reference: MetadataUtils.php:1311).
    */
  private def isbn13CheckDigit(d: Column): Column = {
    val s = lit(38) +
      lit(3) * (dig(d, 1) + dig(d, 3) + dig(d, 5) + dig(d, 7) + dig(d, 9)) +
      (dig(d, 2) + dig(d, 4) + dig(d, 6) + dig(d, 8))
    ((lit(10) - (s % 10)) % 10).cast("string")
  }

  /** ISBN-10 → ISBN-13 with checksum validation; empty string when the
    * 10-digit checksum is invalid. Reference: MetadataUtils.php:270.
    */
  def isbn10to13(d: Column): Column =
    when(
      d.rlike("^[0-9]{9}[0-9xX]$") &&
        upper(substring(d, 10, 1)) === isbn10CheckChar(d),
      concat(lit("978"), substring(d, 1, 9), isbn13CheckDigit(d))
    ).otherwise(lit(""))

  /** Normalize an ISBN to dashless ISBN-13 (or "" when unrecognizable).
    * Reference: MetadataUtils.php:442 `normalizeISBN`.
    */
  def normalizeIsbn(c: Column): Column = {
    val cleaned = regexp_replace(c, "-", "")
    val m = regexp_extract(cleaned, "([0-9]{9,12}[0-9xX])", 1)
    when(m === "", lit(""))
      .when(length(m) === 10, isbn10to13(m))
      .otherwise(m)
  }

  /** First 4-digit (optionally negative) year in a string, else "".
    * Reference: MetadataUtils.php:865 `extractYear`.
    */
  def extractYear(c: Column): Column = regexp_extract(c, "(-?\\d{4})", 1)

  /** ISSN mod-11 check character over the first 7 digits. Public so test
    * corpora synthesize valid ISSNs from the same formula.
    */
  def issnCheckChar(d: Column): Column = {
    val sum = (1 to 7)
      .map(p => substring(d, p, 1).cast("int") * lit(9 - p))
      .reduce(_ + _)
    val rem = (lit(11) - (sum % 11)) % 11
    when(rem === 10, lit("X")).otherwise(rem.cast("string"))
  }

  /** Normalize an ISSN to `NNNN-NNNC` with checksum validation ("" when
    * invalid). ISSNs surface in the reference's record extraction
    * (Record/Marc.php getISSNs); note matchRecords compares series ISSNs
    * by raw equality, so this normalizer is an extraction-time operator,
    * not part of the match predicate.
    */
  def normalizeIssn(c: Column): Column = {
    val cleaned = upper(regexp_replace(c, "[- ]", ""))
    when(
      cleaned.rlike("^[0-9]{7}[0-9X]$") &&
        substring(cleaned, 8, 1) === issnCheckChar(cleaned),
      concat(substring(cleaned, 1, 4), lit("-"), substring(cleaned, 5, 4))
    ).otherwise(lit(""))
  }

  /** Default leading-article list (reference ships these in
    * conf/articles.lst; the list is configuration, so this library takes a
    * parameter with the same defaults).
    */
  val DefaultArticles: Seq[String] =
    Seq("the ", "an ", "a ", "el ", "le ", "l'", "d'")

  /** Lowercase and strip the first matching leading article.
    * Reference: MetadataUtils.php:678 `stripLeadingArticle`.
    */
  def stripLeadingArticle(
      c: Column,
      articles: Seq[String] = DefaultArticles
  ): Column =
    // The article chain references the lowered input ~3x per article;
    // binding it keeps the tree additive in |c| instead of ~22x |c| —
    // load-bearing for the full-assembly plans (createSortTitle squares
    // this factor without the bind).
    bindOnce(lower(c)) { lowered =>
      val chain = articles.foldLeft(when(lit(false), lowered)) { (acc, art) =>
        acc.when(
          substring(lowered, 1, art.length) === art,
          lowered.substr(lit(art.length + 1), length(lowered))
        )
      }
      chain.otherwise(lowered)
    }

  /** Strip trailing spaces/punctuation with the reference's special cases:
    * keep a period after an initial/abbreviation-like token, drop a trailing
    * ". -", drop an unbalanced trailing paren/bracket.
    * Reference: MetadataUtils.php:572 `stripTrailingPunctuation` (with
    * `additional=""` and an empty abbreviation list; the numeric check is a
    * digits-only test rather than PHP's `is_numeric`).
    */
  def stripTrailingPunctuation(c: Column): Column =
    // Each stage references its predecessor several times; unbound, the
    // chain multiplies to ~200 references of the input (9 x 3 x 7). The
    // per-stage binds keep the tree ~70 nodes + |c| — the difference
    // between a shippable full-assembly plan and a multi-MiB one.
    bindOnce(rtrim(c, " /:;,=([")) { s1 =>
      // PHP substr($str,-3,1) clamps the start to 0 for short strings.
      val thirdFromEnd =
        when(length(s1) >= 3, substring(s1, -3, 1))
          .otherwise(substring(s1, 1, 1))
      val lastWord = regexp_extract(s1, "([^ ]*)\\.$", 1)
      // PHP is_numeric (MetadataUtils.php:609): decimals and exponents also
      // keep their trailing period ("909.4." stays intact — the reference's
      // own marc_dewey fixture pins this). Configured abbreviation lists
      // (Site/abbreviations) are deployment config, not modeled here.
      val numericRe = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?$"
      val dropPeriod = s1.endsWith(".") && thirdFromEnd =!= " " &&
        !lastWord.rlike(numericRe)
      bindOnce(when(dropPeriod, s1.substr(lit(1), length(s1) - 1)).otherwise(s1)) { s2 =>
        bindOnce(
          when(s2.endsWith(". -"), s2.substr(lit(1), length(s2) - 3)).otherwise(s2)
        ) { s3 =>
          when(
            s3.endsWith(")") && !s3.contains("("),
            s3.substr(lit(1), length(s3) - 1)
          ).when(
            s3.endsWith("]") && !s3.contains("["),
            s3.substr(lit(1), length(s3) - 1)
          ).otherwise(s3)
        }
      }
    }

  /** Strip leading spaces/punctuation; a punctuation-only string is
    * preserved (the reference's `preservePunctuationOnly` defaults to true
    * here, unlike the trailing variant). Reference: MetadataUtils.php:645
    * `stripLeadingPunctuation`, default character set.
    */
  def stripLeadingPunctuation(c: Column): Column = {
    // PHP default: " \t\#*!¡?/:;.,=(['\"´`” ̈" (the last entry is a space +
    // combining diaeresis). \x{0308} spells the combining char portably in
    // both Java and RE2 regex syntax.
    val r = regexp_replace(c, "^[ \\t#*!¡?/:;.,=(\\['\"´`”\\x{0308}]*", "")
    when(r === "", c).otherwise(r)
  }

  /** Strict ISO 8601 UTC timestamp validation (reference:
    * MetadataUtils.php:785 `validateISO8601Date` — anchored pattern plus
    * field range checks; returns a boolean here where PHP returns
    * timestamp-or-false).
    */
  def validateIso8601Date(c: Column): Column = {
    val re = "^(-?\\d{4})-(\\d{2})-(\\d{2})T(\\d{2}):(\\d{2}):(\\d{2})Z$"
    def part(i: Int): Column = regexp_extract(c, re, i).cast("int")
    // The range checks live inside a CASE branch: under ANSI mode the
    // casts must not run on non-matching input (regexp_extract yields '').
    when(
      c.rlike(re),
      part(2).between(1, 12) && part(3).between(1, 31) &&
        part(4).between(0, 23) && part(5).between(0, 59) && part(6).between(0, 59)
    ).otherwise(lit(false))
  }

  /** Trim every element of a string array (reference: MetadataUtils.php:926
    * `arrayTrim`, default PHP whitespace set — note Spark's bare `trim`
    * strips only spaces, so the set is explicit).
    */
  def arrayTrim(c: Column): Column =
    transform(c, x => trim(x, " \t\n\r\u0000\u000b"))

  /** Unicode-normalize via the native Catalyst expression
    * ([[graft.plans.NormalizeUnicodeExpr]]); form is NFC/NFD/NFKC/NFKD,
    * defaulting to NFC like the reference (MetadataUtils.php:902).
    */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.plans.NormalizeUnicodeExpr(
        org.apache.spark.sql.GraftColumn.exprOf(c),
        form
      )
    )

  /** stripTrailingPunctuation with `preservePunctuationOnly=true`: when the
    * strip leaves nothing (the string was punctuation-only), keep the
    * original. Reference: MetadataUtils.php:572 (third parameter, used by
    * e.g. Record/Doaj.php getTitle).
    */
  def stripTrailingPunctuationPreserve(c: Column): Column = {
    val stripped = stripTrailingPunctuation(c)
    when(stripped === "", c).otherwise(stripped)
  }

  /** [[stripTrailingPunctuation]] behind a [[bindOnce]] let-binding: the
    * strip formula references its input ~100× through its staged
    * sub-expressions, so applying it directly to a large tree multiplies
    * that tree into the plan. Use at call sites whose input is not
    * already a cheap attribute/lambda variable.
    */
  def stripTrailingPunctuationBound(c: Column): Column =
    bindOnce(c)(stripTrailingPunctuation)

  /** Bound form of [[stripTrailingPunctuationPreserve]] (same reason). */
  def stripTrailingPunctuationPreserveBound(c: Column): Column =
    bindOnce(c) { cb =>
      bindOnce(stripTrailingPunctuation(cb)) { sb =>
        when(sb === "", cb).otherwise(sb)
      }
    }

  /** Replace punctuation runs with a single space; if the result is empty,
    * return the original. Reference: MetadataUtils.php:535 `stripPunctuation`
    * (default pattern `[\t\p{P}=´`” ̈]+`, which includes the space).
    */
  def stripPunctuation(c: Column): Column =
    bindOnce(c) { cb =>
      bindOnce(trim(regexp_replace(cb, "[\\t\\p{P}=´`” ̈]+", " "))) { r =>
        when(r === "", cb).otherwise(r)
      }
    }

  /** Sort title: strip article, strip punctuation, re-strip article if the
    * first character changed, lowercase. Reference: MetadataUtils.php:698.
    */
  def createSortTitle(c: Column): Column =
    bindOnce(stripLeadingArticle(c)) { t1 =>
      val start = substring(t1, 1, 1)
      bindOnce(stripPunctuation(t1)) { t2 =>
        val t3 = when(substring(t2, 1, 1) =!= start, stripLeadingArticle(t2))
          .otherwise(t2)
        lower(t3)
      }
    }

  /** Fuzzy author comparison: exact match; both >= 6 chars; full prefix
    * match; or word-by-word where the first word must match exactly and
    * later words at least on the initial. Reference: MetadataUtils.php:464.
    */
  def authorMatch(a1: Column, a2: Column): Column = {
    val l1 = length(a1)
    val l2 = length(a2)
    val minLen = least(l1, l2)
    val prefixEq = a1.substr(lit(1), minLen) === a2.substr(lit(1), minLen)
    val w1 = split(a1, " ")
    val w2 = split(a2, " ")
    val n = least(size(w1), size(w2))
    val wordsOk = forall(
      transform(
        sequence(lit(0), n - 1),
        i => {
          val x = element_at(w1, i + 1)
          val y = element_at(w2, i + 1)
          (x === y) ||
          (i > 0 && substring(x, 1, 1) === substring(y, 1, 1))
        }
      ),
      b => b
    )
    when(a1 === a2, lit(true))
      .when(l1 < 6 || l2 < 6, lit(false))
      .when(prefixEq, lit(true))
      .otherwise(wordsOk)
  }

  /** Coordinate string → decimal degrees. Supports the reference's DMS and
    * decimal formats. Reference: MetadataUtils.php:299 `coordinateToDecimal`.
    */
  def coordinateToDecimal(c: Column): Column = {
    val v = regexp_replace(c, " ", "")
    val neg = (h: Column) => h.isin("w", "W", "s", "S", "-")
    def sgn(h: Column, x: Column): Column = when(neg(h), -x).otherwise(x)
    val p1 = "^([eEwWnNsS])(\\d{3})(\\d{2})((\\d{2})(\\.(\\d{3}))?)"
    val p2 = "^([eEwWnNsS+-])?(\\d{3}\\.\\d+)"
    val p3 = "^([eEwWnNsS])?(\\d{3})(\\d{2}\\.\\d+)"
    val p4 = "^([eEwWnNsS+-])?(\\d+\\.\\d+)"
    val p5 = "^([eEwWnNsS])(\\d+)(\\d{2})((\\d{2})(\\.(\\d{3}))?)$"
    def g(p: String, i: Int): Column = regexp_extract(v, p, i)
    def dms(p: String): Column =
      g(p, 2).cast("double") + g(p, 3).cast("double") / 60 +
        g(p, 4).cast("double") / 3600
    when(v === "", lit(Double.NaN))
      .when(v.rlike(p1), sgn(g(p1, 1), dms(p1)))
      .when(v.rlike(p2), sgn(g(p2, 1), g(p2, 2).cast("double")))
      .when(
        v.rlike(p3),
        sgn(g(p3, 1), g(p3, 2).cast("double") + g(p3, 3).cast("double") / 60)
      )
      .when(v.rlike(p4), sgn(g(p4, 1), g(p4, 2).cast("double")))
      .when(v.rlike(p5), sgn(g(p5, 1), dms(p5)))
      // PHP (float)$value: numeric prefix or 0.0.
      .otherwise(
        coalesce(
          regexp_extract(v, "^[-+]?\\d+(\\.\\d+)?", 0).cast("double"),
          lit(0.0)
        )
      )
  }

  private val EnvelopeRe =
    "(?i)ENVELOPE\\s*\\((-?[\\d.]+),\\s*(-?[\\d.]+),\\s*(-?[\\d.]+),\\s*(-?[\\d.]+)\\)"

  /** Center longitude of an `ENVELOPE(w, e, n, s)` WKT string (reference:
    * MetadataUtils.php:987 `getCenterCoordinates`; non-envelope shapes are
    * out of scope — the reference delegates those to geoPHP).
    */
  def envelopeCenterLon(c: Column): Column =
    (regexp_extract(c, EnvelopeRe, 1).cast("double") +
      regexp_extract(c, EnvelopeRe, 2).cast("double")) / 2

  /** Center latitude of an `ENVELOPE(...)` WKT string. */
  def envelopeCenterLat(c: Column): Column =
    (regexp_extract(c, EnvelopeRe, 3).cast("double") +
      regexp_extract(c, EnvelopeRe, 4).cast("double")) / 2

  /** Display form of an `ENVELOPE(...)` WKT: the four bounds space-joined.
    * Reference: MetadataUtils.php:1021 `getGeoDisplayField`.
    */
  def geoDisplayField(c: Column): Column =
    concat_ws(
      " ",
      regexp_extract(c, EnvelopeRe, 1),
      regexp_extract(c, EnvelopeRe, 2),
      regexp_extract(c, EnvelopeRe, 3),
      regexp_extract(c, EnvelopeRe, 4)
    )

  /** Relator/role normalization: trim, drop punctuation, lowercase.
    * Reference: MetadataUtils.php:1078 `normalizeRelator`.
    */
  def normalizeRelator(c: Column): Column =
    lower(regexp_replace(trim(c), "\\p{P}+", ""))

  /** Trim + optionally lowercase a language string (the reference lowercases
    * when `lowercaseLanguageStrings` is set, the default).
    * Reference: MetadataUtils.php:1056.
    */
  def normalizeLanguageString(c: Column): Column = lower(trim(c))

  /** "First Last" → "Last, First" (split on the last space).
    * Reference: MetadataUtils.php:1165 `convertAuthorLastFirst`.
    */
  def convertAuthorLastFirst(c: Column): Column =
    regexp_replace(c, "^(.*) ([^ ]+)$", "$2, $1")

  /** Sort key for a record id: the trailing digit run when the id is purely
    * word characters ending in digits, else the id itself.
    * Reference: MetadataUtils.php:742 `createIdSortKey`. (Note the PHP
    * pattern's greedy `\w*` makes the captured run a single digit in
    * practice; Java and RE2 agree on this leftmost-first behavior.)
    */
  def createIdSortKey(c: Column): Column =
    when(c.rlike("^\\w*\\d+$"), regexp_extract(c, "^\\w*(\\d+)$", 1))
      .otherwise(c)

  /** Record-id prefix before the first '.' (reference:
    * MetadataUtils.php:1093 `getSourceFromId`).
    */
  def sourceFromId(c: Column): Column = element_at(split(c, "\\."), 1)

  /** Validated `yyyy-MM-dd` date or null (reference:
    * MetadataUtils.php:757 `validateDate` — regex gate plus a strict parse
    * that rejects impossible dates like 2021-02-30).
    */
  def validateDate(c: Column): Column = {
    // try_to_timestamp (not to_date) so invalid dates yield null under ANSI.
    val parsed = try_to_timestamp(c, lit("yyyy-MM-dd")).cast("date")
    when(
      c.rlike("^\\d{4}-\\d{2}-\\d{2}$") && parsed.isNotNull &&
        date_format(parsed, "yyyy-MM-dd") === c,
      parsed
    ).otherwise(lit(null).cast("date"))
  }

  /** ISO-8601 `...T...Z` rendering of a timestamp (reference:
    * MetadataUtils.php:851 `formatTimestamp`).
    */
  def formatTimestamp(c: Column): Column =
    date_format(c, "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Uppercase the first character only (reference: MetadataUtils.php:881). */
  def ucFirst(c: Column): Column =
    concat(upper(substring(c, 1, 1)), c.substr(lit(2), length(c)))

  /** Remove CR/LF/TAB (reference: MetadataUtils.php:975
    * `stripControlCharacters`).
    */
  def stripControlCharacters(c: Column): Column =
    regexp_replace(c, "[\\r\\n\\t]", "")

  /** Trim whitespace between XML tags but not inside text nodes (reference:
    * MetadataUtils.php:818 `trimXMLWhitespace`). Uses a backreference, which
    * Java regex supports; not ANSI-SQL-expressible, so validated in tests.
    */
  def trimXmlWhitespace(c: Column): Column =
    regexp_replace(c, "\\s*(<([^>]*)>[^<]*</\\2>|<[^>]*>)\\s*", "$1")

  /** Join words hyphenated across line breaks in extracted full text
    * (reference: Record/FullTextTrait.php:124 — `([^\s]+)-\s*[\n\r]+\s*`
    * → `\1`; imperfect by design, the reference notes 'Etelä-Suomi' →
    * 'EteläSuomi' when the compound happens to break at the hyphen).
    */
  def dehyphenateFullText(c: Column): Column =
    regexp_replace(c, "(\\S+)-\\s*[\\n\\r]+\\s*", "$1")

  /** LIDO display-date range parsing (reference: Record/Lido.php:1029
    * parseDateRange): "yyyy - yyyy", ISO y-m-d, d.m.y, "yy ?" (± 3 years)
    * and bare-year forms → "start,end" ISO instant pair, null otherwise.
    * Two-digit years are filled into the 1900s (end takes the start's
    * century); dates beyond `yearNow` return null (the reference compares
    * against the wall clock — pinned here because a distributed operator
    * must be deterministic; note the reference's string compare makes the
    * veto inclusive for the day-precision branches and exclusive for the
    * year-precision ones, reproduced faithfully).
    */
  def lidoDateRange(c: Column, yearNow: Int = 2026): Column = {
    val in = lower(trim(c))
    def ex(re: String, i: Int) = regexp_extract(in, re, i)
    val r1 = "(\\d\\d\\d\\d) ?- (\\d\\d\\d\\d)"
    val r2 = "(\\d\\d\\d\\d)-(\\d\\d?)-(\\d\\d?)"
    val r3 = "(\\d\\d?)\\s*.\\s*(\\d\\d?)\\s*.\\s*(\\d\\d\\d\\d)"
    val r4 = "(\\d?\\d?\\d\\d) ?\\?"
    val r5 = "(\\d?\\d?\\d\\d)"
    def fill2(y: Column) =
      when(length(y) === 2, (lit(1900) + y.cast("int")).cast("string")).otherwise(y)
    def centuryFill(start: Column, end: Column) =
      when(
        length(end) === 2,
        (concat(substring(start, 1, 2), lit("00")).cast("int") + end.cast("int"))
          .cast("string")
      ).otherwise(end)
    // Year-precision branches: expand to full-year instants; veto strictly
    // beyond yearNow (integer compare in the reference).
    def processed(s0: Column, e0: Column): Column = {
      val s = fill2(s0)
      val e = centuryFill(s, e0)
      when(
        s.cast("int") > yearNow || e.cast("int") > yearNow,
        lit(null).cast("string")
      ).otherwise(
        concat(s, lit("-01-01T00:00:00Z,"), e, lit("-12-31T23:59:59Z"))
      )
    }
    // Day-precision branches: the reference's string compare against the
    // current year vetoes the current year too (longer string > "yyyy").
    def dayPrecision(y: Column, m: Column, d: Column): Column = {
      val date = concat(y, lit("-"), lpad(m, 2, "0"), lit("-"), lpad(d, 2, "0"))
      when(y.cast("int") >= yearNow, lit(null).cast("string"))
        .otherwise(concat(date, lit("T00:00:00Z,"), date, lit("T23:59:59Z")))
    }
    when(ex(r1, 1) =!= "", processed(ex(r1, 1), ex(r1, 2)))
      .when(ex(r2, 1) =!= "", dayPrecision(ex(r2, 1), ex(r2, 2), ex(r2, 3)))
      .when(ex(r3, 3) =!= "", dayPrecision(ex(r3, 3), ex(r3, 2), ex(r3, 1)))
      .when(
        ex(r4, 1) =!= "",
        processed(
          (ex(r4, 1).cast("int") - 3).cast("string"),
          (ex(r4, 1).cast("int") + 3).cast("string")
        )
      )
      .when(ex(r5, 1) =!= "", processed(ex(r5, 1), ex(r5, 1)))
      .otherwise(lit(null).cast("string"))
  }
}
