package graft

import graft.functions.MetadataFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Fixture + property tests for the normalization library. Fixtures encode
  * the reference semantics (MetadataUtils.php) on hand-computed cases.
  */
class MetadataFunctionsSpec extends SparkSuite {

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("x").select(c.as("r")).collect()(0).get(0)
  }

  test("normalizeKey strips ascii punctuation/space/control and lowercases") {
    assert(eval1(normalizeKey(col("x")), "The Quick, Brown-Fox! (1999)") == "thequickbrownfox1999")
    assert(eval1(normalizeKey(col("x")), "  A.B:C;d  ") == "abcd")
  }

  test("normalizeKey is idempotent (property over generated strings)") {
    import spark.implicits._
    val gen = Gen.asciiPrintableStr
    val samples = (1L to 60L).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(24), Seed(i))
    )
    val out = samples
      .toDF("x")
      .select(
        normalizeKey(col("x")).as("once"),
        normalizeKey(normalizeKey(col("x"))).as("twice")
      )
      .collect()
    out.foreach(r => assert(r.get(0) == r.get(1), s"not idempotent: $r"))
  }

  test("folding table: column form, native form and reference fixtures agree") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumn
    import graft.plans.{NormalizeKeyExpr, TitleKeyExpr}
    val tbl = DefaultFoldingTable
    // Hand-computed against MetadataUtils.php:423 strtr + strip + lower.
    val cases = Seq(
      "Häkkinen, Mika" -> "hakkinenmika",
      "Tähtien Sota" -> "tahtiensota",
      "Straße & Co" -> "strasseco", // 'ß' -> "Ss", multi-char value
      "ÆØÅ æøå" -> "aoaaoa",
      "plain ascii!" -> "plainascii"
    )
    cases.foreach { case (in, want) =>
      assert(eval1(normalizeKey(col("x"), tbl), in) == want, in)
      assert(
        eval1(GraftColumn.of(NormalizeKeyExpr(GraftColumn.exprOf(col("x")), tbl)), in) == want,
        s"native: $in"
      )
    }
    // folding_ignore_characters semantics: a filtered table keeps the
    // ignored char unfolded (MetadataUtils.php:236-247).
    val noA = tbl.filterNot { case (k, _) => k == 'ä' || k == 'Ä' }
    assert(eval1(normalizeKey(col("x"), noA), "Häkkinen") == "häkkinen")
    // Folded title key: both forms agree on an accented title.
    val title = "Tähtien sota: jedin paluu"
    val colForm = eval1(createTitleKey(col("x"), tbl), title)
    val nativeForm =
      eval1(GraftColumn.of(TitleKeyExpr(GraftColumn.exprOf(col("x")), tbl)), title)
    assert(colForm == nativeForm && colForm == "tahtiensotajedinpaluu")
  }

  test("ICU-rules key folding: NFD mark-removal, lowercasing, NFKC; no romanization") {
    import graft.plans.KeyFoldRulesExpr.fold
    assert(fold("Tähtien Sota!") == "tahtiensota")
    assert(fold("Æ is not decomposable") == "æisnotdecomposable") // NFD keeps Æ; it is a letter
    assert(fold("café  Nr. 9") == "cafenr9")
    assert(fold("ﬁne") == "fine") // final NFKC compatibility-folds the ﬁ ligature
    // Documented divergence: non-Latin scripts lower but do not romanize
    // (the ICU ':: Latin;' stage needs ICU data).
    assert(fold("Привет 42") == "привет42")
    assert(eval1(normalizeKeyRules(col("x")), "Tähtien Sota!") == "tahtiensota")
  }

  test("createTitleKey matches the reference word-budget semantics") {
    // Stops after >3 long words or >35 chars, including the word that
    // crosses the limit (MetadataUtils.php:369).
    assert(
      eval1(
        createTitleKey(col("x")),
        "the quick brown fox jumps over a lazy dog and keeps running"
      ) == "thequickbrownfoxjumpsover"
    )
    assert(eval1(createTitleKey(col("x")), "short one") == "shortone")
    assert(eval1(createTitleKey(col("x")), "aaaa bbbb cccc dddd eeee ffff") == "aaaabbbbccccdddd")
  }

  test("isbn10to13 computes and validates checksums") {
    // 0306406152 is the canonical valid ISBN-10 (-> 9780306406157)
    assert(eval1(isbn10to13(col("x")), "0306406152") == "9780306406157")
    assert(eval1(isbn10to13(col("x")), "0306406153") == "") // bad checksum
    assert(eval1(isbn10to13(col("x")), "097522980X") == "9780975229804") // X check char
  }

  test("normalizeIsbn handles dashes, 10->13 and passthrough") {
    assert(eval1(normalizeIsbn(col("x")), "0-306-40615-2") == "9780306406157")
    assert(eval1(normalizeIsbn(col("x")), "9780306406157") == "9780306406157")
    assert(eval1(normalizeIsbn(col("x")), "no isbn here") == "")
  }

  test("normalizeIssn validates real-world checksums incl. X") {
    assert(eval1(normalizeIssn(col("x")), "0378-5955") == "0378-5955") // Hearing Research
    assert(eval1(normalizeIssn(col("x")), "03785955") == "0378-5955")
    assert(eval1(normalizeIssn(col("x")), "2434-561X") == "2434-561X") // X check char
    assert(eval1(normalizeIssn(col("x")), "0378-5954") == "") // bad checksum
    assert(eval1(normalizeIssn(col("x")), "not an issn") == "")
  }

  test("extractYear finds the first 4-digit run") {
    assert(eval1(extractYear(col("x")), "published c1987.") == "1987")
    assert(eval1(extractYear(col("x")), "no year") == "")
  }

  test("stripLeadingArticle removes the first matching article only") {
    assert(eval1(stripLeadingArticle(col("x")), "The Title") == "title")
    assert(eval1(stripLeadingArticle(col("x")), "An Apple") == "apple")
    assert(eval1(stripLeadingArticle(col("x")), "Theory") == "theory") // no 'the ' prefix
  }

  test("stripTrailingPunctuation keeps initials' periods") {
    assert(eval1(stripTrailingPunctuation(col("x")), "Smith, A.") == "Smith, A.")
    assert(eval1(stripTrailingPunctuation(col("x")), "A title.") == "A title")
    assert(eval1(stripTrailingPunctuation(col("x")), "ends. -") == "ends")
    assert(eval1(stripTrailingPunctuation(col("x")), "unbalanced)") == "unbalanced")
    assert(eval1(stripTrailingPunctuation(col("x")), "balanced (x)") == "balanced (x)")
  }

  test("authorMatch: exact, prefix, initial rules") {
    def am(a: String, b: String): Boolean =
      eval1(authorMatch(lit(a), lit(b)), "ignored").asInstanceOf[Boolean]
    assert(am("smith john", "smith john"))
    assert(!am("shor", "shot")) // both under 6 chars and not equal
    assert(am("smith john", "smith j"))   // prefix
    assert(am("smith john", "smith jane")) // initial match on 2nd word
    assert(!am("smith john", "jones john")) // first word must match
    assert(!am("ab", "ab cd efg")) // too short
  }

  test("coordinateToDecimal DMS and decimal formats") {
    val dms = eval1(coordinateToDecimal(col("x")), "N0793030").asInstanceOf[Double]
    assert(math.abs(dms - (79 + 30.0 / 60 + 30.0 / 3600)) < 1e-9)
    val dec = eval1(coordinateToDecimal(col("x")), "W123.456").asInstanceOf[Double]
    assert(math.abs(dec + 123.456) < 1e-9)
  }

  test("createIdSortKey follows the reference regex (greedy \\w*)") {
    assert(eval1(createIdSortKey(col("x")), "abc123") == "3")
    assert(eval1(createIdSortKey(col("x")), "with#hash9") == "with#hash9")
  }

  test("trimXmlWhitespace trims between tags, keeps text-node spaces") {
    assert(
      eval1(trimXmlWhitespace(col("x")), "<a> <b>keep me</b> </a>") ==
        "<a><b>keep me</b></a>"
    )
  }

  test("dehyphenateFullText joins line-broken words, keeps inline hyphens") {
    assert(
      eval1(dehyphenateFullText(col("x")), "Exam-\n  ple hyphen-ated jat-\r\n kuu loppu-") ==
        "Example hyphen-ated jatkuu loppu-"
    )
  }

  test("suppressMatch: documented semantics vs referenceCompat bug-for-bug") {
    import graft.operators.ExportQueries.suppressMatch
    val s = spark
    import s.implicits._
    def run(values: Seq[String], filter: String, compat: Boolean): Boolean =
      Seq(Tuple1(values))
        .toDF("vals")
        .select(suppressMatch(col("vals"), filter, compat).as("m"))
        .head()
        .getBoolean(0)
    // Documented mode: a /regex/ filter regex-matches ordinary values.
    assert(run(Seq("Electronic resource"), "/^Electronic/", compat = false))
    assert(!run(Seq("Book"), "/^Electronic/", compat = false))
    assert(run(Seq("deleted"), "deleted|hidden", compat = false))
    // referenceCompat (AbstractRecord.php:455): the slash test runs on
    // the VALUE, so the same regex filter never fires on ordinary values
    // -- they fall through to the exploded-pipe comparison...
    assert(!run(Seq("Electronic resource"), "/^Electronic/", compat = true))
    // ...while a slash-wrapped VALUE is preg_match'ed against the filter.
    assert(run(Seq("/Electronic thing/"), "/^.Electronic/", compat = true))
    // A slash-wrapped value with a non-regex filter: preg_match errors in
    // PHP (logged, no match), and the pipe list is never consulted.
    assert(!run(Seq("/deleted/"), "deleted|/deleted/", compat = true))
    // The pipe path itself behaves identically in both modes.
    assert(run(Seq("hidden"), "deleted|hidden", compat = true))
    // Degenerate '/' value takes the regex path in compat mode (PHP
    // str_starts_with/str_ends_with are both true for the 1-char value).
    assert(!run(Seq("/"), "x|y", compat = true))
  }
}
