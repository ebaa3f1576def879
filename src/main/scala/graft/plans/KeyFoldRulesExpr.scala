package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's DEFAULT key-folding rules as a native expression.
  *
  * When PHP intl is available the reference normalizes dedup keys with an
  * ICU transliterator built from `MetadataUtils.php:159`
  * `':: NFD; :: lower; :: Latin; :: [^[:letter:] [:number:]] Remove; :: NFKC;'`
  * (`:416` normalizeKey short-circuits to it, `:1234`
  * getKeyFoldingTransliterator). For Latin-script input — the workload
  * the folding rules exist for — the pipeline reduces exactly to:
  * NFD decompose → lowercase → drop every char that is not a Unicode
  * letter or digit (this removes the combining marks NFD split off, plus
  * all punctuation/whitespace) → NFKC recompose. All four stages are in
  * the JDK (`java.text.Normalizer` + `Character` classes), so this
  * expression reproduces the ICU result without ICU for any input whose
  * script is already Latin.
  *
  * The `:: Latin;` stage also ROMANIZES other scripts. Full ICU
  * transliteration data is unavailable here, so `romanize = true`
  * applies an EMBEDDED public transliteration table for the two most
  * common non-Latin bibliographic scripts — Cyrillic (ISO 9:1995 /
  * GOST 7.79 System A, the system ICU's Cyrillic-Latin rules follow)
  * and Greek (ELOT 743 / UN romanization) — stored as each mapping's
  * post-fold ASCII image (the diacritics ISO 9 adds, ž/č/š/û/â…, are
  * combining marks the Remove stage strips anyway, so `ж → z` directly
  * is the same key). This is a documented APPROXIMATION of ICU: per
  * character, no Greek context rules (γγ→ng, αυ→av), hard/soft signs
  * dropped. Round 10 extends the table with Arabic (ISO 233:1984 —
  * also per-char like ISO 9 — plus the Persian extensions and the
  * Arabic-Indic digit rows ICU's `:: Latin;` converts); the harakat
  * vowel marks are category Mn, so the Remove stage strips them with
  * no table entry, and the hamza/ʿayn rows whose ISO images are
  * modifier letters are dropped like the Cyrillic signs. Presentation
  * forms (U+FB50…) are NOT folded (they would need a pre-NFKC pass —
  * rare in bibliographic data); CJK still passes through unromanized
  * (needs ICU data). Default remains `romanize = false` — exact
  * Latin-script parity, no behavior change for existing keys.
  */
case class KeyFoldRulesExpr(child: Expression, romanize: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_key_fold_rules"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    KeyFoldRulesExpr.fold(input.asInstanceOf[UTF8String], romanize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KeyFoldRulesExpr.fold($c, $romanize)")

  override protected def withNewChildInternal(newChild: Expression): KeyFoldRulesExpr =
    copy(child = newChild)
}

object KeyFoldRulesExpr {

  /** Cyrillic → Latin, the post-fold ASCII image of ISO 9:1995 (System
    * A): the ISO mapping is 1:1 char-to-char with diacritics (ж→ž,
    * ч→č, ю→û); the fold's Remove stage strips those marks, so the
    * stored value is the mark-stripped Latin base. Hard/soft signs (ъ,
    * ь) map to ISO 9's modifier-letter primes, which carry no key
    * information — dropped. Covers Russian plus the Ukrainian /
    * Belarusian / Serbian / Macedonian extensions.
    */
  val CyrillicLatin: Seq[(Char, String)] = Seq(
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
    'е' -> "e", 'ё' -> "e", 'ж' -> "z", 'з' -> "z", 'и' -> "i",
    'й' -> "j", 'к' -> "k", 'л' -> "l", 'м' -> "m", 'н' -> "n",
    'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t",
    'у' -> "u", 'ф' -> "f", 'х' -> "h", 'ц' -> "c", 'ч' -> "c",
    'ш' -> "s", 'щ' -> "s", 'ъ' -> "", 'ы' -> "y", 'ь' -> "",
    'э' -> "e", 'ю' -> "u", 'я' -> "a",
    // Ukrainian / Belarusian
    'і' -> "i", 'ї' -> "i", 'є' -> "e", 'ґ' -> "g", 'ў' -> "u",
    // Serbian / Macedonian
    'ј' -> "j", 'ђ' -> "d", 'ћ' -> "c", 'љ' -> "l", 'њ' -> "n",
    'џ' -> "d", 'ѓ' -> "g", 'ќ' -> "k", 'ѕ' -> "z"
  )

  /** Greek → Latin, the post-fold ASCII image of ELOT 743 / UN: per
    * character (θ→th, χ→ch, ψ→ps are the multi-char cases), precomposed
    * accented vowels included so NFC input romanizes without a
    * decomposition pass (the fold strips the marks afterwards either
    * way).
    */
  val GreekLatin: Seq[(Char, String)] = Seq(
    'α' -> "a", 'β' -> "v", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e",
    'ζ' -> "z", 'η' -> "i", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k",
    'λ' -> "l", 'μ' -> "m", 'ν' -> "n", 'ξ' -> "x", 'ο' -> "o",
    'π' -> "p", 'ρ' -> "r", 'σ' -> "s", 'ς' -> "s", 'τ' -> "t",
    'υ' -> "y", 'φ' -> "f", 'χ' -> "ch", 'ψ' -> "ps", 'ω' -> "o",
    'ά' -> "a", 'έ' -> "e", 'ή' -> "i", 'ί' -> "i", 'ό' -> "o",
    'ύ' -> "y", 'ώ' -> "o", 'ϊ' -> "i", 'ϋ' -> "y", 'ΐ' -> "i",
    'ΰ' -> "y"
  )

  /** Arabic → Latin, the post-fold ASCII image of ISO 233:1984: the
    * ISO mapping is per-character with diacritics (ṯ, ǧ, ḫ, š…) whose
    * marks the Remove stage strips, so the stored value is the
    * mark-stripped base. Hamza forms and ʿayn map to ISO 233's
    * modifier-letter glottal signs (ʾ/ʿ) — no key information, dropped
    * like the Cyrillic hard/soft signs; hamza CARRIERS keep their
    * carrier letter. The harakat (U+064B–U+0652) need no rows: they
    * are combining marks the fold strips anyway. Persian letters and
    * both Arabic-Indic digit blocks are included because ICU's
    * `:: Latin;` converts them too.
    */
  val ArabicLatin: Seq[(Char, String)] = Seq(
    'ء' -> "", 'آ' -> "a", 'أ' -> "a", 'ؤ' -> "w", 'إ' -> "i",
    'ئ' -> "y", 'ا' -> "a", 'ب' -> "b", 'ة' -> "t", 'ت' -> "t",
    'ث' -> "t", 'ج' -> "g", 'ح' -> "h", 'خ' -> "h", 'د' -> "d",
    'ذ' -> "d", 'ر' -> "r", 'ز' -> "z", 'س' -> "s", 'ش' -> "s",
    'ص' -> "s", 'ض' -> "d", 'ط' -> "t", 'ظ' -> "z", 'ع' -> "",
    'غ' -> "g", 'ف' -> "f", 'ق' -> "q", 'ك' -> "k", 'ل' -> "l",
    'م' -> "m", 'ن' -> "n", 'ه' -> "h", 'و' -> "w", 'ى' -> "y",
    'ي' -> "y", 'ٱ' -> "a",
    // Persian
    'پ' -> "p", 'چ' -> "c", 'ژ' -> "z", 'گ' -> "g", 'ک' -> "k",
    'ی' -> "y",
    // Arabic-Indic and Extended (Persian) digits
    '٠' -> "0", '١' -> "1", '٢' -> "2", '٣' -> "3", '٤' -> "4",
    '٥' -> "5", '٦' -> "6", '٧' -> "7", '٨' -> "8", '٩' -> "9",
    '۰' -> "0", '۱' -> "1", '۲' -> "2", '۳' -> "3", '۴' -> "4",
    '۵' -> "5", '۶' -> "6", '۷' -> "7", '۸' -> "8", '۹' -> "9"
  )

  private val romanMap: java.util.HashMap[Character, String] = {
    val m = new java.util.HashMap[Character, String]()
    (CyrillicLatin ++ GreekLatin ++ ArabicLatin).foreach { case (c, v) => m.put(c, v) }
    m
  }

  /** Per-codepoint transliteration over NFC text: lowercase the char,
    * map it if tabled, pass it through otherwise. NFC first so
    * decomposed й (и + breve) romanizes as й→j, not и→i.
    */
  private def romanizeString(str: String): String = {
    val nfc = Normalizer.normalize(str, Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      val mapped = if (Character.isBmpCodePoint(lc)) romanMap.get(lc.toChar) else null
      if (mapped != null) sb.append(mapped)
      else sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def fold(s: UTF8String): UTF8String = fold(s, romanize = false)

  def fold(s: UTF8String, romanize: Boolean): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return s
    val pre = if (romanize) romanizeString(str) else str
    // NFD splits letters from their combining marks; marks are category
    // Mn/Mc/Me — not letters, not digits — so the Remove stage strips
    // them, which is exactly how the rules fold 'ä' → 'a'.
    val nfd = Normalizer.normalize(pre, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.isLetter(cp) || Character.isDigit(cp))
        sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFKC))
  }

  /** String convenience form (tests). */
  def fold(s: String): String = fold(UTF8String.fromString(s)).toString

  /** String convenience form with romanization (tests). */
  def fold(s: String, romanize: Boolean): String =
    fold(UTF8String.fromString(s), romanize).toString
}
