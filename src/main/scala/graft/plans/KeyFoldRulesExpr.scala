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
  * rare in bibliographic data). Round 11 adds kana (modified Hepburn,
  * with contextual yōon digraphs and sokuon gemination) and Hangul
  * (Revised Romanization 2000, transliteration variant, via the
  * algorithmic Unicode syllable decomposition — no table needed).
  * Only Han still passes through unromanized: its readings genuinely
  * need ICU's per-language data. Default remains `romanize = false` —
  * exact Latin-script parity, no behavior change for existing keys.
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

  /** Kana → Latin (r11): the post-fold ASCII image of Hepburn, per
    * kana syllable, hiragana AND katakana (the JDK lowercases neither
    * into the other). Long-vowel conventions: Hepburn's macron vowels
    * are marks the Remove stage strips, so the chōonpu ー maps to ""
    * and plain vowel sequences stay spelled out (the wāpuro image —
    * `shouyu`, not `shōyu`). を → o (modified Hepburn). Yōon digraphs
    * and sokuon gemination are handled contextually below — per-char
    * rows here cover only the standalone fallbacks.
    */
  val KanaLatin: Seq[(Char, String)] = Seq(
    'あ' -> "a", 'い' -> "i", 'う' -> "u", 'え' -> "e", 'お' -> "o",
    'か' -> "ka", 'き' -> "ki", 'く' -> "ku", 'け' -> "ke", 'こ' -> "ko",
    'が' -> "ga", 'ぎ' -> "gi", 'ぐ' -> "gu", 'げ' -> "ge", 'ご' -> "go",
    'さ' -> "sa", 'し' -> "shi", 'す' -> "su", 'せ' -> "se", 'そ' -> "so",
    'ざ' -> "za", 'じ' -> "ji", 'ず' -> "zu", 'ぜ' -> "ze", 'ぞ' -> "zo",
    'た' -> "ta", 'ち' -> "chi", 'つ' -> "tsu", 'て' -> "te", 'と' -> "to",
    'だ' -> "da", 'ぢ' -> "ji", 'づ' -> "zu", 'で' -> "de", 'ど' -> "do",
    'な' -> "na", 'に' -> "ni", 'ぬ' -> "nu", 'ね' -> "ne", 'の' -> "no",
    'は' -> "ha", 'ひ' -> "hi", 'ふ' -> "fu", 'へ' -> "he", 'ほ' -> "ho",
    'ば' -> "ba", 'び' -> "bi", 'ぶ' -> "bu", 'べ' -> "be", 'ぼ' -> "bo",
    'ぱ' -> "pa", 'ぴ' -> "pi", 'ぷ' -> "pu", 'ぺ' -> "pe", 'ぽ' -> "po",
    'ま' -> "ma", 'み' -> "mi", 'む' -> "mu", 'め' -> "me", 'も' -> "mo",
    'や' -> "ya", 'ゆ' -> "yu", 'よ' -> "yo",
    'ら' -> "ra", 'り' -> "ri", 'る' -> "ru", 'れ' -> "re", 'ろ' -> "ro",
    'わ' -> "wa", 'ゐ' -> "i", 'ゑ' -> "e", 'を' -> "o", 'ん' -> "n",
    'ぁ' -> "a", 'ぃ' -> "i", 'ぅ' -> "u", 'ぇ' -> "e", 'ぉ' -> "o",
    'ゃ' -> "ya", 'ゅ' -> "yu", 'ょ' -> "yo", 'ゎ' -> "wa", 'ゔ' -> "vu",
    'ア' -> "a", 'イ' -> "i", 'ウ' -> "u", 'エ' -> "e", 'オ' -> "o",
    'カ' -> "ka", 'キ' -> "ki", 'ク' -> "ku", 'ケ' -> "ke", 'コ' -> "ko",
    'ガ' -> "ga", 'ギ' -> "gi", 'グ' -> "gu", 'ゲ' -> "ge", 'ゴ' -> "go",
    'サ' -> "sa", 'シ' -> "shi", 'ス' -> "su", 'セ' -> "se", 'ソ' -> "so",
    'ザ' -> "za", 'ジ' -> "ji", 'ズ' -> "zu", 'ゼ' -> "ze", 'ゾ' -> "zo",
    'タ' -> "ta", 'チ' -> "chi", 'ツ' -> "tsu", 'テ' -> "te", 'ト' -> "to",
    'ダ' -> "da", 'ヂ' -> "ji", 'ヅ' -> "zu", 'デ' -> "de", 'ド' -> "do",
    'ナ' -> "na", 'ニ' -> "ni", 'ヌ' -> "nu", 'ネ' -> "ne", 'ノ' -> "no",
    'ハ' -> "ha", 'ヒ' -> "hi", 'フ' -> "fu", 'ヘ' -> "he", 'ホ' -> "ho",
    'バ' -> "ba", 'ビ' -> "bi", 'ブ' -> "bu", 'ベ' -> "be", 'ボ' -> "bo",
    'パ' -> "pa", 'ピ' -> "pi", 'プ' -> "pu", 'ペ' -> "pe", 'ポ' -> "po",
    'マ' -> "ma", 'ミ' -> "mi", 'ム' -> "mu", 'メ' -> "me", 'モ' -> "mo",
    'ヤ' -> "ya", 'ユ' -> "yu", 'ヨ' -> "yo",
    'ラ' -> "ra", 'リ' -> "ri", 'ル' -> "ru", 'レ' -> "re", 'ロ' -> "ro",
    'ワ' -> "wa", 'ヰ' -> "i", 'ヱ' -> "e", 'ヲ' -> "o", 'ン' -> "n",
    'ァ' -> "a", 'ィ' -> "i", 'ゥ' -> "u", 'ェ' -> "e", 'ォ' -> "o",
    'ャ' -> "ya", 'ュ' -> "yu", 'ョ' -> "yo", 'ヮ' -> "wa", 'ヴ' -> "vu",
    'ー' -> ""
  )

  private val KanaSmallY = Map('ゃ' -> "a", 'ゅ' -> "u", 'ょ' -> "o", 'ャ' -> "a", 'ュ' -> "u", 'ョ' -> "o")

  private val KanaYoonBase = Seq(
    'き' -> "ky", 'し' -> "sh", 'ち' -> "ch", 'に' -> "ny", 'ひ' -> "hy", 'み' -> "my",
    'り' -> "ry", 'ぎ' -> "gy", 'じ' -> "j", 'ぢ' -> "j", 'び' -> "by", 'ぴ' -> "py",
    'キ' -> "ky", 'シ' -> "sh", 'チ' -> "ch", 'ニ' -> "ny", 'ヒ' -> "hy", 'ミ' -> "my",
    'リ' -> "ry", 'ギ' -> "gy", 'ジ' -> "j", 'ヂ' -> "j", 'ビ' -> "by", 'ピ' -> "py"
  )

  /** Yōon digraphs (i-row kana + small y-kana → one syllable: きゃ →
    * kya, しゅ → shu). Must apply BEFORE the per-char rows on both
    * engines; the oracle chain keeps this order.
    */
  val KanaDigraphs: Seq[(String, String)] =
    for ((b, c) <- KanaYoonBase; (sm, v) <- KanaSmallY.toSeq.sortBy(_._1))
      yield s"$b$sm" -> (c + v)

  /** Sokuon gemination, expressed POST-base-mapping (the oracle's
    * replace chain sees っ followed by the already-romanized next
    * syllable): っ + consonant doubles it, with Hepburn's tch for ch;
    * a leftover っ (final, or before a vowel) drops via the per-char
    * fallback rows.
    */
  val SokuonPairs: Seq[(String, String)] = {
    val doubling = "kstpgdbzjfhmnrwyv".map(c => s"$c" -> s"$c$c") :+ ("c" -> "tc")
    for (tsu <- Seq('っ', 'ッ'); (c, d) <- doubling) yield s"$tsu$c" -> d
  }

  /** Leftover sokuon fallbacks — the LAST kana rows in the chain. */
  val SokuonDrops: Seq[(String, String)] = Seq("っ" -> "", "ッ" -> "")

  // Revised Romanization of Korean (2000), transliteration variant:
  // Unicode Hangul syllables decompose algorithmically (syllable −
  // U+AC00 = (lead·21 + vowel)·28 + tail) onto these three tables.
  private val HangulLead = Array("g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "", "j", "jj", "ch",
    "k", "t", "p", "h")
  private val HangulVowel = Array("a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae", "oe", "yo",
    "u", "wo", "we", "wi", "yu", "eu", "ui", "i")
  private val HangulTail = Array("", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb", "ls", "lt",
    "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch", "k", "t", "p", "h")

  /** Revised-Romanization image of one precomposed Hangul syllable. */
  def hangulRoman(c: Char): String = {
    val s = c - 0xac00
    HangulLead(s / 588) + HangulVowel(s % 588 / 28) + HangulTail(s % 28)
  }

  private def isHangulSyllable(cp: Int): Boolean = cp >= 0xac00 && cp <= 0xd7a3

  private val romanMap: java.util.HashMap[Character, String] = {
    val m = new java.util.HashMap[Character, String]()
    (CyrillicLatin ++ GreekLatin ++ ArabicLatin ++ KanaLatin).foreach { case (c, v) => m.put(c, v) }
    m
  }

  private val digraphMap: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    KanaDigraphs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Per-codepoint transliteration over NFC text: lowercase the char,
    * map it if tabled, pass it through otherwise. NFC first so
    * decomposed й (и + breve) romanizes as й→j, not и→i. Three
    * contextual cases beyond the per-char table, all mirrored by the
    * oracle's ordered replace chain: Hangul syllables decompose
    * algorithmically; yōon digraphs consume two kana; sokuon doubles
    * the next syllable's initial consonant (t for ch).
    */
  private def romanizeString(str: String): String = {
    val nfc = Normalizer.normalize(str, Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (isHangulSyllable(cp)) {
        sb.append(hangulRoman(cp.toChar))
        i += 1
      } else {
        val lc = Character.toLowerCase(cp)
        val c = if (Character.isBmpCodePoint(lc)) lc.toChar else '\u0000'
        if (c == 'っ' || c == 'ッ') {
          // gemination: double the next kana syllable's initial
          // consonant (tch for ch); vowel-initial or non-kana → drop
          // the "next image" mirrors the oracle chain's state after
          // base mapping: romanized kana, decomposed Hangul, or the
          // lowercased char itself when untabled
          if (i + 1 < nfc.length) {
            val nc = nfc.charAt(i + 1)
            val nxt =
              if (isHangulSyllable(nc.toInt)) hangulRoman(nc)
              else {
                val nl = Character.toLowerCase(nc)
                val t = romanMap.get(nl)
                if (t != null) t else nl.toString
              }
            if (nxt.nonEmpty) {
              val f = nxt.charAt(0)
              if (f == 'c') sb.append('t')
              else if ("kstpgdbzjfhmnrwyv".indexOf(f.toInt) >= 0) sb.append(f)
            }
          }
          i += 1
        } else if (c != '\u0000' && i + 1 < nfc.length &&
          digraphMap.containsKey(s"$c${nfc.charAt(i + 1)}")) {
          sb.append(digraphMap.get(s"$c${nfc.charAt(i + 1)}"))
          i += 2
        } else {
          val mapped = if (c != '\u0000') romanMap.get(c) else null
          if (mapped != null) sb.append(mapped)
          else sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
      }
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
