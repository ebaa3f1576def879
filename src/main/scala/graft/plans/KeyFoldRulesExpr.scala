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
  * Round 13 adds Han via a BOUNDED embedded pinyin table for the
  * top-frequency characters ([[KeyFoldRulesExpr.HanLatin]]): one
  * reading per character (the ICU default for heteronyms),
  * tone-stripped to the post-fold image; characters outside the table
  * keep the unromanized passthrough, so the remaining divergence is
  * rare readings only. Default remains `romanize = false` — exact
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

  /** Han → Latin (r13): a BOUNDED embedded pinyin table for the
    * top-frequency characters — the post-fold ASCII image of ICU's
    * Han-Latin readings (tone marks are combining characters the
    * Remove stage strips, so the stored value is the tone-stripped
    * base; ü folds to u the same way; ICU's inter-syllable spaces are
    * non-letters the Remove stage drops). Documented coverage cut:
    * per character, the most common reading (heteronyms like 行/重 get
    * one reading, the ICU default behavior), and characters outside
    * the table pass through unromanized exactly as before — the r12
    * divergence narrows from "all Han" to "rare readings only".
    * Includes the high-frequency traditional variants of tabled
    * simplified forms.
    */
  val HanLatin: Seq[(Char, String)] = Seq(
    // numbers
    '一' -> "yi", '二' -> "er", '三' -> "san", '四' -> "si", '五' -> "wu",
    '六' -> "liu", '七' -> "qi", '八' -> "ba", '九' -> "jiu", '十' -> "shi",
    '百' -> "bai", '千' -> "qian", '万' -> "wan", '零' -> "ling", '两' -> "liang",
    // pronouns / people
    '我' -> "wo", '你' -> "ni", '他' -> "ta", '她' -> "ta", '它' -> "ta",
    '们' -> "men", '人' -> "ren", '民' -> "min", '众' -> "zhong",
    // high-frequency verbs
    '是' -> "shi", '有' -> "you", '在' -> "zai", '来' -> "lai", '去' -> "qu",
    '说' -> "shuo", '看' -> "kan", '想' -> "xiang", '要' -> "yao", '会' -> "hui",
    '能' -> "neng", '做' -> "zuo", '作' -> "zuo", '用' -> "yong", '吃' -> "chi",
    '喝' -> "he", '走' -> "zou", '跑' -> "pao", '飞' -> "fei", '写' -> "xie",
    '读' -> "du", '听' -> "ting", '买' -> "mai", '卖' -> "mai", '开' -> "kai",
    '关' -> "guan", '问' -> "wen", '答' -> "da", '给' -> "gei", '拿' -> "na",
    '放' -> "fang", '找' -> "zhao", '知' -> "zhi", '道' -> "dao", '爱' -> "ai",
    '住' -> "zhu", '坐' -> "zuo", '站' -> "zhan", '起' -> "qi", '睡' -> "shui",
    '死' -> "si", '生' -> "sheng", '变' -> "bian", '成' -> "cheng", '打' -> "da",
    '收' -> "shou", '送' -> "song", '进' -> "jin", '出' -> "chu", '回' -> "hui",
    '过' -> "guo", '到' -> "dao", '从' -> "cong", '向' -> "xiang", '往' -> "wang",
    // grammar / function words
    '的' -> "de", '了' -> "le", '不' -> "bu", '和' -> "he", '与' -> "yu",
    '或' -> "huo", '被' -> "bei", '把' -> "ba", '让' -> "rang", '没' -> "mei",
    '很' -> "hen", '都' -> "dou", '也' -> "ye", '还' -> "hai", '就' -> "jiu",
    '才' -> "cai", '又' -> "you", '再' -> "zai", '最' -> "zui", '更' -> "geng",
    '非' -> "fei", '常' -> "chang", '吗' -> "ma", '呢' -> "ne", '吧' -> "ba",
    '啊' -> "a", '这' -> "zhe", '那' -> "na", '哪' -> "na", '什' -> "shen",
    '么' -> "me", '为' -> "wei", '因' -> "yin", '所' -> "suo", '以' -> "yi",
    '但' -> "dan", '而' -> "er", '如' -> "ru", '果' -> "guo", '虽' -> "sui",
    '然' -> "ran", '于' -> "yu", '对' -> "dui", '错' -> "cuo", '等' -> "deng",
    '着' -> "zhe", '个' -> "ge", '只' -> "zhi", '已' -> "yi", '经' -> "jing",
    // time / space
    '天' -> "tian", '地' -> "di", '日' -> "ri", '月' -> "yue", '年' -> "nian",
    '时' -> "shi", '分' -> "fen", '秒' -> "miao", '今' -> "jin", '明' -> "ming",
    '昨' -> "zuo", '早' -> "zao", '晚' -> "wan", '上' -> "shang", '下' -> "xia",
    '左' -> "zuo", '右' -> "you", '前' -> "qian", '后' -> "hou", '中' -> "zhong",
    '内' -> "nei", '外' -> "wai", '东' -> "dong", '南' -> "nan", '西' -> "xi",
    '北' -> "bei", '春' -> "chun", '秋' -> "qiu", '夏' -> "xia", '冬' -> "dong",
    // nature
    '山' -> "shan", '水' -> "shui", '火' -> "huo", '木' -> "mu", '金' -> "jin",
    '土' -> "tu", '风' -> "feng", '雨' -> "yu", '雪' -> "xue", '云' -> "yun",
    '电' -> "dian", '光' -> "guang", '声' -> "sheng", '色' -> "se", '花' -> "hua",
    '草' -> "cao", '树' -> "shu", '林' -> "lin", '森' -> "sen", '田' -> "tian",
    '石' -> "shi", '海' -> "hai", '河' -> "he", '湖' -> "hu", '江' -> "jiang",
    '空' -> "kong", '气' -> "qi", '星' -> "xing", '沙' -> "sha", '岛' -> "dao",
    // body
    '心' -> "xin", '手' -> "shou", '口' -> "kou", '目' -> "mu", '耳' -> "er",
    '头' -> "tou", '脚' -> "jiao", '身' -> "shen", '体' -> "ti", '血' -> "xue",
    '骨' -> "gu", '肉' -> "rou", '眼' -> "yan", '睛' -> "jing", '脸' -> "lian",
    '发' -> "fa", '牙' -> "ya", '舌' -> "she",
    // family / people
    '家' -> "jia", '父' -> "fu", '母' -> "mu", '子' -> "zi", '女' -> "nu",
    '儿' -> "er", '兄' -> "xiong", '弟' -> "di", '姐' -> "jie", '妹' -> "mei",
    '爸' -> "ba", '妈' -> "ma", '哥' -> "ge", '孩' -> "hai", '老' -> "lao",
    '少' -> "shao", '男' -> "nan", '朋' -> "peng", '友' -> "you", '夫' -> "fu",
    '妻' -> "qi", '王' -> "wang", '帝' -> "di", '君' -> "jun", '臣' -> "chen",
    // places / institutions
    '国' -> "guo", '城' -> "cheng", '市' -> "shi", '县' -> "xian", '省' -> "sheng",
    '村' -> "cun", '乡' -> "xiang", '区' -> "qu", '街' -> "jie", '路' -> "lu",
    '桥' -> "qiao", '门' -> "men", '房' -> "fang", '屋' -> "wu", '室' -> "shi",
    '厅' -> "ting", '场' -> "chang", '店' -> "dian", '馆' -> "guan", '院' -> "yuan",
    '校' -> "xiao", '学' -> "xue", '园' -> "yuan", '公' -> "gong", '司' -> "si",
    '厂' -> "chang", '机' -> "ji", '港' -> "gang", '京' -> "jing", '州' -> "zhou",
    // objects / culture
    '书' -> "shu", '本' -> "ben", '笔' -> "bi", '纸' -> "zhi", '字' -> "zi",
    '词' -> "ci", '句' -> "ju", '文' -> "wen", '语' -> "yu", '话' -> "hua",
    '音' -> "yin", '乐' -> "yue", '歌' -> "ge", '画' -> "hua", '图' -> "tu",
    '表' -> "biao", '数' -> "shu", '科' -> "ke", '技' -> "ji", '术' -> "shu",
    '艺' -> "yi", '车' -> "che", '船' -> "chuan", '票' -> "piao", '钱' -> "qian",
    '元' -> "yuan", '角' -> "jiao", '币' -> "bi", '物' -> "wu", '品' -> "pin",
    '货' -> "huo", '礼' -> "li", '衣' -> "yi", '服' -> "fu", '帽' -> "mao",
    '鞋' -> "xie", '饭' -> "fan", '菜' -> "cai", '茶' -> "cha", '酒' -> "jiu",
    '米' -> "mi", '面' -> "mian", '蛋' -> "dan", '奶' -> "nai", '糖' -> "tang",
    '盐' -> "yan", '油' -> "you",
    // animals
    '鱼' -> "yu", '鸟' -> "niao", '马' -> "ma", '牛' -> "niu", '羊' -> "yang",
    '猪' -> "zhu", '狗' -> "gou", '猫' -> "mao", '鸡' -> "ji", '虫' -> "chong",
    '龙' -> "long", '虎' -> "hu", '熊' -> "xiong", '象' -> "xiang",
    // qualities
    '大' -> "da", '小' -> "xiao", '多' -> "duo", '长' -> "chang", '短' -> "duan",
    '高' -> "gao", '低' -> "di", '快' -> "kuai", '慢' -> "man", '新' -> "xin",
    '旧' -> "jiu", '好' -> "hao", '坏' -> "huai", '美' -> "mei", '真' -> "zhen",
    '假' -> "jia", '冷' -> "leng", '热' -> "re", '温' -> "wen", '凉' -> "liang",
    '干' -> "gan", '湿' -> "shi", '轻' -> "qing", '重' -> "zhong", '硬' -> "ying",
    '软' -> "ruan", '强' -> "qiang", '弱' -> "ruo", '满' -> "man", '远' -> "yuan",
    '近' -> "jin", '深' -> "shen", '浅' -> "qian", '宽' -> "kuan", '厚' -> "hou",
    '薄' -> "bao", '圆' -> "yuan", '方' -> "fang", '直' -> "zhi", '平' -> "ping",
    '亮' -> "liang", '暗' -> "an", '忙' -> "mang", '闲' -> "xian", '安' -> "an",
    '静' -> "jing", '穷' -> "qiong", '富' -> "fu", '贵' -> "gui",
    // colors
    '红' -> "hong", '橙' -> "cheng", '黄' -> "huang", '绿' -> "lu", '蓝' -> "lan",
    '紫' -> "zi", '黑' -> "hei", '白' -> "bai", '灰' -> "hui", '粉' -> "fen",
    // abstract
    '事' -> "shi", '情' -> "qing", '意' -> "yi", '思' -> "si", '理' -> "li",
    '由' -> "you", '法' -> "fa", '律' -> "lu", '规' -> "gui", '则' -> "ze",
    '标' -> "biao", '准' -> "zhun", '题' -> "ti", '案' -> "an", '计' -> "ji",
    '划' -> "hua", '条' -> "tiao", '件' -> "jian", '系' -> "xi", '结' -> "jie",
    '构' -> "gou", '组' -> "zu", '织' -> "zhi", '部' -> "bu", '位' -> "wei",
    '置' -> "zhi", '点' -> "dian", '线' -> "xian", '层' -> "ceng", '级' -> "ji",
    '类' -> "lei", '种' -> "zhong", '样' -> "yang", '式' -> "shi", '形' -> "xing",
    '状' -> "zhuang", '质' -> "zhi", '量' -> "liang", '力' -> "li", '源' -> "yuan",
    '资' -> "zi", '料' -> "liao", '信' -> "xin", '息' -> "xi", '识' -> "shi",
    '智' -> "zhi", '慧' -> "hui", '记' -> "ji", '忆' -> "yi", '感' -> "gan",
    '觉' -> "jue", '绪' -> "xu", '梦' -> "meng", '希' -> "xi", '望' -> "wang",
    '仰' -> "yang", '精' -> "jing", '神' -> "shen", '灵' -> "ling", '魂' -> "hun",
    '命' -> "ming", '运' -> "yun", '福' -> "fu", '喜' -> "xi", '怒' -> "nu",
    '哀' -> "ai", '悲' -> "bei", '欢' -> "huan", '恨' -> "hen", '怕' -> "pa",
    '惊' -> "jing", '奇' -> "qi", '怪' -> "guai",
    // study / work verbs
    '教' -> "jiao", '育' -> "yu", '练' -> "lian", '习' -> "xi", '复' -> "fu",
    '预' -> "yu", '考' -> "kao", '试' -> "shi", '研' -> "yan", '究' -> "jiu",
    '展' -> "zhan", '现' -> "xian", '实' -> "shi", '验' -> "yan", '观' -> "guan",
    '察' -> "cha", '测' -> "ce", '算' -> "suan", '证' -> "zheng", '选' -> "xuan",
    '决' -> "jue", '定' -> "ding", '改' -> "gai", '换' -> "huan", '修' -> "xiu",
    '建' -> "jian", '造' -> "zao", '制' -> "zhi", '产' -> "chan", '加' -> "jia",
    '减' -> "jian", '乘' -> "cheng", '除' -> "chu", '比' -> "bi", '较' -> "jiao",
    '争' -> "zheng", '斗' -> "dou", '战' -> "zhan", '胜' -> "sheng", '败' -> "bai",
    '输' -> "shu", '赢' -> "ying", '保' -> "bao", '护' -> "hu", '救' -> "jiu",
    '帮' -> "bang", '助' -> "zhu", '支' -> "zhi", '持' -> "chi", '反' -> "fan",
    '抗' -> "kang", '谈' -> "tan", '讲' -> "jiang", '告' -> "gao", '诉' -> "su",
    '呼' -> "hu", '喊' -> "han", '叫' -> "jiao", '唱' -> "chang", '笑' -> "xiao",
    '哭' -> "ku", '闹' -> "nao", '骂' -> "ma", '夸' -> "kua", '赞' -> "zan",
    '批' -> "pi", '评' -> "ping", '议' -> "yi", '讨' -> "tao", '商' -> "shang",
    // classics / history
    '楼' -> "lou", '演' -> "yan", '义' -> "yi", '游' -> "you", '浒' -> "hu",
    '传' -> "zhuan", '论' -> "lun", '德' -> "de", '孙' -> "sun", '兵' -> "bing",
    '史' -> "shi", '诗' -> "shi", '易' -> "yi", '庄' -> "zhuang", '孟' -> "meng",
    '墨' -> "mo", '韩' -> "han", '唐' -> "tang", '宋' -> "song", '清' -> "qing",
    '汉' -> "han", '秦' -> "qin", '周' -> "zhou", '晋' -> "jin", '隋' -> "sui",
    '辽' -> "liao", '魏' -> "wei", '蜀' -> "shu", '吴' -> "wu",
    // common traditional variants of tabled simplified forms
    '國' -> "guo", '書' -> "shu", '學' -> "xue", '語' -> "yu", '紅' -> "hong",
    '樓' -> "lou", '夢' -> "meng", '義' -> "yi", '記' -> "ji", '傳' -> "zhuan",
    '論' -> "lun", '經' -> "jing", '漢' -> "han", '馬' -> "ma", '龍' -> "long",
    '鳥' -> "niao", '車' -> "che", '門' -> "men", '長' -> "chang", '東' -> "dong",
    '風' -> "feng", '雲' -> "yun", '電' -> "dian", '愛' -> "ai", '時' -> "shi",
    '間' -> "jian", '飛' -> "fei", '樂' -> "yue", '戰' -> "zhan", '醫' -> "yi"
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
    val all = CyrillicLatin ++ GreekLatin ++ ArabicLatin ++ KanaLatin ++ HanLatin
    // duplicate keys would silently shadow in the map while the
    // oracle's ordered replace chain keeps the FIRST — fail loudly.
    val dup = all.groupBy(_._1).collect { case (c, vs) if vs.size > 1 => c }
    require(dup.isEmpty, s"duplicate romanization rows: ${dup.mkString(",")}")
    val m = new java.util.HashMap[Character, String]()
    all.foreach { case (c, v) => m.put(c, v) }
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
