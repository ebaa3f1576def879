package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * normalization, shingling, MinHash signatures, SimHash, token statistics
  * and fingerprinting. All pure column expressions (codegen-friendly, no
  * UDFs) so they distribute trivially — per-document cost is independent of
  * corpus size, and every downstream grouping is a hash shuffle on a
  * bounded key.
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lowercased text. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  def words(c: Column): Column = split(normalizeText(c), " ")

  /** Word `n`-gram shingles; the whole text when shorter than `n` words. */
  def shingles(c: Column, n: Int = 3): Column =
    // bindOnce: each per-position slice would otherwise inline (and
    // re-evaluate) the whole normalize+split subtree — O(n²) per row
    // (the fingerprintHashes lesson). The short-text branch rejoins the
    // bound words instead of re-normalizing: normalizeText is exactly
    // single-space-joined words, so array_join(ws, " ") is identical.
    graft.functions.MetadataFunctions.bindOnce(words(c)) { ws =>
      when(
        size(ws) >= n,
        transform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", slice(ws, i, lit(n)))
        )
      ).otherwise(array(array_join(ws, " ")))
    }

  /** Modulus for the derived hash family: 2^48-1 keeps j*h2 sums well
    * inside long range and the hex prefix parse exact in any engine.
    */
  val MinhashMod = 281474976710655L

  /** Per-shingle base hashes for the two-hash MinHash family: one md5 per
    * shingle, split into two 48-bit integers. The k-th hash is then
    * (h1 + k*h2) mod M — the standard construction, so the whole
    * signature costs one digest per shingle instead of k.
    */
  def shingleHashes(shing: Column): Column =
    transform(
      shing,
      s => {
        val h = md5(s)
        struct(
          conv(substring(h, 1, 12), 16, 10).cast("long").as("h1"),
          conv(substring(h, 13, 12), 16, 10).cast("long").as("h2")
        )
      }
    )

  /** MinHash signature (array of k longs) from precomputed shingle hashes.
    * Callers on a hot path should materialize [[shingleHashes]] behind a
    * projection first — referencing this expression k times otherwise
    * recomputes the digests.
    */
  def signatureFromHashes(hashed: Column, k: Int): Column =
    array((0 until k).map { j =>
      array_min(
        transform(
          hashed,
          p => (p.getField("h1") + lit(j.toLong) * p.getField("h2")) % MinhashMod
        )
      )
    }: _*)

  /** MinHash signature of `k` hashes over word `shingleN`-grams. */
  def minhashSignature(c: Column, k: Int = 12, shingleN: Int = 3): Column =
    signatureFromHashes(shingleHashes(shingles(c, shingleN)), k)

  /** LSH band hashes: `bands` groups of `rows` signature entries, each
    * hashed to one bucket key. Two documents share a band hash iff their
    * signatures agree on every row of that band — the standard banding
    * estimator. Downstream joins group by (band index, band hash): a
    * bounded-fanout hash shuffle, never an all-pairs product.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5(
        concat_ws(
          "|",
          (0 until rows).map(r => element_at(sig, b * rows + r + 1).cast("string")): _*
        )
      )
    }: _*)

  /** Drop-one-row multi-probe band keys: for every band, `rows` partial
    * hashes each omitting one signature position, tagged (band_id,
    * drop_pos) so the key spaces stay disjoint. Two documents whose
    * signatures disagree on exactly one minhash within a band still
    * collide on the partial key that drops that position — the banding
    * analogue of Lv et al.'s multi-probe (hash-valued keys have no
    * "adjacent bucket" to probe, so the probe set is the subset lattice
    * one level down). Recall rises at the cost of shorter keys (rows−1
    * hashes), i.e. more accidental collisions — the certified trade in
    * `docs_dedup_eval_multiprobe`.
    */
  def lshProbeBands(sig: Column, bands: Int, rows: Int): Column =
    array((for { b <- 0 until bands; r <- 0 until rows } yield struct(
      lit(b).as("band_id"),
      lit(r).as("drop_pos"),
      md5(
        concat_ws(
          "|",
          (0 until rows)
            .filter(_ != r)
            .map(q => element_at(sig, b * rows + q + 1).cast("string")): _*
        )
      ).as("p_hash")
    )): _*)

  /** Hex-char numeric value (0-15) of position `pos` (1-based) in an md5
    * hex string.
    */
  private def hexVal(h: Column, pos: Column): Column =
    conv(h.substr(pos, lit(1)), 16, 10).cast("int")

  /** Bit `b` (0 = most significant) of the md5-derived integer for a word:
    * extracted arithmetically (floor-div + mod) so the same expression is
    * writable in ANSI SQL.
    */
  private def md5Bit(w: Column, b: Column): Column = {
    val hv = hexVal(md5(w), ((b - (b % 4)) / 4).cast("int") + 1)
    val p = element_at(array(lit(8), lit(4), lit(2), lit(1)), (b % 4) + 1)
    floor(hv / p).cast("int") % 2
  }

  /** Bit `b` (0 = most significant) of an ALREADY-COMPUTED md5 hex
    * string — the per-bit lambdas reference the hash, so the digest is
    * computed once per word, not once per (word, bit).
    */
  private def hashBit(h: Column, b: Column): Column = {
    val hv = hexVal(h, ((b - (b % 4)) / 4).cast("int") + 1)
    val p = element_at(array(lit(8), lit(4), lit(2), lit(1)), (b % 4) + 1)
    floor(hv / p).cast("int") % 2
  }

  /** `bits`-bit SimHash over the document's words (with repetition as
    * weight): bit b is 1 iff the sum of (2*bit_b(word)-1) over words is
    * >= 0. Returned as a bit string for engine-portable comparison.
    *
    * The word hashes materialize ONCE behind a lambda binding — the
    * per-bit lambdas each reopen their own scope, so without the
    * binding codegen cannot unify the md5 calls across lambdas and a
    * 64-bit hash of a 200-word doc would compute 12,800 digests
    * instead of 200.
    */
  def simhash(c: Column, bits: Int = 32): Column =
    get(
      transform(
        array(transform(words(c), w => md5(w))),
        hs =>
          array_join(
            transform(
              sequence(lit(0), lit(bits - 1)),
              b => {
                val s = aggregate(
                  hs,
                  lit(0),
                  (acc, h) => acc + (hashBit(h, b) * 2 - 1)
                )
                when(s >= 0, lit("1")).otherwise(lit("0"))
              }
            ),
            ""
          )
      ),
      lit(0)
    )

  /** Rabin-Karp powers for the fingerprint polynomial, base 131 with
    * byte-bounded character codes: the max 8-term sum is
    * 255·Σ131^j ≈ 1.7·10¹⁷, comfortably inside a signed 64-bit value in
    * BOTH engines (DuckDB BIGINT overflow is a hard error, so headroom
    * is a correctness requirement, not a nicety).
    */
  private[graft] val FpPows: Array[Long] = Array.iterate(1L, 8)(_ * 131L)

  /** Winnowing-style document fingerprint: a Rabin-Karp polynomial hash
    * (base 131 over codepoint-mod-256 values) of every `width`-char
    * window of the normalized text; exposes the global minimum and the
    * `k` smallest hashes (a k-min sketch) for cheap containment checks.
    *
    * The hash is 8 integer multiply-adds per window — the r8 sf1 sweep
    * caught the previous md5-per-window form dominating every
    * fingerprint consumer (docs_fingerprint 539 s, bloom decontaminate
    * 275 s, contamination 249 s at 50k docs); identical windows map to
    * identical longs, which is all the consumers (equi-joins, bloom
    * membership, min-sketches) rely on. [[fingerprintHashesSql]] is the
    * DuckDB mirror generated from the same power table.
    */
  def fingerprintHashes(c: Column, width: Int = 8): Column = {
    require(width == 8, "fingerprint window is fixed at 8 (power table)")
    import graft.functions.MetadataFunctions.bindOnce
    // Two-level let-binding (the bindOnce house rule): without it,
    // projection collapse inlines the normalization chain into EVERY
    // per-character term — 8·n regexp evaluations per row, O(n²) in
    // text length (the textstats probe measured 111 s for 5k docs; the
    // bound form is sub-second). `norm` binds the normalized string
    // once; `codes` binds the per-character value array once, so each
    // window term is an O(1) array index. Semantics (and the DuckDB
    // mirror) are unchanged — only Spark-side evaluation sharing.
    bindOnce(normalizeText(c)) { norm =>
      val codesExpr = when(length(norm) === 0, typedLit(Seq.empty[Long]))
        .otherwise(
          transform(
            sequence(lit(1), length(norm)),
            i => (ascii(norm.substr(i, lit(1))) % 256).cast("long")
          )
        )
      bindOnce(codesExpr) { codes =>
        def term(pos: Column, exp: Int): Column =
          element_at(codes, pos.cast("int")) * lit(FpPows(exp))
        val windowHash = (i: Column) =>
          (0 until width).map(j => term(i + lit(j), width - 1 - j)).reduce(_ + _)
        val m = size(codes)
        // Guard short texts: sequence(1, n) with n < 1 would produce a
        // descending range and junk windows; hash the whole text as one
        // shorter window instead (same polynomial, lower leading power).
        val shortHash = aggregate(
          sequence(lit(1), m),
          lit(0L),
          (acc, k) =>
            acc + term(k, 0) * element_at(typedLit(FpPows.toSeq), (m - k + 1).cast("int"))
        )
        when(m >= width, transform(sequence(lit(1), m - (width - 1)), windowHash))
          // Empty text would make the short-window sequence descend; pin it.
          .when(m === 0, array(lit(0L)))
          .otherwise(array(shortHash))
      }
    }
  }

  /** DuckDB mirror of [[fingerprintHashes]], generated from the same
    * power table so the two engines cannot drift. `norm` is the SQL
    * expression for the normalized text.
    */
  def fingerprintHashesSql(norm: String): String = {
    // SQL-level let-binding, the bindOnce trick in DuckDB: a
    // single-element list_transform binds its argument once, so `norm`
    // (usually an inline regexp chain) evaluates ONCE per row and the
    // per-character code array once — not once per polynomial term.
    // Unbound, the sf1 DuckDB compare spent ~45 min on the fingerprint
    // oracle alone (8·n regexp evaluations per row); bound it is
    // seconds. Values are identical — same polynomial, same order.
    val windowSum = (0 until 8)
      .map(j => s"cs[${if (j == 0) "i" else s"i + $j"}] * ${FpPows(7 - j)}")
      .mkString(" + ")
    val pows = FpPows.mkString("[", ", ", "]")
    // list_sum widens to HUGEINT, which would infect the CASE-unified
    // list type (and fp_min's) — pin it back to BIGINT.
    val shortSum =
      s"cast(list_sum(list_transform(range(1, len(cs) + 1), k -> cs[k] * ($pows)[len(cs) - k + 1])) as bigint)"
    val codes =
      "(CASE WHEN length(nx) = 0 THEN cast([] as bigint[]) " +
        "ELSE list_transform(range(1, length(nx) + 1), k -> cast(ord(substr(nx, k, 1)) % 256 as bigint)) END)"
    s"list_transform([$norm], nx -> " +
      s"list_transform([$codes], cs -> " +
      s"(CASE WHEN len(cs) >= 8 THEN list_transform(range(1, len(cs) - 6), i -> $windowSum) " +
      s"WHEN len(cs) = 0 THEN [cast(0 as bigint)] " +
      s"ELSE [$shortSum] END))[1])[1]"
  }

  /** Approximate BPE-ish token count: word chars runs + single
    * non-word-non-space chars (the common pre-tokenizer split).
    */
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Stopword sets for the language-ID heuristic (top function words). */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "une", "du"),
    "de" -> Seq("der", "die", "und", "das", "den", "von", "zu", "mit", "sich", "auf")
  )

  /** Distinct-overlap score of the document's words with a stopword set. */
  def stopwordHits(ws: Column, set: Seq[String]): Column =
    size(array_intersect(ws, array(set.map(lit): _*)))

  /** Heuristic language ID: argmax of stopword-set overlap, fixed priority
    * order on ties, "und" (undetermined) when no set matches.
    */
  def languageId(c: Column): Column =
    // bindOnce ×2: the words array is read by every stopword set and
    // each hit count by every tie comparison — unbound, the whole
    // normalize+split subtree evaluates ~10× per row. array_max over
    // the bound hit array replaces greatest() with identical semantics.
    graft.functions.MetadataFunctions.bindOnce(words(c)) { ws =>
      graft.functions.MetadataFunctions.bindOnce(
        array(StopwordSets.map { case (_, set) => stopwordHits(ws, set) }: _*)
      ) { hits =>
        val maxHits = array_max(hits)
        val chain = StopwordSets.zipWithIndex.foldLeft(when(lit(false), lit("und"))) {
          case (acc, ((lang, _), i)) =>
            acc.when(element_at(hits, i + 1) === maxHits && maxHits > 0, lit(lang))
        }
        chain.otherwise(lit("und"))
      }
    }

  /** HTML → text: script/style block removal (DOTALL — real crawl HTML
    * is multiline), tag stripping, common-entity decode, whitespace
    * collapse. Pure regexp chain, codegen'd, embarrassingly parallel.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    // &amp; must decode LAST: decoding it first would turn escaped entity
    // text like "&amp;lt;" into "&lt;" and then a literal "<" — content
    // the source document had explicitly escaped.
    val decoded = Seq(
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&nbsp;" -> " ",
      "&amp;" -> "&"
    ).foldLeft(noTags) { case (acc, (ent, ch)) => regexp_replace(acc, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL canonicalization: fragment off, scheme+host lowercased, default
    * ports dropped, utm_* tracking params removed, query string
    * re-anchored, trailing '?' dropped.
    */
  def canonicalizeUrl(raw: Column): Column = {
    val noFrag = regexp_replace(raw, "#.*$", "")
    // Lowercase only scheme + host:port. Userinfo is case-sensitive per
    // RFC 3986, so it passes through untouched.
    val head = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val scheme = regexp_extract(head, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    val ui = regexp_extract(head, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*@)", 1)
    val hostport = head.substr(length(scheme) + length(ui) + 4, length(head))
    val rest = noFrag.substr(length(head) + 1, length(noFrag))
    val lowered = when(head === "", noFrag)
      .otherwise(concat(lower(scheme), lit("://"), ui, lower(hostport), rest))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]+):443", "$1"),
      "^(http://[^/:?#]+):80",
      "$1"
    )
    // Strip utm_* from the query alone, split at the first '?': a literal
    // '&' in the path must never be rewritten to '?'.
    val base = regexp_replace(noPort, "\\?.*$", "")
    val query = regexp_extract(noPort, "\\?(.*)$", 1)
    val keptQuery =
      regexp_replace(regexp_replace(concat(lit("&"), query), "&utm_[^&]*", ""), "^&", "")
    when(keptQuery === "", base).otherwise(concat(base, lit("?"), keptQuery))
  }

  /** Host component of a canonicalized http(s) URL. */
  def urlHost(canon: Column): Column =
    regexp_extract(canon, "^https?://([^/?#]+)", 1)
}
