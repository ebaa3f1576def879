package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-pipeline operators, part 7: web-corpus ingestion + corpus shaping.
  *
  *   - `docs_html_strip` — HTML → text: script/style block removal, tag
  *     stripping, common-entity decode, whitespace collapse. The standard
  *     first stage of a web-crawl training pipeline; pure regexp chain,
  *     codegen'd, embarrassingly parallel.
  *   - `docs_url_canon` — URL canonicalization (scheme/host lowercase,
  *     default-port and fragment removal, utm_* tracking-param removal)
  *     followed by a host-level rollup — the dedup key + per-domain stats
  *     step of crawl curation. One shuffle, on the canonical host.
  *   - `docs_chunks` — overlapping training windows (64 tokens, stride
  *     48) via sequence + slice + explode; no shuffle at all, output is
  *     chunk rows ready for tokenization.
  *   - `docs_canonical` — representative selection per near-dup cluster
  *     (block on the first-8-word fingerprint; longest text wins, doc_id
  *     tiebreak) — the "keep one copy" stage after dedup clustering. One
  *     bounded-key shuffle.
  *   - `docs_sample_stratified` — deterministic per-language hash
  *     sampling (md5-derived bucket, language-dependent rate): the
  *     reproducible downsampling step for corpus mixing. Zero shuffles.
  *
  * All hash/bucket arithmetic uses md5-hex-digit positions so the DuckDB
  * oracle computes the identical buckets.
  */
object LlmQueries7 {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)

  /** Canonical-member selection per 8-token-prefix cluster over any
    * (doc_id, n_chars, text) frame — see `docs_canonical`'s registry
    * comment for the window-free scale shape. Exposed for the
    * shared-prefix skew probe.
    */
  def canonicalOf(documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tokens = split(coalesce(col("text"), lit("")), " ")
    val key = md5(array_join(slice(tokens, 1, 8), " "))
    val base = documents.select(
      col("doc_id"),
      col("n_chars"),
      key.as("cluster_key")
    )
    // Winner by (n_chars desc, doc_id asc) == min of (-n_chars, doc_id)
    // under struct ordering; one row per cluster_key, O(1) combiner
    // state per key.
    val winners = base
      .groupBy("cluster_key")
      .agg(
        count(lit(1)).cast("bigint").as("cluster_size"),
        min(struct((-col("n_chars")).as("neg"), col("doc_id").as("w_id"))).as("w")
      )
      .select(col("cluster_key"), col("cluster_size"), col("w.w_id").as("w_id"))
    base
      .join(winners, Seq("cluster_key"))
      .select(
        col("doc_id"),
        col("cluster_key"),
        (col("doc_id") === col("w_id")).as("canonical"),
        col("cluster_size")
      )
  }

  private val htmlStrip = Q(
    "docs_html_strip",
    (s, d) => {
      val id = col("doc_id")
      // The script block spans lines: real crawl HTML is multiline, so the
      // strip regexes must run in DOTALL mode (round-3 defect: without
      // (?s), `.*?` stopped at the newline and the script body leaked
      // into "clean" text).
      val html = concat(
        lit("<html><head><title>Doc "), id.cast("string"),
        lit("</title><script>\nvar x = 1 &amp;&amp; 2;\nconsole.log(x);\n</script>"),
        lit("<style>\n.a{color:red}\n</style></head><body><h1>Heading "),
        id.cast("string"), lit("</h1><p>"), col("text"),
        lit("</p><div class=\"foot\">&amp; more &lt;tags&gt; &quot;quoted&quot; &#39;x&#39;&nbsp;end</div></body></html>")
      )
      val clean = TextFunctions.htmlToText(html)
      docs(s, d).select(
        id,
        clean.as("clean_text"),
        length(clean).cast("bigint").as("n_chars_clean")
      )
    },
    Some {
      val html = """'<html><head><title>Doc ' || cast(doc_id as varchar) || '</title><script>' || chr(10) || 'var x = 1 &amp;&amp; 2;' || chr(10) || 'console.log(x);' || chr(10) || '</script><style>' || chr(10) || '.a{color:red}' || chr(10) || '</style></head><body><h1>Heading ' || cast(doc_id as varchar) || '</h1><p>' || text || '</p><div class="foot">&amp; more &lt;tags&gt; &quot;quoted&quot; &#39;x&#39;&nbsp;end</div></body></html>'"""
      s"""WITH h AS (SELECT doc_id, $html AS html FROM documents),
         |s1 AS (SELECT doc_id, regexp_replace(html, '<script[^>]*>.*?</script>', ' ', 'gs') AS t FROM h),
         |s2 AS (SELECT doc_id, regexp_replace(t, '<style[^>]*>.*?</style>', ' ', 'gs') AS t FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s2),
         |s4 AS (SELECT doc_id,
         |  replace(replace(replace(replace(replace(replace(t,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
         |  FROM s3)
         |SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS clean_text,
         |  cast(length(trim(regexp_replace(t, '\\s+', ' ', 'g'))) as bigint) AS n_chars_clean
         |FROM s4""".stripMargin
    }
  )

  private val urlCanon = Q(
    "docs_url_canon",
    (s, d) => {
      val id = col("doc_id")
      val ids = id.cast("string")
      val raw = when(
        id % 3 === 0,
        concat(lit("HTTPS://WWW"), (id % 4).cast("string"),
          lit(".News.Example.COM:443/articles/"), ids,
          lit("?utm_source=feed&id="), ids, lit("#top"))
      ).when(
        id % 3 === 1,
        concat(lit("http://Blog"), (id % 3).cast("string"),
          lit(".Example.ORG:80/post/"), ids, lit("?id="), ids,
          lit("&utm_campaign=x&ref=y"))
      ).otherwise(concat(lit("https://cdn.example.net/data/"), ids))
      val canon = TextFunctions.canonicalizeUrl(raw)
      val host = TextFunctions.urlHost(canon)
      docs(s, d)
        .select(id, canon.as("url"), host.as("host"))
        .groupBy(col("host"))
        .agg(
          count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("url")).as("sample_url")
        )
    },
    Some {
      val raw = """(CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW' || cast(doc_id % 4 as varchar) || '.News.Example.COM:443/articles/' || cast(doc_id as varchar) || '?utm_source=feed&id=' || cast(doc_id as varchar) || '#top'
                  |      WHEN doc_id % 3 = 1 THEN 'http://Blog' || cast(doc_id % 3 as varchar) || '.Example.ORG:80/post/' || cast(doc_id as varchar) || '?id=' || cast(doc_id as varchar) || '&utm_campaign=x&ref=y'
                  |      ELSE 'https://cdn.example.net/data/' || cast(doc_id as varchar) END)""".stripMargin
      s"""WITH r AS (SELECT doc_id, $raw AS raw FROM documents),
         |f AS (SELECT doc_id, regexp_replace(raw, '#.*$$', '') AS u FROM r),
         |x AS (SELECT doc_id, u,
         |  regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) AS h,
         |  regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) AS sch,
         |  regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*@)', 1) AS ui
         |  FROM f),
         |l AS (SELECT doc_id,
         |  (CASE WHEN h = '' THEN u
         |        ELSE lower(sch) || '://' || ui || lower(substr(h, length(sch) + length(ui) + 4))
         |          || substr(u, length(h) + 1) END) AS u
         |  FROM x),
         |p AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(u, '^(https://[^/:?#]+):443', '\\1'), '^(http://[^/:?#]+):80', '\\1') AS u
         |  FROM l),
         |q AS (SELECT doc_id, regexp_replace(u, '\\?.*$$', '') AS base,
         |  regexp_replace(regexp_replace('&' || regexp_extract(u, '\\?(.*)$$', 1), '&utm_[^&]*', '', 'g'), '^&', '') AS kq
         |  FROM p),
         |c AS (SELECT doc_id, (CASE WHEN kq = '' THEN base ELSE base || '?' || kq END) AS url FROM q)
         |SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
         |  cast(count(*) as bigint) AS n_urls,
         |  cast(count(distinct doc_id) as bigint) AS n_docs,
         |  min(url) AS sample_url
         |FROM c GROUP BY 1""".stripMargin
    }
  )

  private val ChunkLen = 64
  private val ChunkStride = 48

  private val chunks = Q(
    "docs_chunks",
    (s, d) => {
      val tokens = split(coalesce(col("text"), lit("")), " ")
      val starts = sequence(lit(0), greatest(size(tokens) - 1, lit(0)), lit(ChunkStride))
      docs(s, d)
        .select(col("doc_id"), tokens.as("tokens"), explode(starts).as("st"))
        .select(
          col("doc_id"),
          col("st").cast("bigint").as("chunk_start"),
          array_join(slice(col("tokens"), col("st") + 1, lit(ChunkLen)), " ")
            .as("chunk_text"),
          size(slice(col("tokens"), col("st") + 1, lit(ChunkLen)))
            .cast("bigint").as("n_tokens")
        )
    },
    Some {
      s"""WITH tk AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tokens FROM documents),
         |ex AS (SELECT doc_id, tokens,
         |  unnest(range(0, greatest(len(tokens), 1), $ChunkStride)) AS st FROM tk)
         |SELECT doc_id, cast(st as bigint) AS chunk_start,
         |  coalesce(array_to_string(tokens[st+1 : st+$ChunkLen], ' '), '') AS chunk_text,
         |  cast(coalesce(len(tokens[st+1 : st+$ChunkLen]), 0) as bigint) AS n_tokens
         |FROM ex""".stripMargin
    }
  )

  private val canonical = Q(
    "docs_canonical",
    // Scale shape (round-8 rewrite): `canonical` only needs the ARGMAX
    // member per cluster, not a full per-cluster rank — so instead of a
    // `row_number() OVER (PARTITION BY cluster_key)` window (whose
    // mega-groups — boilerplate-heavy web corpora share 8-token prefixes
    // by the million — would each sort on one task) the winner comes
    // from a map-side-combinable groupBy (min of an ordering struct) and
    // an equi-join back on the key. Joins get AQE skew splitting;
    // windows don't — that is the whole trade.
    (s, d) => canonicalOf(docs(s, d)),
    Some {
      s"""WITH b AS (
         |  SELECT doc_id, n_chars,
         |    md5(array_to_string(string_split(coalesce(text, ''), ' ')[1:8], ' ')) AS cluster_key
         |  FROM documents)
         |SELECT doc_id, cluster_key,
         |  (row_number() OVER (PARTITION BY cluster_key ORDER BY n_chars DESC, doc_id) = 1) AS canonical,
         |  cast(count(*) OVER (PARTITION BY cluster_key) as bigint) AS cluster_size
         |FROM b""".stripMargin
    }
  )

  private val sampleStratified = Q(
    "docs_sample_stratified",
    (s, d) => {
      // Bucket 0-255 from the last two md5 hex digits — position lookups
      // so DuckDB derives the identical value.
      val bucket = expr(
        "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 31, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 32, 1)) - 1)"
      )
      val cell = (bucket % 10).cast("bigint")
      val rate = when(col("lang") === "en", lit(5)).otherwise(lit(8))
      docs(s, d)
        .select(col("doc_id"), col("lang"), cell.as("sample_cell"), rate.as("rate"))
        .filter(col("sample_cell") < col("rate"))
        .select(col("doc_id"), col("lang"), col("sample_cell"))
    },
    Some {
      val bucket =
        "((strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 31, 1)) - 1) * 16 + " +
          "(strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 32, 1)) - 1))"
      s"""WITH b AS (SELECT doc_id, lang, cast($bucket % 10 as bigint) AS sample_cell,
         |  (CASE WHEN lang = 'en' THEN 5 ELSE 8 END) AS rate
         |  FROM documents)
         |SELECT doc_id, lang, sample_cell FROM b WHERE sample_cell < rate""".stripMargin
    }
  )

  /** Corpus-level 3-gram heavy hitters: occurrence count + document
    * frequency for every 3-gram above a fixed support threshold. The
    * threshold filter (not a global top-k sort) is deliberate: the plan is
    * one hash shuffle on the gram with map-side partial aggregation, and
    * no single-partition rank bottleneck — the shape that survives 100 TB.
    * Feeds contamination screening and boilerplate detection.
    */
  private val ngramFreq = Q(
    "docs_ngram_freq",
    (s, d) => {
      val tokens = split(coalesce(col("text"), lit("")), " ")
      val grams = transform(
        sequence(lit(0), greatest(size(tokens) - 3, lit(0))),
        i => array_join(slice(tokens, i + 1, lit(3)), " ")
      )
      docs(s, d)
        .filter(size(tokens) >= 3)
        .select(col("doc_id"), explode(grams).as("gram"))
        .groupBy(col("gram"))
        .agg(
          count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs")
        )
        .filter(col("n_occurrences") >= 5)
    },
    Some {
      s"""WITH tk AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tokens FROM documents),
         |ex AS (SELECT doc_id, tokens,
         |  unnest(range(0, greatest(len(tokens) - 3, 0) + 1)) AS i
         |  FROM tk WHERE len(tokens) >= 3)
         |SELECT array_to_string(tokens[i+1 : i+3], ' ') AS gram,
         |  cast(count(*) as bigint) AS n_occurrences,
         |  cast(count(distinct doc_id) as bigint) AS n_docs
         |FROM ex GROUP BY 1 HAVING count(*) >= 5""".stripMargin
    }
  )

  /** Temperature-based corpus mixture sampling (the XLM-R / mT5 recipe):
    * language weights w_l ∝ c_l^α with α = 0.3 flatten the language
    * distribution, a target budget of 30% of the corpus sets per-language
    * keep probabilities p_l = min(1, target·w_l/c_l), and a deterministic
    * md5 bucket (0-255) gates each document against floor(p_l·256).
    * Low-resource languages keep (up to) everything; high-resource ones
    * downsample. Scale shape: one tiny language-count aggregate, a 1-row
    * stats broadcast (computed-key hash join — same trick as
    * docs_lm_score), then a broadcast dimension join back to the fact
    * table: the corpus-size pass never shuffles the documents themselves.
    */
  private val sampleTemperature = Q(
    "docs_sample_temperature",
    (s, d) => {
      val counts = docs(s, d).groupBy("lang").agg(count(lit(1)).as("c"))
      val tot = counts.agg(
        sum(col("c")).as("n"),
        sum(pow(col("c"), lit(0.3))).as("sw")
      )
      val dim = counts
        .withColumn("j", (col("c") - col("c") + 1).cast("int"))
        .join(
          broadcast(tot.select((col("n") - col("n") + 1).cast("int").as("j"), col("n"), col("sw"))),
          Seq("j")
        )
        .select(
          col("lang"), {
            // The keep probability is quantized to integer micro-units
            // BEFORE the *256 floor: floor(p*256) directly would sit on a
            // float boundary whenever p*256 lands on an integer, and a
            // 1-ULP pow() difference between engines would flip the
            // bucket (the integer-unit discipline KMeans.step uses). The
            // subtraction of the remainder makes the final division exact
            // in doubles (numerator a multiple of 1e6, well under 2^53).
            val p = least(
              lit(1.0),
              (lit(0.3) * col("n") * pow(col("c"), lit(0.3)) / col("sw")) / col("c")
            )
            val scaled = round(p * 1000000).cast("long") * 256
            ((scaled - scaled % 1000000) / 1000000).cast("int").as("keep_threshold")
          }
        )
      val bucket = expr(
        "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 31, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 32, 1)) - 1)"
      ).cast("int")
      docs(s, d)
        .join(broadcast(dim), Seq("lang"))
        .select(col("doc_id"), col("lang"), bucket.as("sample_bucket"), col("keep_threshold"))
        .filter(col("sample_bucket") < col("keep_threshold"))
    },
    Some {
      val bucket =
        "cast((strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 31, 1)) - 1) * 16 + " +
          "(strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 32, 1)) - 1) as int)"
      s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
         |t AS (SELECT sum(c) AS n, sum(pow(c, 0.3)) AS sw FROM c),
         |m AS (SELECT lang,
         |  cast(round(least(1.0, (0.3 * t.n * pow(c.c, 0.3) / t.sw) / c.c) * 1000000) as bigint) * 256 AS scaled
         |  FROM c CROSS JOIN t),
         |dim AS (SELECT lang,
         |  cast((scaled - scaled % 1000000) / 1000000 as int) AS keep_threshold
         |  FROM m)
         |SELECT doc_id, lang, $bucket AS sample_bucket, keep_threshold
         |FROM documents JOIN dim USING (lang)
         |WHERE $bucket < keep_threshold""".stripMargin
    }
  )

  private val splitAssign = Q(
    // Deterministic train/val/test assignment — the split step every
    // training-data pipeline needs: a stable hash of the document id
    // (NOT row order, NOT random state) buckets each doc 0-255, and
    // fixed bucket ranges carve the corpus 240/8/8 (93.75% / 3.125% /
    // 3.125%). Re-running over a grown corpus never reassigns an
    // existing doc (the hash ignores everything but the id), which is
    // what keeps eval sets stable across corpus versions. Map-only,
    // zero shuffle; the md5-hex-digit arithmetic matches the DuckDB
    // oracle bit-for-bit (same idiom as docs_sample_stratified).
    "docs_split_assign",
    (s, d) => {
      val hash = md5(col("doc_id").cast("string"))
      def hexDigit(pos: Int) =
        instr(lit("0123456789abcdef"), substring(hash, pos, 1)) - 1
      val bucket = (hexDigit(31) * 16 + hexDigit(32)).cast("int")
      docs(s, d).select(
        col("doc_id"),
        bucket.as("split_bucket"),
        when(bucket < 240, lit("train"))
          .when(bucket < 248, lit("val"))
          .otherwise(lit("test"))
          .as("split")
      )
    },
    Some {
      val bucket =
        "cast((strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 31, 1)) - 1) * 16 + " +
          "(strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 32, 1)) - 1) as int)"
      s"""SELECT doc_id, $bucket AS split_bucket,
         |  (CASE WHEN $bucket < 240 THEN 'train'
         |        WHEN $bucket < 248 THEN 'val' ELSE 'test' END) AS split
         |FROM documents""".stripMargin
    }
  )

  val all: Seq[Q] =
    Seq(htmlStrip, urlCanon, chunks, canonical, sampleStratified, sampleTemperature, ngramFreq,
      splitAssign)
}
