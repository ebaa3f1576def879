package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
  * the MOSS algorithm): over the Rabin-Karp window-hash sequence
  * h[1..m] ([[TextFunctions.fingerprintHashes]], 8-char windows), slide
  * a winnowing window of W = 4 consecutive hashes and record the
  * minimum of each window, breaking ties by the RIGHTMOST position (the
  * paper's rule, which maximizes fingerprint reuse between overlapping
  * windows). The selected (position, hash) set is the document's
  * fingerprint: any shared substring of length ≥ w_hash + W − 1 = 11
  * chars is guaranteed to contribute at least one common fingerprint —
  * the local-sampling guarantee `docs_fingerprint`'s global k-min
  * sketch cannot give.
  *
  * Output per document: window count, the number of selected
  * fingerprints (distinct positions), their density vs the 2/(W+1)
  * expectation, the minimum selected hash, and an integer checksum
  * (sum of selected hashes) so the oracle certifies the exact selected
  * SET, not just its size.
  *
  * Scale shape: map-only — every column derives from per-row arrays
  * bounded by the document length; no shuffle at all (the 100 TB plan
  * is a single scan). Cross-engine determinism is pure integer
  * arithmetic: the polynomial hashes are longs from the shared power
  * table, and the rightmost-argmin is computed by the same
  * reverse+first-position trick in both engines.
  */
object WinnowingQueries {

  private val W = 4

  /** Rightmost index of the minimum of hs[i..i+w-1] (1-based `i`):
    * reverse the window so the FIRST occurrence of the min in the
    * reversed slice is the RIGHTMOST in the original, then map back.
    */
  private def rightmostMinPos(hs: Column, i: Column, w: Int): Column = {
    val win = slice(hs, i, lit(w))
    i + lit(w) - array_position(reverse(win), array_min(win)).cast("int")
  }

  /** Selected fingerprint positions of a hash array under winnowing
    * window `w`: distinct rightmost argmins over all w-windows;
    * degenerate short sequences (< w hashes) winnow their single full
    * window. Parametric form shared with the strided duplicate-span
    * anchors (w = the stride).
    */
  private[graft] def winnowPositionsW(hs: Column, w: Int): Column = {
    val m = size(hs)
    val full = array_distinct(
      transform(sequence(lit(1), m - lit(w - 1)), i => rightmostMinPos(hs, i, w))
    )
    val short = array(
      (m + lit(1) - array_position(reverse(hs), array_min(hs)).cast("int")).cast("int")
    )
    when(m >= w, full).otherwise(short)
  }

  private[graft] def winnowPositions(hs: Column): Column = winnowPositionsW(hs, W)

  /** The DuckDB mirror of [[winnowPositionsW]] over a list expression
    * named `hsName`.
    */
  private[graft] def winnowPositionsSql(hsName: String, w: Int): String =
    s"""CASE WHEN len($hsName) >= $w THEN
       |      list_distinct(list_transform(range(1, len($hsName) - ${w - 2}),
       |        i -> i + $w - list_position(list_reverse($hsName[i : i + ${w - 1}]), list_min($hsName[i : i + ${w - 1}]))))
       |    ELSE [len($hsName) + 1 - list_position(list_reverse($hsName), list_min($hsName))]
       |    END""".stripMargin

  /** The selected fingerprint hash SET per document (spec-facing: the
    * registered query ships only its checksum).
    */
  private[graft] def fingerprintSets(input: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.MetadataFunctions.bindOnce
    input
      .select(
        col("doc_id"),
        bindOnce(TextFunctions.fingerprintHashes(col("text"), 8)) { hs =>
          array_distinct(transform(winnowPositions(hs), p => element_at(hs, p)))
        }.as("fps")
      )
  }

  /** Winnowed fingerprints of any (doc_id, text) input — factored for
    * specs.
    */
  def winnowOf(input: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.MetadataFunctions.bindOnce
    // bindOnce at BOTH levels: projection collapse would otherwise
    // inline the full hash-array expression into every per-window
    // slice — re-evaluating it once per window, O(n²) per document
    // (the textstats probe caught exactly that shape).
    input
      .select(
        col("doc_id"),
        bindOnce(TextFunctions.fingerprintHashes(col("text"), 8)) { hs =>
          bindOnce(winnowPositions(hs)) { pos =>
            struct(
              size(hs).cast("bigint").as("n_windows"),
              size(pos).cast("bigint").as("n_fp"),
              round(size(pos).cast("double") / size(hs), 4).as("density"),
              array_min(transform(pos, p => element_at(hs, p))).as("fp_min"),
              // Checksum mod a prime: raw hashes reach ~1.7e17, so a
              // plain sum overflows int64 on long documents (DuckDB
              // list_sum widens to HUGEINT and the cast back would be
              // a hard error).
              aggregate(
                transform(pos, p => element_at(hs, p) % lit(1000000007L)),
                lit(0L),
                (acc, h) => acc + h
              ).as("fp_sum")
            )
          }
        }.as("o")
      )
      .select(
        col("doc_id"),
        col("o.n_windows").as("n_windows"),
        col("o.n_fp").as("n_fp"),
        col("o.density").as("density"),
        col("o.fp_min").as("fp_min"),
        col("o.fp_sum").as("fp_sum")
      )
  }

  private val winnowQ = Q(
    "docs_winnowing",
    (s, d) => winnowOf(Tables.documents(s, d)),
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      val hs = TextFunctions.fingerprintHashesSql(norm)
      s"""WITH h AS (SELECT doc_id, $hs AS hs FROM documents),
         |p AS (
         |  SELECT doc_id, hs,
         |    CASE WHEN len(hs) >= $W THEN
         |      list_distinct(list_transform(range(1, len(hs) - ${W - 2}),
         |        i -> i + $W - list_position(list_reverse(hs[i : i + ${W - 1}]), list_min(hs[i : i + ${W - 1}]))))
         |    ELSE [len(hs) + 1 - list_position(list_reverse(hs), list_min(hs))]
         |    END AS pos
         |  FROM h)
         |SELECT doc_id,
         |  cast(len(hs) AS bigint) AS n_windows,
         |  cast(len(pos) AS bigint) AS n_fp,
         |  round(cast(len(pos) AS double) / len(hs), 4) AS density,
         |  cast(list_min(list_transform(pos, q -> hs[q])) AS bigint) AS fp_min,
         |  cast(list_sum(list_transform(pos, q -> hs[q] % 1000000007)) AS bigint) AS fp_sum
         |FROM p""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(winnowQ)
}
