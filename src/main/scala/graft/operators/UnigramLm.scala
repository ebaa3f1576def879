package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram model): mine a substring piece vocabulary
  * from corpus statistics, then VITERBI-segment every distinct word —
  * the other real-world subword algorithm next to the registry's BPE
  * train/encode pair ([[Bpe]]). Where BPE greedily merges, unigram-LM
  * scores every segmentation by Σ log p(piece) and takes the argmax;
  * this operator certifies exactly that E-step (the inner loop of
  * Kudo's EM and of SentencePiece inference).
  *
  * Scale shapes:
  *  - piece mining: word-frequency table (vocab-bounded) → substring
  *    occurrences (≤ MaxPieceLen per position — bounded fanout) →
  *    piece counts keyed on piece content, map-side combined. Single
  *    characters are ALWAYS kept (the SentencePiece segmentability
  *    invariant); multi-char pieces need corpus count ≥ MinCount.
  *  - Viterbi runs per DISTINCT word (never per token — the word
  *    frequency carries the corpus mass), and the whole DP is ONE
  *    in-row fold over the word's piece edges: state = the 17-slot
  *    best-score array, edges sorted by (end, start) so every
  *    predecessor slot is final before use. No join, no window, no
  *    driver loop — a 100-TB corpus segments in one vocab-keyed join
  *    plus one map pass.
  *
  * Engine determinism: piece log-probs are round(1e6·ln(c/total)) of
  * exact integer ratios; the DP state packs (score, n_pieces) into ONE
  * int64 — packed = score·64 + (63 − n_pieces), so max() simultaneously
  * maximizes score and tie-breaks to FEWER pieces — and every DP
  * transition is integer addition (cand = best[j] + lp·64 − 1), so the
  * fold is exact in both engines; DuckDB replays it with list_reduce
  * over the same sorted edge list, seeded by prepending the init state.
  */
object UnigramLm {

  private val MaxWordLen = 16
  private val MaxPieceLen = 4
  private val MinCount = 5

  /** Unreachable-slot sentinel (any candidate through it stays far
    * below Guard).
    */
  private val Sent = -(1L << 60)
  private val Guard = -(1L << 59)

  /** Packed init: slot 0 = score 0, 0 pieces → 0·64 + 63. */
  private val Init0 = 63L

  private def wordsOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(Retrieval.tokens).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .filter(length(col("word")).between(1, MaxWordLen))

  /** Substring occurrences of each distinct word: one row per (word,
    * end i, piece length pl), with the 0-based start j = i − pl.
    */
  private def occurrencesOf(wf: DataFrame): DataFrame =
    wf.select(
        col("word"),
        col("cnt"),
        explode(
          flatten(
            transform(
              sequence(lit(1), length(col("word"))),
              i =>
                transform(
                  sequence(lit(1), least(lit(MaxPieceLen), i)),
                  pl => struct(i.as("i"), pl.as("pl"))
                )
            )
          )
        ).as("o")
      )
      .select(
        col("word"),
        col("cnt"),
        col("o.i").as("i"),
        col("o.pl").as("pl"),
        expr("substr(word, o.i - o.pl + 1, o.pl)").as("piece"),
        (col("o.i") - col("o.pl")).as("j")
      )

  /** Mined vocabulary: piece, corpus count, integer micro log-prob. */
  def vocabOf(docs: DataFrame): DataFrame = vocabOfWf(wordsOf(docs))

  private def vocabOfWf(wf: DataFrame): DataFrame = {
    val occ = occurrencesOf(wf)
    val pc = occ.groupBy("piece").agg(sum("cnt").as("pc"))
    val kept = pc.filter(length(col("piece")) === 1 || col("pc") >= MinCount)
    val tot = kept.agg(sum("pc").as("tp"))
    kept
      .withColumn("j", (col("pc") - col("pc") + 1).cast("int"))
      .join(
        broadcast(tot.select((col("tp") - col("tp") + 1).cast("int").as("j"), col("tp"))),
        Seq("j")
      )
      .select(
        col("piece"),
        col("pc"),
        round(log(col("pc").cast("double") / col("tp").cast("double")) * 1e6)
          .cast("long")
          .as("lp_mu")
      )
  }

  /** Viterbi-segment every distinct word under the mined vocab. */
  def viterbiOf(docs: DataFrame): DataFrame = {
    // localCheckpoint (vocab-bounded frame), not persist: both the edge
    // and the vocab branch of the ONE returned plan read it, and the
    // context cleaner releases checkpoint blocks once the frame is
    // unreferenced — no cache entry outlives the query.
    val wf = wordsOf(docs).localCheckpoint()
    val occ = occurrencesOf(wf)
    val vocab = vocabOfWf(wf).select("piece", "lp_mu")
    val edges = occ
      .join(vocab, Seq("piece"))
      .select(col("word"), col("cnt"), col("i"), col("j"), col("lp_mu").as("lp"))
    val init = typedLit(Init0 +: Seq.fill(MaxWordLen)(Sent))
    val step = (best: Column, e: Column) =>
      transform(
        sequence(lit(0), lit(MaxWordLen)),
        k => {
          val cur = element_at(best, k + 1)
          val prev = element_at(best, e.getField("j") + 1)
          val cand = when(prev > Guard, prev + e.getField("lp") * 64 - 1).otherwise(lit(Sent))
          when(k === e.getField("i"), greatest(cur, cand)).otherwise(cur)
        }
      )
    edges
      .groupBy("word", "cnt")
      .agg(sort_array(collect_list(struct(col("i"), col("j"), col("lp")))).as("es"))
      .withColumn("best", aggregate(col("es"), init, step))
      .select(
        col("word"),
        col("cnt"),
        length(col("word")).cast("long").as("wlen"),
        element_at(col("best"), length(col("word")) + 1).as("fin")
      )
      .filter(col("fin") > Guard)
      .withColumn("r", pmod(col("fin"), lit(64L)))
      .select(
        col("word"),
        col("cnt"),
        col("wlen"),
        (lit(63L) - col("r")).as("n_pieces"),
        expr("(fin - r) div 64").as("score_mu")
      )
  }

  /** Shared oracle CTEs up to the vocabulary. */
  private def vocabCtes: String =
    s"""base AS (SELECT ${Retrieval.NormSql} AS ws FROM documents),
       |wf AS (
       |  SELECT word, count(*) AS cnt
       |  FROM (SELECT unnest(ws) AS word FROM base) _t
       |  WHERE length(word) BETWEEN 1 AND $MaxWordLen GROUP BY 1),
       |o1 AS (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS i FROM wf),
       |o2 AS (SELECT word, cnt, i, unnest(range(1, least($MaxPieceLen, i) + 1)) AS pl FROM o1),
       |occ AS (
       |  SELECT word, cnt, i, pl, substr(word, i - pl + 1, pl) AS piece, i - pl AS j
       |  FROM o2),
       |pcnt AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS pc FROM occ GROUP BY 1),
       |kept AS (SELECT * FROM pcnt WHERE length(piece) = 1 OR pc >= $MinCount),
       |tp AS (SELECT CAST(sum(pc) AS BIGINT) AS tp FROM kept),
       |vocab AS (
       |  SELECT piece, pc,
       |    CAST(round(ln(CAST(pc AS double) / CAST(tp AS double)) * 1e6) AS BIGINT) AS lp_mu
       |  FROM kept, tp)""".stripMargin

  private val vocabQ = Q(
    "docs_unigram_vocab",
    (s, d) => vocabOf(Tables.documents(s, d)),
    Some(s"""WITH $vocabCtes
            |SELECT piece, pc, lp_mu FROM vocab""".stripMargin)
  )

  private val viterbiQ = Q(
    "docs_unigram_viterbi",
    (s, d) => viterbiOf(Tables.documents(s, d)),
    Some {
      val n = MaxWordLen + 1
      val initList =
        (Init0 +: Seq.fill(MaxWordLen)(Sent)).map(v => s"CAST($v AS BIGINT)").mkString("[", ", ", "]")
      s"""WITH $vocabCtes,
         |edges AS (
         |  SELECT o.word, o.cnt, o.i, o.j, v.lp_mu AS lp
         |  FROM occ o JOIN vocab v USING (piece)),
         |ew AS (
         |  SELECT word, any_value(cnt) AS cnt,
         |    list([CAST(i AS BIGINT), CAST(j AS BIGINT), lp] ORDER BY i, j) AS es
         |  FROM edges GROUP BY word),
         |folded AS (
         |  SELECT word, cnt, length(word) AS wlen,
         |    list_reduce(
         |      list_prepend($initList, es),
         |      (acc, e) -> list_transform(range(0, $n),
         |        k -> CASE WHEN k = e[1]
         |          THEN greatest(acc[k + 1],
         |            CASE WHEN acc[e[2] + 1] > $Guard
         |              THEN acc[e[2] + 1] + e[3] * 64 - 1 ELSE $Sent END)
         |          ELSE acc[k + 1] END)) AS best
         |  FROM ew),
         |fin AS (
         |  SELECT word, cnt, CAST(wlen AS BIGINT) AS wlen, best[wlen + 1] AS fin
         |  FROM folded WHERE best[wlen + 1] > $Guard)
         |SELECT word, cnt, wlen,
         |  63 - ((fin % 64) + 64) % 64 AS n_pieces,
         |  (fin - (((fin % 64) + 64) % 64)) // 64 AS score_mu
         |FROM fin""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(vocabQ, viterbiQ)
}
