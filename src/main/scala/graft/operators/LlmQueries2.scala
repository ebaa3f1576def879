package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions._
import graft.sources.LineMarc
import graft.sources.Iso2709.Subfield
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Second LLM-pipeline batch: text cleaning, embedding quantization, an
  * IVF-style ANN variant, and the line-based MARC codec round trip.
  */
object LlmQueries2 {

  /** Deterministic pseudo-centroid weight for (cell, dim), mirroring the
    * sign-LSH plane construction: one md5 hex char → [-7.5, 7.5].
    */
  private def centroidWeight(cell: Column, dim: Column): Column =
    conv(
      substring(md5(concat(lit("ivf"), cell.cast("string"), lit(":"), dim.cast("string"))), 1, 1),
      16,
      10
    ).cast("double") - 7.5

  /** Dot product of a vector with the generated centroid `cell`. */
  private[operators] def centroidDot(vec: Column, cell: Column): Column =
    aggregate(
      zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, d) => x.cast("double") * centroidWeight(cell, d)
      ),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** Deterministic PQ sub-codeword weight for (subspace, code, dim) —
    * same one-hex-char construction as [[centroidWeight]].
    */
  private def pqWeight(m: Column, c: Column, dd: Column): Column =
    conv(
      substring(
        md5(
          concat(
            lit("pq"),
            m.cast("string"),
            lit(":"),
            c.cast("string"),
            lit(":"),
            dd.cast("string")
          )
        ),
        1,
        1
      ),
      16,
      10
    ).cast("double") - 7.5

  private[operators] val PqSubspaces = 8
  private[operators] val PqSubDim = 8
  private[operators] val PqCodebook = 16

  /** Sequential-double dot product of subspace `m` of `vec` with
    * sub-codeword `c` — the ONE scoring expression both the encoder and
    * the ADC lookup tables build on: encode/search agreement depends on
    * the two sides computing bit-identical sums.
    */
  private[operators] def pqSubScore(vec: Column, m: Column, c: Column): Column =
    aggregate(
      zip_with(
        slice(vec, m * PqSubDim + 1, lit(PqSubDim)),
        sequence(lit(0), lit(PqSubDim - 1)),
        (x, dd) => x.cast("double") * pqWeight(m, c, dd)
      ),
      lit(0.0),
      (acc, v) => acc + v
    )

  /** PQ codes for every vector: (vec_id, sub 0-7, code 1-16) — each
    * 8-dim subspace encoded as the argmax-scoring of its 16 deterministic
    * sub-codewords. Shared by the encode query and the ADC search.
    */
  private[operators] def pqCodes(s: org.apache.spark.sql.SparkSession, d: String) =
    pqCodesOf(Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))

  /** PQ codes over any (vec_id, embedding) frame — shared with the
    * composed IVF-PQ search and its trained-centroid spec variant.
    */
  private[operators] def pqCodesOf(emb: org.apache.spark.sql.DataFrame) = {
    val scores = transform(
      sequence(lit(0), lit(PqCodebook - 1)),
      c => pqSubScore(col("embedding"), col("m"), c)
    )
    emb
      .select(col("vec_id"), explode(sequence(lit(0), lit(PqSubspaces - 1))).as("m"), col("embedding"))
      .select(
        col("vec_id"),
        col("m").cast("long").as("sub"),
        array_position(scores, array_max(scores)).as("code")
      )
  }

  /** IVF coarse assignment: index (1-based) of the highest-scoring of
    * `cells` deterministic centroids. The scale path for ANN: vectors
    * shuffle by cell, probes search one cell.
    */
  def ivfCell(vec: Column, cells: Int): Column = {
    val scores = transform(sequence(lit(0), lit(cells - 1)), c => centroidDot(vec, c))
    array_position(scores, array_max(scores))
  }

  /** DuckDB mirror of [[ivfCell]] over the embeddings table (8 cells):
    * CTEs ending at `b(vec_id, e, cell)` — shared by ann_ivf and the
    * cell-balance diagnostic.
    */
  private[operators] val IvfCellCteSql: String = {
    val weight =
      "(strpos('0123456789abcdef', substr(md5('ivf' || cast(c as varchar) || ':' || cast(dd - 1 as varchar)), 1, 1)) - 1 - 7.5)"
    val scores =
      s"list_transform(range(0, 8), c -> list_sum(list_transform(range(1, len(e) + 1), dd -> e[dd] * $weight)))"
    s"""t AS (SELECT vec_id, cast(embedding as double[]) AS e FROM embeddings),
       |b AS (SELECT vec_id, e, list_position(sc, list_max(sc)) AS cell
       |      FROM (SELECT vec_id, e, $scores AS sc FROM t) _s)""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q(
      "docs_clean",
      (s, d) => {
        val dirty = concat(
          col("text"),
          lit(" visit https://example.com/p/"),
          col("doc_id").cast("string"),
          lit(" or mail user"),
          col("doc_id").cast("string"),
          lit("@example.com now")
        )
        val noUrl = regexp_replace(dirty, "https?://[^ ]+", " ")
        val noMail = regexp_replace(noUrl, "[^ ]+@[^ ]+", " ")
        val cleaned = trim(regexp_replace(noMail, " {2,}", " "))
        Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            cleaned.as("cleaned"),
            (length(dirty) - length(cleaned)).as("removed_chars")
          )
      },
      Some(
        """WITH t AS (SELECT doc_id,
          |  text || ' visit https://example.com/p/' || cast(doc_id as varchar) || ' or mail user' || cast(doc_id as varchar) || '@example.com now' AS dirty
          |  FROM documents),
          |c AS (SELECT doc_id, dirty,
          |  trim(regexp_replace(regexp_replace(regexp_replace(dirty, 'https?://[^ ]+', ' ', 'g'), '[^ ]+@[^ ]+', ' ', 'g'), ' {2,}', ' ', 'g')) AS cleaned
          |  FROM t)
          |SELECT doc_id, cleaned, length(dirty) - length(cleaned) AS removed_chars FROM c""".stripMargin
      )
    ),
    Q(
      "embed_quantize",
      (s, d) => {
        val e = col("embedding")
        val scale = array_max(transform(e, x => abs(x.cast("double")))) / 127
        val q = transform(
          e,
          x =>
            when(scale === 0, lit(0))
              .otherwise(round(x.cast("double") / scale).cast("int"))
        )
        Tables
          .embeddings(s, d)
          .select(
            col("vec_id"),
            round(scale, 6).as("scale"),
            array_join(slice(q, 1, 8), ",").as("q8_head")
          )
      },
      Some(
        """WITH t AS (SELECT vec_id, cast(embedding as double[]) AS e FROM embeddings),
          |s AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) / 127 AS scale FROM t)
          |SELECT vec_id, round(scale, 6) AS scale,
          |  array_to_string(list_transform(e, x -> CASE WHEN scale = 0 THEN 0 ELSE cast(round(x / scale) as int) END)[1:8], ',') AS q8_head
          |FROM s""".stripMargin
      )
    ),
    Q(
      "ann_ivf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables
          .embeddings(s, d)
          .select(col("vec_id"), col("embedding"), ivfCell(col("embedding"), 8).as("cell"))
        val queries = emb
          .filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qvec"), col("cell"))
        val cand = emb
          .join(queries, Seq("cell"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            round(cosine(col("qvec"), col("embedding")), 6).as("score")
          )
        val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
        cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      },
      Some {
        s"""WITH $IvfCellCteSql,
           |q AS (SELECT vec_id AS query_id, e AS qvec, cell FROM b WHERE vec_id < 5),
           |cand AS (
           |  SELECT q.query_id, x.vec_id AS neighbor_id,
           |    round(list_dot_product(q.qvec, x.e) /
           |          (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(x.e, x.e))), 6) AS score
           |  FROM b x JOIN q ON x.cell = q.cell AND x.vec_id != q.query_id
           |),
           |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank FROM cand)
           |SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5""".stripMargin
      }
    ),
    Q(
      "linemarc_roundtrip",
      (s, d) => {
        import s.implicits._
        Tables
          .part(s, d)
          .select("p_partkey", "p_name", "p_type")
          .as[(Long, String, String)]
          .map { case (k, name, typ) =>
            val fields = Seq(
              Subfield("001", "", s"rec$k"),
              Subfield("245", "a", name),
              Subfield("245", "b", typ),
              Subfield("650", "a", typ)
            )
            val parsed = LineMarc.parse(LineMarc.build(fields))
            (
              k,
              parsed.find(f => f.tag == "245" && f.code == "a").map(_.value).getOrElse(""),
              parsed.size
            )
          }
          .toDF("record_id", "title", "n_fields")
      },
      Some(
        """SELECT p_partkey AS record_id, p_name AS title, 4 AS n_fields
          |FROM part""".stripMargin
      )
    ),
    // Product-quantization encode — the PQ half of an IVF-PQ index, the
    // standard layout for billion-vector ANN: the 64-dim vector splits
    // into 8 subspaces of 8 dims, each encoded as the argmax-scoring of
    // 16 deterministic sub-codewords (the same md5-derived construction
    // as the IVF cells; a trained variant would take KMeans.centroids
    // output per subspace instead). 64 floats compress to 8 nibbles —
    // 32× smaller, which is what makes the candidate-rerank table fit in
    // memory at corpus scale. Per-row map-only projection, no shuffle;
    // the encode stays inside one codegen stage over the scan.
    Q(
      "embed_pq_encode",
      (s, d) => pqCodes(s, d),
      Some {
        val weight =
          "(strpos('0123456789abcdef', substr(md5('pq' || cast(m as varchar) || ':' || cast(c as varchar) || ':' || cast(dd as varchar)), 1, 1)) - 1 - 7.5)"
        val scores =
          s"list_transform(range(0, 16), c -> list_sum(list_transform(range(0, 8), dd -> v[m*8 + dd + 1] * $weight)))"
        s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
           |s AS (SELECT vec_id, unnest(range(0, 8)) AS m, v FROM e),
           |sc AS (SELECT vec_id, m, $scores AS scores FROM s)
           |SELECT vec_id, cast(m as bigint) AS sub,
           |  cast(list_position(scores, list_max(scores)) as bigint) AS code
           |FROM sc""".stripMargin
      }
    ),
    // ADC (asymmetric-distance) top-k search over PQ codes — the query
    // half of IVF-PQ: each query vector precomputes an 8×16 lookup table
    // of subspace dot products against the codebook (640 doubles for 5
    // queries — broadcast), candidates are represented ONLY by their
    // 8-nibble codes, and a candidate's score is 8 table lookups summed.
    // Scale shape: the code table (32× smaller than the vectors)
    // broadcast-joins the per-query tables on the 8-key subspace column
    // — no shuffle of candidates — then one groupBy(query, candidate)
    // map-side-combined aggregate and a per-query top-k window. Scores
    // are integer micro-units (exact, order-independent), ties broken by
    // neighbor id, so the ranking is bit-deterministic.
    Q(
      "embed_pq_adc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val qs = Tables
          .embeddings(s, d)
          .filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        // Per-(query, subspace) lookup table: t_micro[c] = round(1e6 *
        // dot(q_sub, codeword(sub, c))) for the 16 codes.
        val lookup = qs
          .select(col("query_id"), explode(sequence(lit(0), lit(PqSubspaces - 1))).as("m"), col("qv"))
          .select(
            col("query_id"),
            col("m").cast("long").as("sub"),
            transform(
              sequence(lit(0), lit(PqCodebook - 1)),
              c => round(pqSubScore(col("qv"), col("m"), c) * 1e6).cast("long")
            ).as("tvals")
          )
        val scored = pqCodes(s, d)
          .join(broadcast(lookup), Seq("sub"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            expr("element_at(tvals, cast(code as int))").as("t_micro")
          )
          .groupBy("query_id", "neighbor_id")
          .agg(sum("t_micro").as("score_micro"))
        val w = Window.partitionBy("query_id").orderBy(col("score_micro").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
      },
      Some {
        val weight =
          "(strpos('0123456789abcdef', substr(md5('pq' || cast(m as varchar) || ':' || cast(c as varchar) || ':' || cast(dd as varchar)), 1, 1)) - 1 - 7.5)"
        val codeScores =
          s"list_transform(range(0, 16), c -> list_sum(list_transform(range(0, 8), dd -> v[m*8 + dd + 1] * $weight)))"
        val tEntry =
          s"list_sum(list_transform(range(0, 8), dd -> v[m*8 + dd + 1] * $weight))"
        s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
           |se AS (SELECT vec_id, unnest(range(0, 8)) AS m, v FROM e),
           |codes AS (SELECT vec_id, m AS sub, list_position(sc, list_max(sc)) AS code
           |  FROM (SELECT vec_id, m, $codeScores AS sc FROM se) _x),
           |q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
           |t AS (SELECT query_id, m AS sub, c, cast(round($tEntry * 1e6) as bigint) AS t_micro
           |  FROM q, range(0, 8) _m(m), range(0, 16) _c(c)),
           |sc2 AS (SELECT t.query_id, codes.vec_id AS neighbor_id, t.t_micro
           |  FROM codes JOIN t ON t.sub = codes.sub AND t.c = codes.code - 1
           |  WHERE codes.vec_id != t.query_id),
           |agg AS (SELECT query_id, neighbor_id, sum(t_micro) AS score_micro
           |  FROM sc2 GROUP BY query_id, neighbor_id),
           |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, neighbor_id) AS rank FROM agg)
           |SELECT query_id, neighbor_id, cast(score_micro as bigint) AS score_micro,
           |  cast(rank as bigint) AS rank
           |FROM r WHERE rank <= 5""".stripMargin
      }
    )
  )
}
