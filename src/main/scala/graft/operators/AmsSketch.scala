package graft.operators

import graft.Q
import org.apache.spark.sql.functions._

/** AMS second-frequency-moment sketch (Alon, Matias & Szegedy, STOC
  * 1996): F₂ = Σ_t f_t² of the corpus token distribution — the
  * repeat-rate / self-join-size statistic that prices every
  * token-keyed self-join (the all-pairs and LSH candidate volumes) and
  * measures corpus skew (F₂/T² is the collision probability of two
  * random tokens). The sketch keeps 16 integer registers
  * Z_j = Σ_t s_j(t)·f_t with deterministic ±1 hash signs; each Z_j² is
  * an unbiased F₂ estimator and the register mean is the estimate.
  *
  * Everything is a LONG: signs come from one md5 hex digit, register
  * sums and their squares are exact integer arithmetic — the estimate
  * is bit-identical across engines and partitionings (long addition
  * commutes; a float Z would not). Scale shape: one map-side-combined
  * token count, a 16-way register aggregation (bounded), and two
  * 1-row frames joined on a non-foldable constant key — the corpus
  * never reshuffles and nothing is ordered. The exact F₂ rides the
  * same token-count frame, so the output certifies the sketch's
  * per-mille error against truth in the same query.
  */
object AmsSketch {

  private val Registers = 16

  private val f2Q = Q(
    "corpus_f2_ams",
    (s, d) => {
      val toks = LlmQueries
        .corpus(s, d)
        .select(explode(graft.functions.TextFunctions.words(col("text"))).as("token"))
      val tf = toks.groupBy("token").agg(count(lit(1)).as("f")).persist()
      val sign = expr(
        "CASE WHEN instr('0123456789abcdef', substr(md5(concat('f2', cast(j as string), ':', token)), 1, 1)) - 1 < 8 THEN 1L ELSE -1L END"
      )
      val regs = tf
        .select(col("token"), col("f"), explode(sequence(lit(0), lit(Registers - 1))).as("j"))
        .withColumn("sgn", sign)
        .groupBy("j")
        .agg(sum(col("sgn") * col("f")).as("z"))
      // Floor division, not `/`: a float divide then cast would truncate
      // in Spark but ROUND in DuckDB — integer div floors in both.
      val est = regs
        .agg(expr(s"sum(z * z) div $Registers").as("est_f2"))
        .withColumn("k", lit(1) + col("est_f2") - col("est_f2"))
      val exact = tf
        .agg(sum(col("f") * col("f")).as("exact_f2"))
        .withColumn("k", lit(1) + col("exact_f2") - col("exact_f2"))
      est
        .join(exact, Seq("k"))
        .select(
          col("est_f2"),
          col("exact_f2"),
          expr("(1000 * abs(est_f2 - exact_f2)) div exact_f2").as("err_pm")
        )
    },
    Some {
      s"""WITH ${LlmQueries.CorpusSql},
         |tf AS (
         |  SELECT token, count(*) AS f
         |  FROM (SELECT unnest(string_split(${LlmQueries.normSql("text")}, ' ')) AS token FROM corpus)
         |  GROUP BY token),
         |regs AS (
         |  SELECT j, sum(CASE WHEN strpos('0123456789abcdef', substr(md5('f2' || cast(j as varchar) || ':' || token), 1, 1)) - 1 < 8 THEN f ELSE -f END) AS z
         |  FROM tf, (SELECT unnest(range(0, $Registers)) AS j)
         |  GROUP BY j),
         |est AS (SELECT cast(sum(z * z) // $Registers as bigint) AS est_f2 FROM regs),
         |exact AS (SELECT cast(sum(f * f) as bigint) AS exact_f2 FROM tf)
         |SELECT est_f2, exact_f2,
         |  cast((1000 * abs(est_f2 - exact_f2)) // exact_f2 as bigint) AS err_pm
         |FROM est, exact""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(f2Q)
}
