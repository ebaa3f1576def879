package graft

import graft.operators.KMeans
import org.apache.spark.sql.functions._

/** Lloyd-loop behavior of [[KMeans]]: the oracle certifies one step's
  * arithmetic; this drives the composed iterate-reseed loop and the
  * edge semantics a single step can't show.
  */
class KMeansSpec extends SparkSuite {

  import spark.implicits._

  // Two well-separated blobs around (0,0) and (10,10); seeds start inside
  // one blob each after the first reassignment even from poor positions.
  private def blobs = Seq(
    (0L, Array(0.1f, 0.2f)),
    (1L, Array(-0.1f, 0.1f)),
    (2L, Array(0.2f, -0.2f)),
    (3L, Array(10.1f, 9.9f)),
    (4L, Array(9.8f, 10.2f)),
    (5L, Array(10.0f, 10.0f))
  ).toDF("id", "vec")

  test("two Lloyd iterations separate the blobs and converge") {
    // Deliberately bad seeds: both in the low blob.
    val seeds0 = Seq(
      (0L, Array(0.1, 0.2)),
      (1L, Array(-0.1, 0.1))
    ).toDF("cell", "cv")

    val out1 = KMeans.step(blobs, seeds0)
    val cents1 = KMeans.centroids(out1)
    val out2 = KMeans.step(blobs, cents1)

    // After step 1, the far blob all lands on whichever seed is nearest —
    // one cell holds it; after reseeding, the two centroids split the
    // blobs 3/3.
    val sizes2 = out2
      .filter(col("dim") === 1)
      .select("cell", "n")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(sizes2.values.toSeq.sorted == Seq(3L, 3L), sizes2.toString)

    // Converged: centroids of step 2 equal the blob means (micro-units).
    val c2 = out2
      .select(col("cell"), col("dim"), col("s_micro"), col("n"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .map { case (cell, dim, s, n) => (cell, dim) -> (s.toDouble / (n * 1e6)) }
      .toMap
    val lowMean = Seq(0.1, -0.1, 0.2).map(_ / 3).sum // ≈ 0.0667
    val highMean = Seq(10.1, 9.8, 10.0).map(_ / 3).sum
    val cells = c2.keys.map(_._1).toSeq.distinct.sorted
    val (lowCell, highCell) =
      if (c2((cells.head, 1L)) < 5) (cells.head, cells.last) else (cells.last, cells.head)
    assert(math.abs(c2((lowCell, 1L)) - lowMean) < 1e-4)
    assert(math.abs(c2((highCell, 1L)) - highMean) < 1e-4)

    // A third step from converged centroids reproduces the same sums —
    // the fixpoint property a loop driver would test for.
    val out3 = KMeans.step(blobs, KMeans.centroids(out2))
    val s2 = out2.orderBy("cell", "dim").collect().toSeq
    val s3 = out3.orderBy("cell", "dim").collect().toSeq
    assert(s2 == s3)
  }

  test("argmin tie-break prefers the lowest cell id") {
    val emb = Seq((0L, Array(5.0f, 5.0f))).toDF("id", "vec")
    // Equidistant centroids.
    val seeds = Seq(
      (7L, Array(4.0, 5.0)),
      (3L, Array(6.0, 5.0))
    ).toDF("cell", "cv")
    val cell = KMeans.step(emb, seeds).select("cell").as[Long].head()
    assert(cell == 3L)
  }

  test("empty cells vanish from the output rather than emitting nulls") {
    val emb = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(0.1f, 0.1f))).toDF("id", "vec")
    val seeds = Seq(
      (0L, Array(0.0, 0.0)),
      (1L, Array(100.0, 100.0))
    ).toDF("cell", "cv")
    val out = KMeans.step(emb, seeds)
    assert(out.select("cell").distinct().as[Long].collect().toSeq == Seq(0L))
  }

  test("native argmin kernel matches the composed HOF specification") {
    // Real float vectors from the testdata, 16 centroids from the same
    // table — equality must hold bit-for-bit, including tie handling.
    // Production wiring (centroidsRow + nearestCell), so the equality
    // claim covers exactly what KMeans.step executes.
    val emb = Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val seeds = emb.filter(col("id") < 16).select(col("id").as("cell"), col("vec").as("cv"))
    val both = emb
      .withColumn("j", (size(col("vec")) * 0 + 1).cast("int"))
      .join(broadcast(KMeans.centroidsRow(seeds)), Seq("j"))
      .select(
        col("id"),
        KMeans.nearestCell(col("vec"), col("cents")).as("native"),
        KMeans.nearestCellHof(col("vec"), col("cents")).as("hof")
      )
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("native kernel skips length-mismatched centroids like the HOF form") {
    val emb = Seq((0L, Array(1.0f, 1.0f))).toDF("id", "vec")
    // Cell 0's centroid has the wrong dimensionality (would win with a
    // truncated distance); cell 9 is well-formed and must be chosen.
    val seeds = Seq(
      (0L, Array(1.0)),
      (9L, Array(5.0, 5.0))
    ).toDF("cell", "cv")
    val joined = emb
      .withColumn("j", (size(col("vec")) * 0 + 1).cast("int"))
      .join(broadcast(KMeans.centroidsRow(seeds)), Seq("j"))
      .select(
        KMeans.nearestCell(col("vec"), col("cents")).as("native"),
        KMeans.nearestCellHof(col("vec"), col("cents")).as("hof")
      )
      .head()
    assert(joined.getLong(0) == 9L)
    assert(joined.getLong(1) == 9L)
  }

  test("the broadcast join is a hash join, not a nested loop") {
    val plan = KMeans
      .step(blobs, Seq((0L, Array(0.0, 0.0))).toDF("cell", "cv"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
