package graft

/** Persisted-model certification: every stored-model twin must be
  * row-identical to its literal-embedded sibling — the parquet round
  * trip of the model (merge table / weights+scaler / vocabulary / both
  * ANN quantizers) loses nothing. The DuckDB oracle gate re-certifies
  * the same identity against the shared oracle SQL; this spec pins it
  * engine-side on sf0.001.
  */
class ModelStoreSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("every stored-model twin is row-identical to its literal sibling") {
    val pairs = Seq(
      "docs_bpe_encode_stored" -> "docs_bpe_encode",
      "docs_classifier_score_stored" -> "docs_classifier_score",
      "docs_unigram_viterbi_stored" -> "docs_unigram_viterbi",
      "embed_ivfpq_search_stored" -> "embed_ivfpq_search_trained",
      // r12 families
      "docs_kn_score_stored" -> "docs_kn_score",
      "docs_stupid_backoff_stored" -> "docs_stupid_backoff",
      "docs_dsir_weight_stored" -> "docs_dsir_weight",
      "embed_pca_stored" -> "embed_pca_power",
      "embed_centroid_classify_stored" -> "embed_centroid_classify"
    )
    for ((stored, literal) <- pairs) {
      val a = SparkEntry.queries(stored)(spark, sf).collect().map(_.toString).sorted
      val b = SparkEntry.queries(literal)(spark, sf).collect().map(_.toString).sorted
      assert(a.nonEmpty, s"$stored returned no rows")
      assert(a.sameElements(b), s"$stored differs from $literal")
      spark.catalog.clearCache()
    }
  }

  test("FS-EM scoring from stored params separates full-agree from full-disagree patterns") {
    // the 6th family has no literal twin (it IS the new inference face);
    // the oracle re-derives the params — here we pin the semantics.
    val rows = SparkEntry.queries("dedup_fs_score_stored")(spark, sf).collect()
    assert(rows.nonEmpty)
    // blocking guarantees some agreement, so compare the least- and
    // most-agreeing patterns actually present
    val minAgree = rows.minBy(r => (0 until 5).count(r.getBoolean))
    val maxAgree = rows.maxBy(r => (0 until 5).count(r.getBoolean))
    assert(
      minAgree.getAs[Long]("weight_mu") < maxAgree.getAs[Long]("weight_mu"),
      "weight must increase with field agreement"
    )
    assert(
      minAgree.getAs[Long]("post_mu") <= maxAgree.getAs[Long]("post_mu"),
      "posterior must not decrease with field agreement"
    )
    // any pattern with MORE agreements than another must not score lower posterior
    val byAgree = rows
      .groupBy(r => (0 until 5).count(r.getBoolean))
      .view
      .mapValues(_.map(_.getAs[Long]("post_mu")))
    for (k <- byAgree.keys if byAgree.contains(k + 2))
      assert(
        byAgree(k).min <= byAgree(k + 2).max + 1,
        s"posterior not broadly increasing in agreement count at $k"
      )
  }

  test("the model tables themselves are bounded (KB-scale) parquet") {
    // guards the scale claim: models must stay vocab/K×D-bounded —
    // a corpus-sized 'model' write would be a silent design regression.
    SparkEntry.queries("embed_ivfpq_search_stored")(spark, sf).collect()
    // modelDir is per-JVM since r12 (graft_models/<runToken>/<sf-key>) —
    // locate every run's dir for this SF and bound EACH (a sum across
    // stale runs of other JVMs would not measure one model set).
    val root = new java.io.File(s"${System.getProperty("java.io.tmpdir")}/graft_models")
    val key = sf.replaceAll("[^A-Za-z0-9]", "_")
    val dirs = Option(root.listFiles())
      .getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(t => new java.io.File(t, key))
      .filter(_.isDirectory)
    assert(dirs.nonEmpty, "model directory missing")
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(sizeOf).sum else f.length()
    dirs.foreach { dir =>
      val mb = sizeOf(dir) / 1048576.0
      assert(mb < 8.0, f"model tables unexpectedly large: $dir $mb%.1f MiB")
    }
  }
}
