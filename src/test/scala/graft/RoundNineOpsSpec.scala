package graft

/** Round-9 operators: unsupervised Fellegi-Sunter EM, the promoted
  * join-property corpus rows, retrieval reranking, strided duplicate
  * spans.
  */
class RoundNineOpsSpec extends SparkSuite {

  test("Fellegi-Sunter EM separates match-discriminating fields unsupervised") {
    import spark.implicits._
    // Three cross-source candidate pairs agree on author+year (true
    // duplicates), three agree on neither (same title block only). EM
    // sees only the agreement patterns — no veto-chain labels — and must
    // still learn m_author >> u_author while the always-agreeing title
    // stays uninformative (m ≈ u → weight ≈ 0).
    val recs = (1 to 3).flatMap { i =>
      Seq(
        (s"a.m$i", "a", s"Shared Title $i", "carson rachel", 1960 + i, ""),
        (s"b.m$i", "b", s"Shared Title $i", "carson rachel", 1960 + i, ""),
        (s"a.n$i", "a", s"Other Title $i", s"author a$i", 1900 + i, ""),
        (s"b.n$i", "b", s"Other Title $i", s"author b$i", 1800 + i, "")
      )
    }.toDF("id", "source_id", "title", "author", "year", "isbn")
    val out = operators.BlockingEval
      .fsEmOf(operators.Dedup.withKeys(recs))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val author = out("author")
    val title = out("title")
    assert(author.getAs[Long]("m_mu") > 90000000L, author)
    assert(author.getAs[Long]("u_mu") < 10000000L, author)
    assert(author.getAs[Double]("weight") > 1.0, author)
    // Title agrees on every candidate pair in both classes: weight ~ 0.
    assert(math.abs(title.getAs[Double]("weight")) < 0.1, title)
    // Half the candidate pairs are matches.
    val p = author.getAs[Long]("p_mu")
    assert(p > 30000000L && p < 70000000L, p)
  }

  test("EM census treats null agreement flags as disagreement") {
    import spark.implicits._
    // year = null on one side → f_year is SQL-null; the census must fold
    // it into the false group rather than a third pattern value.
    val recs = Seq(
      ("a.1", "a", "Same Book", "same author", Some(1960), ""),
      ("b.1", "b", "Same Book", "same author", None: Option[Int], "")
    ).toDF("id", "source_id", "title", "author", "year", "isbn")
    val out = operators.BlockingEval
      .fsEmOf(operators.Dedup.withKeys(recs))
      .collect()
    assert(out.length == 5) // exactly one row per field, no crash
  }

  test("rerank promotes coverage and early matches over one-term tf spam") {
    import spark.implicits._
    // doc 1: "spark" repeated — the one-term-spam BM25 loves (rare-term
    // tf saturates high). doc 2: all three query-1 terms, early — but
    // "stream"/"window" also sit in every filler, so their idf is near
    // zero and raw BM25 still puts the spam doc first. The rerank
    // coverage boost must put doc 2 first anyway.
    val spam = Seq.fill(40)("spark").mkString(" ")
    val docs = (Seq(
      (1L, spam, "en"),
      (2L, "spark stream window analytics pipeline", "en")
    ) ++ (3L to 30L).map(i => (i, s"filler stream window text number $i", "de")))
      .toDF("doc_id", "text", "lang")
    val out = operators.Rerank
      .rerankOf(docs)
      .filter($"query_id" === 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out(1L).getAs[Long]("bm25_rank") == 1L, out(1L))
    assert(out(2L).getAs[Long]("rr_rank") == 1L, out(2L))
    assert(out(2L).getAs[Long]("n_matched") == 3L)
    assert(out(2L).getAs[Long]("first_pos") == 0L)
    assert(out(1L).getAs[Long]("n_matched") == 1L)
  }

  test("telescoping eval: rerank recall is never below raw BM25 recall") {
    val rows = operators.Rerank
      .rerankEvalOf(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(
        r.getAs[Long]("hits_rerank") >= r.getAs[Long]("hits_bm25"),
        r.toString
      )
    }
  }

  test("strided spans detect a planted G+S-1 duplicate across unaligned copies") {
    import spark.implicits._
    // 47 chars = G+S-1: the winnowing guarantee's minimum length. The
    // two copies sit at offsets 26 and 5 (difference not a multiple of
    // the stride), the case naive positional striding would miss.
    val payload = ("PLANTED0001SPAN" + "x" * 40).take(47)
    val fillerA = (1 to 40).map(i => s"alpha$i").mkString("")
    val fillerB = (1 to 40).map(i => s"beta$i").mkString("")
    val docs = Seq(
      (1L, fillerA.take(26) + payload + fillerA.drop(26)),
      (2L, fillerB.take(5) + payload + fillerB.drop(5)),
      (3L, (1 to 40).map(i => s"gamma$i").mkString(""))
    ).toDF("doc_id", "text")
    val spans = operators.CurationQueries.stridedSpansOf(docs).collect()
    def covers(docId: Long, p: Int): Boolean = spans.exists { r =>
      r.getAs[Long]("doc_id") == docId &&
      r.getAs[Long]("span_start") <= p + 46 && r.getAs[Long]("span_end") >= p
    }
    assert(covers(1L, 27), spans.mkString("; "))
    assert(covers(2L, 6), spans.mkString("; "))
    // The unduplicated doc must stay span-free.
    assert(!spans.exists(_.getAs[Long]("doc_id") == 3L))
    // Detected spans never extend beyond the payload into distinct
    // filler by more than a gram length (anchors are real duplicates).
    spans.filter(_.getAs[Long]("doc_id") == 1L).foreach { r =>
      assert(r.getAs[Long]("span_start") >= 27 && r.getAs[Long]("span_end") <= 27 + 46)
    }
  }

  test("power iteration recovers a planted dominant direction") {
    import spark.implicits._
    // Planted spectrum: x_i = t_i·u + deterministic small noise. The
    // testdata embeddings are near-isotropic (top-2 singular ratio
    // ~1.006), so convergence must be certified on a corpus that HAS a
    // dominant direction.
    val dim = 64
    val u = Array.tabulate(dim)(j => if (j % 2 == 0) 0.125 else -0.125)
    val rows = (1 to 200).map { i =>
      val t = (i % 21) - 10.0
      val noise = Array.tabulate(dim)(j => ((i * 31 + j * 17) % 7 - 3) * 0.01)
      (i.toLong, Array.tabulate(dim)(j => (t * u(j) + noise(j)).toFloat).toSeq)
    }
    val embs = rows.toDF("vec_id", "embedding")
    val v = operators.PcaPower
      .pcaOf(embs)
      .orderBy("dim")
      .collect()
      .map(_.getAs[Long]("v_mu").toDouble)
    val nv = math.sqrt(v.map(x => x * x).sum)
    val cos = math.abs(v.zip(u).map { case (a, b) => a * b }.sum / (nv * 0.125 * 8))
    assert(cos > 0.99, s"cos=$cos")
    assert(math.abs(nv - 1e6) < 2.0, nv)
  }

  test("nearest-centroid classification separates planted classes") {
    import spark.implicits._
    val dim = 64
    val rows = (1 to 200).map { i =>
      val label = i % 2
      val sign = if (label == 0) 1.0 else -1.0
      val noise = Array.tabulate(dim)(j => ((i * 13 + j * 7) % 5 - 2) * 0.02)
      (i.toLong, Array.tabulate(dim)(j => (sign * 0.5 + noise(j)).toFloat).toSeq, label)
    }
    val out = operators.CentroidClassify
      .confusionOf(rows.toDF("vec_id", "embedding", "label"))
      .collect()
    assert(out.nonEmpty)
    // Perfectly separable by construction: the confusion matrix must be
    // diagonal.
    out.foreach(r => assert(r.getAs[Long]("label") == r.getAs[Long]("pred"), r))
  }

  test("readability counts and scores match hand computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("read9").toString
    Seq((1L, "The cat sat. The dog ran.", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("docs_readability")(spark, dir).collect().head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    val fk = math.round((0.39 * 3.0 + 11.8 * 1.0 - 15.59) * 1e4)
    val fre = math.round((206.835 - 1.015 * 3.0 - 84.6 * 1.0) * 1e4)
    assert(r.getAs[Long]("fk_grade_qm") == fk)
    assert(r.getAs[Long]("fre_qm") == fre)
  }

  test("RM3 expansion recovers a vocabulary-mismatch document") {
    import spark.implicits._
    // Feedback docs co-occur the query-1 terms with "analytics"; doc 50
    // contains ONLY "analytics" — zero original terms, invisible to
    // BM25 and to any first-pass reranker, retrievable only through
    // expansion.
    val docs = ((1L to 8L).map(i =>
      (i, s"spark stream window analytics analytics study $i", "en")
    ) :+ (50L, "analytics analytics analytics quarterly report", "en"))
      .++((60L to 90L).map(i => (i, s"unrelated filler text number $i", "de")))
      .toDF("doc_id", "text", "lang")
    val exp = operators.QueryExpansion
      .expandedTerms(docs)
      .filter($"query_id" === 1)
      .collect()
    assert(exp.exists(_.getAs[String]("term") == "analytics"), exp.mkString("; "))
    // Expansion terms never repeat the original query terms.
    val orig = graft.operators.Retrieval.SearchQueries.toMap.apply(1).toSet
    assert(exp.forall(r => !orig.contains(r.getAs[String]("term"))))
    val rm3Docs = operators.QueryExpansion
      .rm3SearchOf(docs)
      .filter($"query_id" === 1)
      .collect()
      .map(_.getAs[Long]("doc_id"))
      .toSet
    val bm25Docs = operators.Retrieval
      .bm25Of(docs)
      .filter($"query_id" === 1)
      .collect()
      .map(_.getAs[Long]("doc_id"))
      .toSet
    assert(!bm25Docs.contains(50L))
    assert(rm3Docs.contains(50L), rm3Docs)
  }

  test("transitivity is exactly 1 on K4 and 0 on a path") {
    import spark.implicits._
    val k4 = (for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)).toDF("doc_a", "doc_b")
    val r = operators.GraphMetrics.transitivityOf(k4).collect().head
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Long]("transitivity_pm") == 10000L)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val p = operators.GraphMetrics.transitivityOf(path).collect().head
    assert(p.getAs[Long]("n_triangles") == 0L)
    assert(p.getAs[Long]("transitivity_pm") == 0L)
  }

  test("2-core keeps the triangle and fully peels the star") {
    import spark.implicits._
    // Star: hub 10 with leaves 11-15 (all leaves deg 1 → peel; hub then
    // isolated → peel). Triangle 1-2-3 survives with core degree 2.
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++
      (11L to 15L).map(l => (10L, l))).toDF("doc_a", "doc_b")
    val rows = operators.GraphMetrics.kcoreOf(edges).collect()
    val core = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("core_deg")).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core)
    // Telemetry: round 1 peels the star, round 2 re-proves the triangle
    // stable — converged at rounds_used = 2.
    rows.foreach { r =>
      assert(r.getAs[Long]("converged") == 1L)
      assert(r.getAs[Long]("rounds_used") == 2L)
    }
  }

  test("k-core telemetry flags a peeling cascade deeper than the round budget") {
    import spark.implicits._
    // A 30-vertex path peels 2 endpoints per round: 14 rounds to drain,
    // so the 12-round budget leaves a 6-vertex residue whose interior
    // still has degree 2 — the output is a SUPERSET of the true (empty)
    // 2-core and must say so via converged = 0, rounds_used = 12.
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val rows = operators.GraphMetrics.kcoreOf(chain).collect()
    assert(rows.nonEmpty, "the truncated peel should leave a residue")
    rows.foreach { r =>
      assert(r.getAs[Long]("converged") == 0L)
      assert(r.getAs[Long]("rounds_used") == 12L)
    }
    // With enough rounds the same chain converges to the empty 2-core.
    val full = operators.GraphMetrics.kcoreOf(chain, rounds = 16).collect()
    assert(full.isEmpty, full.mkString(","))
  }

  test("Mann-Kendall flags a strict ramp and stays silent on a constant") {
    import spark.implicits._
    val ramp = (1 to 20).map(i => ("a", f"2026-01-$i%02d", i.toLong))
    val const = (1 to 20).map(i => ("b", f"2026-01-$i%02d", 7L))
    val out = operators.TrendQueries
      .mannKendallOf((ramp ++ const).toDF("event_type", "day", "n"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val a = out("a")
    assert(a.getAs[Long]("s_stat") == 190L) // n(n-1)/2 strict increases
    assert(a.getAs[String]("trend") == "increasing")
    val b = out("b")
    assert(b.getAs[Long]("s_stat") == 0L)
    // All 20 values tied: the tie correction empties the variance.
    assert(b.getAs[Long]("var_num") == 0L)
    assert(b.isNullAt(b.fieldIndex("z_qm")))
    assert(b.getAs[String]("trend") == "none")
  }

  test("event transitions count adjacent pairs per user with exact shares") {
    import spark.implicits._
    // user 1: a→b→a ; user 2: a→b. Transitions: a→b ×2, b→a ×1.
    val e = Seq(
      (1L, 1L, 10L, "a"),
      (2L, 1L, 20L, "b"),
      (3L, 1L, 30L, "a"),
      (4L, 2L, 10L, "a"),
      (5L, 2L, 20L, "b")
    ).toDF("event_id", "user_id", "us", "event_type")
    val out = operators.TransitionQueries
      .transitionsOf(e)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Long]("n"), r.getAs[Long]("p_pm")))
      .toMap
    assert(out(("a", "b")) == ((2L, 10000L)))
    assert(out(("b", "a")) == ((1L, 10000L)))
    assert(out.size == 2)
  }

  test("event transitions stitch day boundaries exactly (de-skewed segment window)") {
    import spark.implicits._
    val day = 86400000000L
    // user 1 spans FOUR days with a two-day gap: a(d0 end) → b(d1
    // start) → b(d1 end) → c(d3). The within-day window sees only
    // b→b; a→b and b→c exist only via the boundary stitch (including
    // across the EMPTY day 2). user 2 is single-day control.
    val e = Seq(
      (1L, 1L, day - 1L, "a"),
      (2L, 1L, day + 5L, "b"),
      (3L, 1L, 2L * day - 1L, "b"),
      (4L, 1L, 3L * day + 7L, "c"),
      (5L, 2L, 10L, "a"),
      (6L, 2L, 20L, "c")
    ).toDF("event_id", "user_id", "us", "event_type")
    val out = operators.TransitionQueries
      .transitionsOf(e)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    assert(out == Map(("a", "b") -> 1L, ("b", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 1L), out)
  }

  test("utf8 audit counts planted control and zero-width characters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("utf9").toString
    Seq(
      (1L, "clean text here", "en", "s"),
      (2L, "bad" + 0x07.toChar + "text" + 0xfffd.toChar + "with" + 0x200b.toChar +
        "junk" + 0x200b.toChar, "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("docs_utf8_audit")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(out(1L).getAs[Boolean]("clean"))
    val bad = out(2L)
    assert(bad.getAs[Long]("n_control") == 1L)
    assert(bad.getAs[Long]("n_replacement") == 1L)
    assert(bad.getAs[Long]("n_zero_width") == 2L)
    assert(!bad.getAs[Boolean]("clean"))
  }

  test("unigram Viterbi prefers the whole-word piece when its mass dominates") {
    import spark.implicits._
    // Corpus: "ab"×6, "c"×1. Pieces: a/b/c singles + "ab" (count 6 ≥
    // MinCount). tp = 19. ln p(ab) > ln p(a)+ln p(b), so "ab" segments
    // as ONE piece with score round(1e6·ln(6/19)).
    val docs = Seq((1L, "ab ab ab ab ab ab c")).toDF("doc_id", "text")
    val out = operators.UnigramLm
      .viterbiOf(docs)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    def mu(x: Double): Long =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val ab = out("ab")
    assert(ab.getAs[Long]("n_pieces") == 1L, ab)
    assert(ab.getAs[Long]("score_mu") == mu(math.log(6.0 / 19)), ab)
    val c = out("c")
    assert(c.getAs[Long]("n_pieces") == 1L)
    assert(c.getAs[Long]("score_mu") == mu(math.log(1.0 / 19)))
    // Vocabulary: exactly the three singles + "ab".
    val vocab = operators.UnigramLm.vocabOf(docs).collect().map(_.getString(0)).toSet
    assert(vocab == Set("a", "b", "c", "ab"))
  }

  test("BMP pixel decoder matches JDK ImageIO on the same bytes") {
    import org.apache.spark.sql.functions.col
    val media = operators.Multimodal
      .bmpTable(spark, "/root/testdata/sf0.001")
      .filter(col("media_id") < 12)
      .persist()
    val ours = operators.Multimodal
      .bmpPixelStats(media)
      .collect()
      .map(r => r.getAs[Long]("media_id") -> r)
      .toMap
    val rows = media.collect()
    assert(rows.nonEmpty && ours.nonEmpty)
    rows.foreach { row =>
      val id = row.getAs[Long]("media_id")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("payload"))
      )
      assert(img != null, s"ImageIO rejected payload $id")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
      }
      val o = ours(id)
      assert(o.getAs[Long]("w") == w.toLong && o.getAs[Long]("h") == h.toLong, o)
      assert(o.getAs[Long]("mean_r_c") == sr * 100 / (w * h), s"$id r")
      assert(o.getAs[Long]("mean_g_c") == sg * 100 / (w * h), s"$id g")
      assert(o.getAs[Long]("mean_b_c") == sb * 100 / (w * h), s"$id b")
    }
  }

  test("promoted join-property corpus is non-trivial and matches brute force") {
    import spark.implicits._
    val corpus = operators.JoinQueries.propertyCorpus(1L, 40)
    // The certification is vacuous unless the corpus exercises the risky
    // shapes: band pairs exist, and (user, us) ties exist.
    val pairs = for {
      p <- corpus if p._4 == "purchase"
      c <- corpus
      if c._4 == "click" && c._2 == p._2 &&
        c._3 >= p._3 - 1800000000L && c._3 < p._3
    } yield (p._1, c._1)
    assert(pairs.size >= 5, s"only ${pairs.size} band pairs")
    val ties = corpus.groupBy(e => (e._2, e._3)).count(_._2.size > 1)
    assert(ties >= 3, s"only $ties tied (user,us) cells")
    val got = operators.JoinQueries
      .intervalOf(corpus.toDF("event_id", "user_id", "us", "event_type"))
      .collect()
      .map(r => (r.getAs[Long]("purchase_event_id"), r.getAs[Long]("click_event_id")))
      .toSet
    assert(got === pairs.toSet)
  }
}
