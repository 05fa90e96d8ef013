package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: invariant tests complementing the DuckDB oracle
  * gate (which pins exact values) — these pin the SEMANTICS on testdata
  * and on planted fixtures the oracle never sees. The heavy-duty proofs
  * for q284/q285 live in MlPipelineSpec (ADC recall + persisted-codes
  * drop-in + byte fold) and TriangleSpec (4-sigma sampler CIs, megahub
  * cap divergence). */
class Round13Spec extends SparkSpec {

  test("q286 cell-label JS: bounded by ln 2, full unordered label grid") {
    import spark.implicits._
    val js = SparkEntry.queries("q286_cell_label_js")(spark, sfDir).collect()
    assert(js.nonEmpty)
    // JS <= ln 2 (693147 on the 1e6 grid; +1 for quantization slack)
    js.foreach { r =>
      val v = r.getAs[Long]("js_ppm")
      assert(v >= 0L && v <= 693148L, s"js_ppm out of [0, ln2]: $v")
      assert(r.getAs[Long]("label_a") < r.getAs[Long]("label_b"))
    }
    val nLabels = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"label").distinct().count()
    assert(js.length === (nLabels * (nLabels - 1) / 2).toInt)
  }

  test("q287 Benford: chi2 nonnegative, flag consistent, and a planted uniform-digit feed flags") {
    import spark.implicits._
    val b = SparkEntry.queries("q287_benford")(spark, sfDir).collect()
    assert(b.nonEmpty)
    b.foreach { r =>
      val chi2 = r.getAs[Long]("chi2_milli")
      assert(chi2 >= 0L)
      assert(r.getAs[Boolean]("benford_ok") === (chi2 <= 15507L))
    }
    // planted feeds: digits 1..9 uniform (must flag — uniform is the
    // classic fabricated shape) vs an exact-Benford census (must pass)
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_benford_${System.nanoTime()}")
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val uniform = (0 until 9000).map(i =>
      (i.toLong, java.sql.Timestamp.from(base.plusSeconds(i)), i.toLong,
        "uniform", (i % 9 + 1) * 1.0, ""))
    // Benford frequencies on 10000 rows: floor(log10(1+1/d)*10000)
    val benfordCounts = Seq(3010, 1760, 1249, 969, 791, 669, 579, 511, 462)
    val benford = benfordCounts.zipWithIndex.flatMap { case (c, d0) =>
      (0 until c).map(j => ((d0 * 10000 + j).toLong,
        java.sql.Timestamp.from(base.plusSeconds(j)), j.toLong,
        "benford", (d0 + 1) * 1.0, ""))
    }
    (uniform ++ benford)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(new java.io.File(tmp, "events.parquet").getPath)
    val planted = SparkEntry.queries("q287_benford")(spark, tmp.getPath)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("chi2_milli"), r.getAs[Boolean]("benford_ok"))).toMap
    assert(!planted("uniform")._2,
      s"uniform digits not flagged: chi2=${planted("uniform")._1}")
    assert(planted("benford")._2,
      s"exact Benford census flagged: chi2=${planted("benford")._1}")
    assert(planted("uniform")._1 > 10 * planted("benford")._1)
  }

  test("q288 bootstrap CI: 200 replicates, lo <= point mean <= hi per source") {
    val ci = SparkEntry.queries("q288_bootstrap_ci")(spark, sfDir).collect()
    assert(ci.nonEmpty)
    ci.foreach { r =>
      assert(r.getAs[Long]("n_reps") === 200L)
      val (lo, m, hi) = (r.getAs[Long]("lo_ppm"), r.getAs[Long]("mean_ppm"),
        r.getAs[Long]("hi_ppm"))
      assert(lo <= hi)
      // the percentile bootstrap brackets the point estimate on any
      // non-degenerate source (testdata sources are 20+ docs)
      assert(lo <= m && m <= hi, s"point $m outside [$lo, $hi]")
    }
  }

  test("q289 doc CE: nonnegative, covers exactly the multi-token docs, verbatim dup scores below its unique twin") {
    import spark.implicits._
    val ce = SparkEntry.queries("q289_doc_ce")(spark, sfDir)
    assert(ce.where($"ce_e4" < 0L).count() === 0)
    val expected = graft.sources.Tables.documents(spark, sfDir)
      .where(size(split($"text", " ")) >= 2).count()
    assert(ce.count() === expected)
    // planted corpus: docs 1 and 2 are verbatim copies of "a b a b …",
    // doc 3 is "a c a c …" — the context 'a' branches (b twice as often
    // as c corpus-wide), so the copies' bigrams are the PREDICTABLE
    // branch (p = 2/3) and the unique doc's the rare one (p = 1/3):
    // boilerplate must score strictly lower CE
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_docce_${System.nanoTime()}")
    val boiler = (1 to 20).flatMap(_ => Seq("a", "b")).mkString(" ")
    val unique = (1 to 20).flatMap(_ => Seq("a", "c")).mkString(" ")
    Seq((1L, boiler, "en", "a", 40L), (2L, boiler, "en", "a", 40L),
        (3L, unique, "en", "a", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(new java.io.File(tmp, "documents.parquet").getPath)
    val planted = SparkEntry.queries("q289_doc_ce")(spark, tmp.getPath)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("ce_e4")).toMap
    assert(planted(1L) === planted(2L))
    assert(planted(1L) < planted(3L),
      s"verbatim dup ${planted(1L)} not below unique ${planted(3L)}")
  }

  test("q290 ADC recall audit: ppm bounded, aggregate recall clears the q38 bar") {
    val r = SparkEntry.queries("q290_adc_recall")(spark, sfDir).collect()
    assert(r.length === 10) // the 10 pinned audit queries
    r.foreach { row =>
      val ppm = row.getAs[Long]("recall_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(row.getAs[Long]("n_hits") <= row.getAs[Long]("n_truth"))
    }
    val agg = r.map(_.getAs[Long]("n_hits")).sum.toDouble /
      r.map(_.getAs[Long]("n_truth")).sum
    assert(agg >= 0.6, f"aggregate ADC recall $agg%.2f below the 0.6 bar")
  }

  test("q292 HLL: estimate within the published m=256 error envelope of the exact distinct") {
    val r = SparkEntry.queries("q292_hll_distinct")(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getAs[Long]("exact_distinct")
      val est = row.getAs[Long]("hll_est")
      assert(exact > 0 && est > 0)
      // 1.04/sqrt(256) = 6.5% standard error; gate at 5 sigma plus the
      // linear-counting regime's own integer-grid slack
      val tol = math.max(5 * 0.065 * exact, 3.0)
      assert(math.abs(est - exact) <= tol,
        s"HLL est $est vs exact $exact (tol $tol)")
    }
  }

  test("q293 blob entropy: bounded by ln(alphabet); uniform bytes pin the ceiling, constant bytes hit zero") {
    import spark.implicits._
    val ent = SparkEntry.queries("q293_blob_entropy")(spark, sfDir)
    assert(ent.where($"ent_e4" < 0L).count() === 0)
    // ln 256 = 5.545 -> 55452 on the 1e4 grid is the 8-bit ceiling
    assert(ent.where($"ent_e4" > 55452L).count() === 0)
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_blobent_${System.nanoTime()}")
    // 64 distinct chars uniformly vs one repeated char
    val uniform = (0 until 256).map(i => ('0' + i % 64).toChar).mkString
    Seq((1L, uniform, "en", "a", 256L), (2L, "a" * 256, "en", "a", 256L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(new java.io.File(tmp, "documents.parquet").getPath)
    val planted = SparkEntry.queries("q293_blob_entropy")(spark, tmp.getPath)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("ent_e4")).toMap
    assert(planted(2L) === 0L, s"constant blob entropy ${planted(2L)}")
    // uniform over 64 symbols: exactly ln 64 = 4.1588 -> 41588 e4
    assert(math.abs(planted(1L) - 41588L) <= 2L,
      s"uniform-64 blob entropy ${planted(1L)}")
  }

  test("q294 silhouette: milli-bounded, own-cell mean positive, clean synthetic clusters score high") {
    import spark.implicits._
    val s = SparkEntry.queries("q294_cell_silhouette")(spark, sfDir).collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      val v = r.getAs[Long]("sil_milli")
      assert(v >= -1000L && v <= 1000L, s"sil_milli out of range: $v")
    }
    // planted: two tight orthogonal clusters (coords on axis 0 vs axis
    // 1) -> every point's nearest other cell is far, silhouette ~ 1
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sil_${System.nanoTime()}")
    val dim = 64
    def vec(axis: Int, jitter: Float): Array[Float] = {
      val a = Array.fill(dim)(0.001f * jitter)
      a(axis) = 1.0f; a
    }
    (0 until 40).map { i =>
      val axis = i % 2
      // vec_id < 8 seed the codebook: keep them jitter-free so the 4
      // same-axis centroids are IDENTICAL and the min-id tie-break
      // collapses the assignment to exactly two cells (0 and 1)
      val jitter = if (i < 8) 0f else ((i / 2 % 5) + 1).toFloat
      (i.toLong, vec(axis, jitter), axis)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(new java.io.File(tmp, "embeddings.parquet").getPath)
    val planted = SparkEntry.queries("q294_cell_silhouette")(spark, tmp.getPath)
      .collect()
    assert(planted.length === 40)
    planted.foreach { r =>
      assert(r.getAs[Long]("sil_milli") >= 900L,
        s"tight orthogonal clusters scored ${r.getAs[Long]("sil_milli")}")
    }
  }

  test("q296 inter-arrival burstiness: bounded; planted metronome reads exactly -1000") {
    import spark.implicits._
    val b = SparkEntry.queries("q296_interarrival_b")(spark, sfDir)
    assert(b.where($"b_milli" < -1000L || $"b_milli" > 1000L).count() === 0)
    assert(b.count() > 0)
    // planted: user 1 fires every 60 s exactly (sigma = 0 -> B = -1);
    // user 2 is a burst of 1 s gaps plus one 5000 s silence — the
    // heavy-tailed shape that pushes sigma >> mu and B toward +1
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_burst_${System.nanoTime()}")
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val metro = (0 until 50).map(i => (i.toLong,
      java.sql.Timestamp.from(base.plusSeconds(60L * i)), 1L, "click", 1.0, ""))
    val bursty = (0 until 51).map { i =>
      val t = if (i < 50) i.toLong else 5049L
      ((100 + i).toLong, java.sql.Timestamp.from(base.plusSeconds(t)),
        2L, "click", 1.0, "")
    }
    (metro ++ bursty)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(new java.io.File(tmp, "events.parquet").getPath)
    val planted = SparkEntry.queries("q296_interarrival_b")(spark, tmp.getPath)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("b_milli")).toMap
    assert(planted(1L) === -1000L, s"metronome B = ${planted(1L)}")
    assert(planted(2L) > 500L, s"bursty B = ${planted(2L)}")
  }

  test("q297 code usage: bounded by ln k, shares and counts consistent") {
    val r = SparkEntry.queries("q297_code_usage")(spark, sfDir).collect()
    assert(r.length === 8) // one row per subspace
    r.foreach { row =>
      val used = row.getAs[Long]("n_codes_used")
      val ent = row.getAs[Long]("usage_ent_e4")
      val share = row.getAs[Long]("top_code_share_ppm")
      assert(used >= 1L && used <= 8L)
      // ln 8 = 2.0794 -> 20795 with quantization slack
      assert(ent >= 0L && ent <= 20795L, s"entropy out of [0, ln 8]: $ent")
      assert(share * used >= 1000000L - used, // max >= mean
        s"top share $share inconsistent with $used codes")
      if (used === 1L) assert(ent === 0L && share === 1000000L)
    }
  }

  test("q298 weighted median: stub-heavy planted source separates doc vs token median") {
    import spark.implicits._
    val m = SparkEntry.queries("q298_weighted_median")(spark, sfDir)
    assert(m.count() > 0)
    assert(m.where($"wmedian_len" < 0 || $"median_len" < 0).count() === 0)
    // planted: 9 one-token stubs (len 10) + 1 monster (len 1000, 999
    // tokens): doc median 10, token-weighted median 1000
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_wmed_${System.nanoTime()}")
    val stubs = (1 to 9).map(i => (i.toLong, "stub", "en", "a", 10L))
    val monster = Seq((10L, (1 to 999).map(i => s"w$i").mkString(" "),
      "en", "a", 1000L))
    (stubs ++ monster)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(new java.io.File(tmp, "documents.parquet").getPath)
    val row = SparkEntry.queries("q298_weighted_median")(spark, tmp.getPath)
      .collect().head
    assert(row.getAs[Long]("median_len") === 10L)
    assert(row.getAs[Long]("wmedian_len") === 1000L)
    assert(row.getAs[Long]("n_tokens") === 9L + 999L)
  }

  test("q299 PQ SemDeDup: funnel monotone, verified dups subset of q94's exact screen") {
    import spark.implicits._
    val pq = SparkEntry.queries("q299_pq_semdedup")(spark, sfDir)
    assert(pq.where($"n_adc_pass" > $"n_cands"
      || $"n_verified" > $"n_adc_pass").count() === 0)
    val exact = SparkEntry.queries("q94_semantic_dedup")(spark, sfDir)
      .select($"vec_id", $"n_earlier_dups", $"kept".as("exact_kept"))
    val j = pq.join(exact, Seq("vec_id"))
    // exact verify means every q299 dup IS a q94 dup (subset per vec)
    assert(j.where($"n_verified" > $"n_earlier_dups").count() === 0)
    // kept=false here implies kept=false exactly
    assert(j.where(!$"kept" && $"exact_kept").count() === 0)
    // and the 0.25 SDC pre-filter's measured recall vs the exact screen
    val tot = j.agg(sum($"n_verified"), sum($"n_earlier_dups")).collect()(0)
    val recall = tot.getLong(0).toDouble / math.max(tot.getLong(1), 1L)
    info(f"SDC pre-filter dup recall vs q94 = $recall%.2f " +
      f"(${tot.getLong(0)}/${tot.getLong(1)})")
    assert(recall >= 0.5, f"compressed-domain screen recall $recall%.2f")
  }

  test("q291 contamination: full ordered grid, bounded counts, planted cross-source copy detected") {
    import spark.implicits._
    val c = SparkEntry.queries("q291_ngram_contam")(spark, sfDir)
    val nSources = graft.sources.Tables.documents(spark, sfDir)
      .select($"source").distinct().count()
    assert(c.count() === nSources * (nSources - 1))
    assert(c.where($"n_contam" > $"n_docs_a" || $"n_contam" < 0).count() === 0)
    // planted: source b republishes one of a's docs verbatim — the
    // (a -> b) AND (b -> a) rates must both light up; the clean pair
    // (a, c) stays zero
    val tmp = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_contam_${System.nanoTime()}")
    val txt = (1 to 20).map(i => s"t$i").mkString(" ")
    val other = (1 to 20).map(i => s"x$i").mkString(" ")
    Seq((1L, txt, "en", "a", 20L), (2L, other, "en", "a", 20L),
        (3L, txt, "en", "b", 20L), (4L, (1 to 20).map(i => s"y$i").mkString(" "), "en", "c", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(new java.io.File(tmp, "documents.parquet").getPath)
    val planted = SparkEntry.queries("q291_ngram_contam")(spark, tmp.getPath)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_contam")).toMap
    assert(planted(("a", "b")) === 1L) // doc 1 contaminated by b's copy
    assert(planted(("b", "a")) === 1L)
    assert(planted(("a", "c")) === 0L)
    assert(planted(("c", "a")) === 0L)
  }
}
