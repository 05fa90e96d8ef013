package graft

import graft.operators.{Dedup, Evaluate, Multimodal, Quantize, Similarity,
  Spectral, TextAnalysis, Timeseries}

/** q259-q262: CDC chunk census, term burstiness, STTR, Flesch
  * readability. Cores on handcrafted inputs with closed-form answers;
  * wrappers on the sf0.001 sample for the invariants the oracle gate
  * can't express (bounds, monotonicity).
  */
class Round12Spec extends SparkSpec {

  // ---- q259 CDC chunks ---------------------------------------------------

  test("cdcChunksOn: a duplicated doc halves distinct chunks exactly") {
    import spark.implicits._
    // two byte-identical docs -> every chunk appears exactly twice:
    // dup_chunk_ppm = 500000 and dup_tokens = one doc's token count
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, text, "s"), (2L, text, "s"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.cdcChunksOn(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_chunks") === 2 * row.getAs[Long]("n_distinct_chunks"))
    assert(row.getAs[Long]("dup_chunk_ppm") === 500000L)
    assert(row.getAs[Long]("dup_tokens") === 10L)
  }

  test("cdcChunksOn: all-distinct tokens in one doc -> zero duplication") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 40).map(i => s"tok$i").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.cdcChunksOn(docs).collect().head
    assert(r.getAs[Long]("n_chunks") === r.getAs[Long]("n_distinct_chunks"))
    assert(r.getAs[Long]("dup_chunk_ppm") === 0L)
    assert(r.getAs[Long]("dup_tokens") === 0L)
  }

  test("cdcChunksOn: chunk lengths partition the token stream") {
    import spark.implicits._
    // n_chunks counted with multiplicity must cover every token:
    // sum over chunk instances of len == total tokens
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p", "s"),
      (2L, "q r s t u v w x y z", "t"))
      .toDF("doc_id", "text", "source")
    val total = Dedup.cdcChunksOn(docs)
      .agg(org.apache.spark.sql.functions.sum("dup_tokens"))
      .collect().head.getLong(0)
    assert(total === 0L) // all tokens distinct -> no dup chunk anywhere
  }

  test("cdcChunks wrapper: census bounds hold on the sample") {
    val rows = Dedup.cdcChunks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_chunks") <= r.getAs[Long]("n_chunks"))
      val ppm = r.getAs[Long]("dup_chunk_ppm")
      assert(ppm >= 0L && ppm < 1000000L)
    }
  }

  // ---- q260 term burstiness ----------------------------------------------

  test("termBurstinessOn: once-per-doc term has VMR exactly 0") {
    import spark.implicits._
    // "the" once in every doc: S1 = N, S2 = N -> N*S2 - S1^2 = 0
    val docs = (1 to 8).map(i => (i.toLong, s"the filler$i"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.termBurstinessOn(docs).collect()
      .map(x => x.getAs[String]("tok") -> x).toMap
    assert(r("the").getAs[Long]("vmr_milli") === 0L)
    assert(r("the").getAs[Long]("df") === 8L)
    assert(r("the").getAs[Long]("cf") === 8L)
  }

  test("termBurstinessOn: single-doc burst scores k(N-1)/N exactly") {
    import spark.implicits._
    // "boom" 5 times in one of 10 docs: VMR = (10*25 - 25)/(10*5) = 4.5
    val docs = ((1 to 9).map(i => (i.toLong, s"pad$i")) :+
      (10L, "boom boom boom boom boom")).toDF("doc_id", "text")
    val r = TextAnalysis.termBurstinessOn(docs).collect()
      .map(x => x.getAs[String]("tok") -> x).toMap
    assert(r("boom").getAs[Long]("vmr_milli") === 4500L)
    assert(r("boom").getAs[Long]("df") === 1L)
    assert(r("boom").getAs[Long]("cf") === 5L)
  }

  test("termBurstiness wrapper: VMR nonnegative, df-ordered top cut") {
    val rows = TextAnalysis.termBurstiness(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("vmr_milli") >= 0L)
      assert(r.getAs[Long]("cf") >= r.getAs[Long]("df"))
    }
  }

  // ---- q261 STTR -----------------------------------------------------------

  test("sttrOn: distinct-then-constant doc gives mean (1000+40)/2") {
    import spark.implicits._
    // segment 0: 25 distinct types -> ttr 1000; segment 1: 1 type -> 40
    val text = ((1 to 25).map(i => s"w$i") ++ Seq.fill(25)("same")).mkString(" ")
    val docs = Seq((1L, text, "s")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.sttrOn(docs).collect().head
    assert(r.getAs[Long]("n_segments") === 2L)
    assert(r.getAs[Long]("mean_ttr_milli") === 520L)
  }

  test("sttrOn: docs shorter than one segment contribute nothing") {
    import spark.implicits._
    val docs = Seq((1L, "a b c", "s")).toDF("doc_id", "text", "source")
    assert(TextAnalysis.sttrOn(docs).collect().isEmpty)
  }

  test("sttr wrapper: TTR bounded by (40, 1000] on the sample") {
    val rows = TextAnalysis.sttr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("mean_ttr_milli")
      assert(t >= 40L && t <= 1000L)
    }
  }

  // ---- q262 readability -----------------------------------------------------

  test("readabilityOn: closed-form Flesch on a two-word sentence") {
    import spark.implicits._
    // "aa bb.": words 2, sentences 1, syllables 1 + guard(0->1) = 2
    // flesch = 206.835 - 1.015*2 - 84.6*1 = 120.205 -> 120205 milli
    val docs = Seq((1L, "aa bb.", "s")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.readabilityOn(docs).collect().head
    assert(r.getAs[Long]("n_words") === 2L)
    assert(r.getAs[Long]("n_sentences") === 1L)
    assert(r.getAs[Long]("n_syllables") === 2L)
    assert(r.getAs[Long]("flesch_milli") === 120205L)
  }

  test("readabilityOn: more syllables per word lowers the score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "be do it. so we go.", "simple"),
      (2L, "audacious operatic idiosyncrasies perpetuate onerous anomalies.",
        "ornate")).toDF("doc_id", "text", "source")
    val r = TextAnalysis.readabilityOn(docs).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Long]("flesch_milli")).toMap
    assert(r("simple") > r("ornate"))
  }

  test("readability wrapper: every source reports with positive counts") {
    val rows = TextAnalysis.readability(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_words") > 0L)
      assert(r.getAs[Long]("n_syllables") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_sentences") >= r.getAs[Long]("n_docs"))
    }
  }

  // ---- q263 isotropy ---------------------------------------------------------

  test("isotropyOn: identical vectors give mean cosine exactly 1000") {
    import spark.implicits._
    val v = Array(1f, 2f, 3f)
    val vecs = Seq((0L, v), (1L, v), (2L, v)).toDF("vec_id", "embedding")
    val r = Similarity.isotropyOn(vecs, sampleN = 10).collect().head
    assert(r.getAs[Long]("n_pairs") === 3L)
    assert(r.getAs[Long]("mean_cos_milli") === 1000L)
    assert(r.getAs[Long]("pos_ppm") === 1000000L)
    assert(r.getAs[Long]("hi_ppm") === 1000000L)
  }

  test("isotropyOn: an orthonormal basis has mean cosine 0") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val r = Similarity.isotropyOn(vecs, sampleN = 10).collect().head
    assert(r.getAs[Long]("mean_cos_milli") === 0L)
    assert(r.getAs[Long]("pos_ppm") === 0L)
    assert(r.getAs[Long]("hi_ppm") === 0L)
  }

  test("isotropyOn: antipodal pair reports a negative mean (shifted div)") {
    import spark.implicits._
    val vecs = Seq((0L, Array(1f, 0f)), (1L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.isotropyOn(vecs, sampleN = 10).collect().head
    assert(r.getAs[Long]("mean_cos_milli") === -1000L)
  }

  test("isotropy wrapper: bounds hold on the sample") {
    val r = Similarity.isotropy(spark, sfDir).collect().head
    val m = r.getAs[Long]("mean_cos_milli")
    assert(m >= -1000L && m <= 1000L)
    assert(r.getAs[Long]("pos_ppm") >= r.getAs[Long]("hi_ppm"))
  }

  // ---- q264 quantization rank fidelity ----------------------------------------

  test("quantFidelity: conc/disc/tie partition every pair; tau bounded") {
    val rows = Quantize.quantFidelity(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      assert(n === 1225L) // C(50,2)
      assert(r.getAs[Long]("n_conc") + r.getAs[Long]("n_disc")
        + r.getAs[Long]("n_tie") === n)
      val tau = r.getAs[Long]("tau_milli")
      assert(tau >= -1000L && tau <= 1000L)
      // 64-dim int8 reconstruction must broadly preserve neighbor order
      assert(tau > 0L)
    }
  }

  // ---- q266 McNemar ------------------------------------------------------------

  test("mcnemarOn: cells partition the corpus; discordance drives chi2") {
    import spark.implicits._
    // doc text chosen so classifier A's margin sign is whatever md5
    // gives — the test pins the INVARIANTS, the oracle pins the values
    val docs = (1 to 20).map(i =>
      (i.toLong, s"some words the number$i text goes here", 150L + 10L * i))
      .toDF("doc_id", "text", "n_chars")
    val r = Evaluate.mcnemarOn(docs).collect().head
    val n = r.getAs[Long]("n")
    assert(n === 20L)
    assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_a_only")
      + r.getAs[Long]("n_b_only") + r.getAs[Long]("n_neither") === n)
    assert(r.getAs[Long]("chi2_milli") >= 0L)
  }

  test("mcnemarOn: zero discordance gives chi2 exactly 0") {
    import spark.implicits._
    // token weights (md5 family): spark 82, the 26, data 55, query 85,
    // value 56, fast 50 -> margin 354 > 0, so A votes keep; " the "
    // present so B votes keep; n_chars >= 200 -> y true: both right,
    // b = c = 0 and the CASE guard must return 0, not divide
    val docs = Seq((1L, "spark the data query value fast", 300L))
      .toDF("doc_id", "text", "n_chars")
    val r = Evaluate.mcnemarOn(docs).collect().head
    assert(r.getAs[Long]("n_a_only") + r.getAs[Long]("n_b_only") === 0L)
    assert(r.getAs[Long]("chi2_milli") === 0L)
  }

  // ---- q267 Brier decomposition -------------------------------------------------

  test("brierDecompOn: constant-forecast corpus satisfies Murphy exactly") {
    import spark.implicits._
    // all docs n_chars=500 -> p_ppm = 500000 (one bin); half positive:
    // BS = 250000 ppm, REL = 0, RES = 0, UNC = 250000 -> identity exact
    val docs = (1 to 10).map(i =>
      (i.toLong, 500L, if (i <= 5) "en" else "de"))
      .toDF("doc_id", "n_chars", "lang")
    val r = Evaluate.brierDecompOn(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 10L)
    assert(r.getAs[Long]("brier_ppm") === 250000L)
    assert(r.getAs[Long]("rel_ppm") === 0L)
    assert(r.getAs[Long]("res_ppm") === 0L)
    assert(r.getAs[Long]("unc_ppm") === 250000L)
  }

  test("brierDecompOn: perfectly-sharp forecast has RES == UNC") {
    import spark.implicits._
    // two bins, outcomes fully separated by bin: resolution captures
    // all the outcome variance (res == unc), reliability is the only
    // miss term
    val docs = ((1 to 5).map(i => (i.toLong, 100L, "de")) ++
      (6 to 10).map(i => (i.toLong, 4500L, "en")))
      .toDF("doc_id", "n_chars", "lang")
    val r = Evaluate.brierDecompOn(docs).collect().head
    assert(r.getAs[Long]("res_ppm") === r.getAs[Long]("unc_ppm"))
    assert(r.getAs[Long]("unc_ppm") === 250000L)
    assert(r.getAs[Long]("brier_ppm") >= 0L)
  }

  test("brierDecomp wrapper: components bounded, UNC <= 250000") {
    val r = Evaluate.brierDecomp(spark, sfDir).collect().head
    assert(r.getAs[Long]("unc_ppm") <= 250000L)
    assert(r.getAs[Long]("rel_ppm") >= 0L)
    assert(r.getAs[Long]("res_ppm") >= 0L)
    assert(r.getAs[Long]("brier_ppm") >= 0L)
  }

  // ---- q268 Welch PSD ------------------------------------------------------------

  test("welchPsd equals the integer mean of the spectrogram frames") {
    import org.apache.spark.sql.functions._
    val sp = Spectral.spectrogram(spark, sfDir)
      .groupBy(col("user_id"), col("bin"))
      .agg(count(lit(1)).as("nf"), sum(col("qpower")).as("sq"))
      .select(col("user_id"), col("bin"), col("nf"),
        expr("sq div nf").as("expect"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = Spectral.welchPsd(spark, sfDir).collect()
    assert(got.nonEmpty && got.length === sp.size)
    got.foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[Long]("bin"))
      assert((r.getAs[Long]("n_frames"), r.getAs[Long]("welch_qpower")) === sp(k))
    }
  }

  // ---- q269 Hjorth parameters ------------------------------------------------------

  test("hjorthOn: quadratic ramp has closed-form mobility, zero complexity") {
    import spark.implicits._
    // x_t = t^2, t = 0..4 on the 1e3 grid: v0 = 8.7e8, v1 = 8e7, v2 = 0
    // activity = 8.7e8 div 25 = 34800000
    // mobility = sqrt((8e7*25)/(8.7e8*16)) = 0.37904... -> 379
    val events = (0 to 4).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, (t * t).toDouble))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.hjorthOn(events).collect().head
    assert(r.getAs[Long]("n0") === 5L)
    assert(r.getAs[Long]("activity_q") === 34800000L)
    assert(r.getAs[Long]("mobility_milli") === 379L)
    assert(r.getAs[Long]("complexity_milli") === 0L)
  }

  test("hjorthOn: constant and linear traces are guarded out") {
    import spark.implicits._
    val events = ((0 to 4).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, 7.0)) ++ // constant: v0 = 0
      (0 to 4).map(t =>
        (2L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
          t.toLong, t.toDouble))) // linear: v1 = 0
      .toDF("user_id", "ts", "event_id", "value")
    assert(Timeseries.hjorthOn(events).collect().isEmpty)
  }

  test("hjorth wrapper: mobility of a real signal is positive and finite") {
    val rows = Timeseries.hjorth(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("activity_q") >= 0L)
      assert(r.getAs[Long]("mobility_milli") >= 0L)
      assert(r.getAs[Long]("complexity_milli") >= 0L)
    }
  }

  // ---- q277 DeLong AUC CI ------------------------------------------------------------

  test("aucCi: point estimate matches q120 exactly; interval brackets it") {
    val auc = Evaluate.aucBySource(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("auc_ppm")).toMap
    val rows = Evaluate.aucCi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("auc_ppm") === auc(s))
      assert(r.getAs[Long]("se_ppm") > 0L)
      assert(r.getAs[Long]("lo_ppm") <= r.getAs[Long]("auc_ppm"))
      assert(r.getAs[Long]("hi_ppm") >= r.getAs[Long]("auc_ppm"))
      assert(r.getAs[Long]("lo_ppm") >= 0L
        && r.getAs[Long]("hi_ppm") <= 1000000L)
    }
  }

  // ---- q278 Kendall's W ----------------------------------------------------------------

  test("kendallWOn: concordant rankers score exactly 1e6; one reversal drops") {
    import spark.implicits._
    val concordant = Seq((1L, 10L, 100L, 5L), (2L, 20L, 200L, 6L),
      (3L, 30L, 300L, 7L)).toDF("doc_id", "s1", "s2", "s3")
    val w1 = Evaluate.kendallWOn(concordant).collect().head
    assert(w1.getAs[Long]("n_docs") === 3L)
    assert(w1.getAs[Long]("w_ppm") === 1000000L)
    // third ranker reversed: rsum = (5,6,7), sum D^2 = 8 -> 111111 ppm
    val mixed = Seq((1L, 10L, 100L, 7L), (2L, 20L, 200L, 6L),
      (3L, 30L, 300L, 5L)).toDF("doc_id", "s1", "s2", "s3")
    val w2 = Evaluate.kendallWOn(mixed).collect().head
    assert(w2.getAs[Long]("w_ppm") === 111111L)
  }

  test("segmentedRankLong: wide/skewed/negative keys rank exactly like a sort") {
    import spark.implicits._
    // range spans ~9e18 with negatives and duplicate keys: segments
    // stay bounded (~256) and ranks must equal the plain sorted order
    // with doc_id tie-break
    val rows = Seq(
      (1L, -4611686018427387904L), (2L, 4611686018427387904L),
      (3L, 0L), (4L, 0L), (5L, -17L), (6L, 123456789L), (7L, -17L))
      .toDF("doc_id", "k")
    val got = graft.operators.Dedup.segmentedRankLong(rows, "k")
      .select($"doc_id", $"rn").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Seq((1L, -4611686018427387904L), (5L, -17L), (7L, -17L),
      (3L, 0L), (4L, 0L), (6L, 123456789L), (2L, 4611686018427387904L))
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got === expect)
  }

  test("kendallW wrapper: W in [0, 1e6] on the sample") {
    val r = Evaluate.kendallW(spark, sfDir).collect().head
    val w = r.getAs[Long]("w_ppm")
    assert(w >= 0L && w <= 1000000L)
  }

  // ---- q279 mode tracking -----------------------------------------------------------------

  test("modeTrack agrees with an independent spectrogram argmax") {
    import org.apache.spark.sql.functions._
    val sp = Spectral.spectrogram(spark, sfDir).collect()
      .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[Long]("frame")))
      .map { case (k, rs) =>
        k -> rs.minBy(r => (-r.getAs[Long]("qpower"), r.getAs[Long]("bin")))
          .getAs[Long]("bin") }
    val byUser = sp.groupBy(_._1._1).map { case (u, m) =>
      val doms = m.toSeq.sortBy(_._1._2).map(_._2)
      u -> (doms.length.toLong,
        doms.sliding(2).count(w => w.length == 2 && w(0) != w(1)).toLong,
        doms.head, doms.last)
    }
    val got = Spectral.modeTrack(spark, sfDir).collect()
    assert(got.length === byUser.size)
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert((r.getAs[Long]("n_frames"), r.getAs[Long]("n_hops"),
        r.getAs[Long]("dom_first"), r.getAs[Long]("dom_last")) === byUser(u))
    }
  }

  // ---- q280 Hurst exponent ------------------------------------------------------------

  test("hurstOn: a ramp is maximally persistent, an oscillator exactly 0") {
    import spark.implicits._
    // offset-invariance of the scaled deviations makes every block of
    // a ramp identical; R/S grows ~linearly with size -> H near 1.
    // The period-2 oscillator has rs_q = 1000 at EVERY size -> the ln
    // points are constant -> OLS slope exactly 0.
    val events = ((0 until 32).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${t / 60}%02d"
        + f".${t % 60}%02d0"), t.toLong, t.toDouble)) ++
      (0 until 32).map(t =>
        (2L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${t / 60}%02d"
          + f".${t % 60}%02d0"), t.toLong, (t % 2).toDouble)))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.hurstOn(events).collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("hurst_milli")).toMap
    assert(r(1L) >= 950L && r(1L) <= 1050L)
    assert(r(2L) === 0L)
  }

  test("hurst wrapper: H within the theoretical (0, 1.2) band") {
    val rows = Timeseries.hurst(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("hurst_milli")
      assert(h > -200L && h < 1300L)
    }
  }

  // ---- q281 runs test -------------------------------------------------------------------

  test("runsTestOn: alternation and a monotone ramp give symmetric z") {
    import spark.implicits._
    // alternating 0/1 over 8 points: runs = 8, z = +24/sqrt(768/7)
    // -> 2291 milli; the 0..7 ramp: runs = 2, num = -24 -> -2291
    val events = ((0 until 8).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, (t % 2).toDouble)) ++
      (0 until 8).map(t =>
        (2L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
          t.toLong, t.toDouble)))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.runsTestOn(events).collect()
      .map(x => x.getAs[Long]("user_id") ->
        (x.getAs[Long]("n_runs"), x.getAs[Long]("z_milli"))).toMap
    assert(r(1L) === (8L, 2291L))
    assert(r(2L) === (2L, -2291L))
  }

  test("runsTestOn: a constant trace is guarded out (one-sided dichotomy)") {
    import spark.implicits._
    val events = (0 until 8).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, 5.0)).toDF("user_id", "ts", "event_id", "value")
    assert(Timeseries.runsTestOn(events).collect().isEmpty)
  }

  // ---- q282 cross-correlation matrix -----------------------------------------------

  test("xcorrMatrixOn: a one-sample shift puts best_lag at exactly +1") {
    import spark.implicits._
    // x = impulse at t=5, y = impulse at t=6: at lag +1 the aligned
    // windows are identical vectors -> r exactly 1000
    val events = ((0 until 32).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${t / 60}%02d"
        + f".${t % 60}%02d0"), t.toLong, if (t == 5) 9.0 else 0.0)) ++
      (0 until 32).map(t =>
        (2L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${t / 60}%02d"
          + f".${t % 60}%02d0"), t.toLong, if (t == 6) 9.0 else 0.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.xcorrMatrixOn(events).collect().head
    assert(r.getAs[Long]("user_a") === 1L)
    assert(r.getAs[Long]("user_b") === 2L)
    assert(r.getAs[Long]("best_lag") === 1L)
    assert(r.getAs[Long]("best_r_milli") === 1000L)
    assert(r.getAs[Long]("r0_milli") < 0L) // misaligned impulses
  }

  test("xcorrMatrix wrapper: C(8,2) pairs, r bounded, best dominates lag 0") {
    val rows = Timeseries.xcorrMatrix(spark, sfDir).collect()
    assert(rows.length === 28)
    rows.foreach { r =>
      val r0 = r.getAs[Long]("r0_milli")
      val br = r.getAs[Long]("best_r_milli")
      assert(math.abs(r0) <= 1000L && math.abs(br) <= 1000L)
      assert(math.abs(br) >= math.abs(r0))
      val l = r.getAs[Long]("best_lag")
      assert(l >= -2L && l <= 2L)
    }
  }

  // ---- q283 phash radius sweep --------------------------------------------------------

  test("phashRadius: cumulative census is monotone in the radius") {
    val rows = Multimodal.phashRadius(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("radius"))
    assert(rows.length === 4)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_pairs") >= a.getAs[Long]("n_pairs"))
        assert(b.getAs[Long]("n_docs") >= a.getAs[Long]("n_docs"))
      case _ =>
    }
  }

  // ---- q274 Savitzky–Golay ----------------------------------------------------------

  test("savgolOn: the SG filter reproduces a linear ramp exactly (zero residual)") {
    import spark.implicits._
    // value = t: num = 35000*t at interior points (SG is exact on
    // polynomials of degree <= 2) -> residual identically 0
    val events = (0 to 5).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, t.toDouble)).toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.savgolOn(events).collect().head
    assert(r.getAs[Long]("n_interior") === 2L)
    assert(r.getAs[Long]("sm_sum") === 175000L)   // 35000*(2+3)
    assert(r.getAs[Long]("sm_abs_max") === 105000L)
    assert(r.getAs[Long]("resid_var_q") === 0L)
  }

  test("savgolOn: an impulse leaves a nonzero residual") {
    import spark.implicits._
    val vals = Seq(0.0, 0.0, 5.0, 0.0, 0.0, 0.0)
    val events = vals.zipWithIndex.map { case (v, t) =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, v) }.toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.savgolOn(events).collect().head
    assert(r.getAs[Long]("resid_var_q") > 0L)
  }

  // ---- q275 peak census ----------------------------------------------------------------

  test("peaksOn: only the 2-sigma local maximum counts as a peak") {
    import spark.implicits._
    // [0,10,0,1,0,1,0,1]: three strict local maxima; only the 10
    // clears mean + 2*sd ((N*vq - S1)^2 >= 4*(N*S2 - S1^2))
    val vals = Seq(0.0, 10.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0)
    val events = vals.zipWithIndex.map { case (v, t) =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, v) }.toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.peaksOn(events).collect().head
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("n_peaks") === 1L)
    assert(r.getAs[Long]("first_peak_rn") === 2L)
    assert(r.getAs[Long]("max_peak_q") === 10000L)
  }

  test("peaksOn: a flat trace has zero peaks, zeroed coalesced fields") {
    import spark.implicits._
    val events = (0 to 5).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, 3.0)).toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.peaksOn(events).collect().head
    assert(r.getAs[Long]("n_peaks") === 0L)
    assert(r.getAs[Long]("first_peak_rn") === 0L)
    assert(r.getAs[Long]("max_peak_q") === 0L)
  }

  test("peaks wrapper: peak counts bounded by interior size") {
    val rows = Timeseries.peaks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_peaks") <= math.max(0L, r.getAs[Long]("n") - 2L))
    }
  }

  // ---- q272 Spiegelhalter Z --------------------------------------------------------

  test("spiegelhalterZOn: single overconfident-miss doc, closed-form Z") {
    import spark.implicits._
    // n_chars=1500 -> p = 750000 ppm, y = 1e6:
    // num = (1e6-75e4)*(1e6-15e5) = -1.25e11
    // den = (-5e5)^2 * 75e4 * 25e4; Z = -1/sqrt(3) -> floor(-577.35+1/3)
    val docs = Seq((1L, 1500L, "en", "s")).toDF("doc_id", "n_chars", "lang", "source")
    val r = Evaluate.spiegelhalterZOn(docs).collect().head
    assert(r.getAs[Long]("n") === 1L)
    assert(r.getAs[Long]("z_milli") === -578L)
  }

  test("spiegelhalterZOn: p=1/2 everywhere has zero denominator -> no row") {
    import spark.implicits._
    // n_chars=500 -> p exactly 500000 -> (1-2p) = 0 -> den 0, guarded
    val docs = (1 to 4).map(i => (i.toLong, 500L, "en", "s"))
      .toDF("doc_id", "n_chars", "lang", "source")
    assert(Evaluate.spiegelhalterZOn(docs).collect().isEmpty)
  }

  test("spiegelhalterZ wrapper: |Z| finite and sane on the sample") {
    val rows = Evaluate.spiegelhalterZ(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("z_milli")
      assert(math.abs(z) < 1000000L)
    }
  }

  // ---- q273 vocabulary Gini ----------------------------------------------------------

  test("vocabGiniOn: uniform vocabulary is exactly 0; skewed head is exact") {
    import spark.implicits._
    // lang a: 4 types once each -> G = 0
    // lang b: freqs [1,1,1,97]: num = 1*3*(0+3-4) + 97*1*(6+1-4) = 288
    //         den = 4*100 -> G = 720000 ppm exactly
    val docs = Seq(
      (1L, "w1 w2 w3 w4", "a"),
      (2L, (Seq.fill(97)("big") ++ Seq("x1", "x2", "x3")).mkString(" "), "b"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.vocabGiniOn(docs).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    assert(r("a").getAs[Long]("gini_ppm") === 0L)
    assert(r("a").getAs[Long]("n_types") === 4L)
    assert(r("b").getAs[Long]("gini_ppm") === 720000L)
  }

  test("vocabGini wrapper: Gini in [0, 1e6) per language") {
    val rows = TextAnalysis.vocabGini(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L)
    }
  }

  // ---- q271 variance ratio -------------------------------------------------------

  test("varianceRatioOn: quadratic ramp closed-form VR, oscillator reads 0") {
    import spark.implicits._
    // user 1: x_t = t^2, t = 0..7 -> v1 = 784e6 (N1=7), v4 = 1280e6
    // (N4=4): VR = (1280e6*49)/(784e6*16)/4 = 1.25 -> 1250 milli
    // user 2: x alternates 0/1 -> every 4-step increment is 0 -> VR 0
    val events = ((0 to 7).map(t =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
        t.toLong, (t * t).toDouble)) ++
      (0 to 7).map(t =>
        (2L, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$t"),
          t.toLong, (t % 2).toDouble)))
      .toDF("user_id", "ts", "event_id", "value")
    val r = Timeseries.varianceRatioOn(events).collect()
      .map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("vr_milli")).toMap
    assert(r === Map(1L -> 1250L, 2L -> 0L))
  }

  test("varianceRatio wrapper: VR positive and bounded on real traces") {
    val rows = Timeseries.varianceRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("vr_milli")
      assert(v >= 0L && v < 100000L)
    }
  }

  // ---- q270 local clustering coefficient ----------------------------------------

  test("localClusteringPairs: triangle + pendant, closed-form buckets") {
    import spark.implicits._
    // triangle {1,2,3} plus pendant 4 on node 1:
    // cc(1) = 1/C(3,2) = 1/3 -> 333333 ppm (bucket 3)
    // cc(2) = cc(3) = 1/C(2,2)... = 1/1 -> 1000000 ppm (bucket 10)
    // node 4 (deg 1) is excluded
    val p = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
      .toDF("doc_a", "doc_b")
    val r = Dedup.localClusteringPairs(p, cap = 64L).collect()
      .map(x => x.getAs[Long]("bucket") ->
        (x.getAs[Long]("n_nodes"), x.getAs[Long]("mean_cc_ppm"))).toMap
    assert(r === Map(3L -> (1L, 333333L), 10L -> (2L, 1000000L)))
  }

  test("localClusteringPairs: an over-cap hub is excluded from centers") {
    import spark.implicits._
    // star: center 1 with 70 leaves -> deg 70 > cap 64; leaves deg 1
    val p = (2 to 71).map(i => (1L, i.toLong)).toDF("doc_a", "doc_b")
    assert(Dedup.localClusteringPairs(p, cap = 64L).collect().isEmpty)
  }

  test("localClustering wrapper: buckets within the ppm decile range") {
    val rows = Dedup.localClustering(spark, sfDir).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b <= 10L)
      assert(r.getAs[Long]("n_nodes") > 0L)
      assert(r.getAs[Long]("mean_cc_ppm") <= 1000000L)
    }
  }

  // ---- q276 rank stability --------------------------------------------------------

  test("rankStability: overlap bounded by 10, Jaccard consistent with it") {
    val rows = Quantize.rankStability(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val b = r.getAs[Long]("n_both")
      assert(b >= 0L && b <= 10L)
      assert(r.getAs[Long]("jaccard_ppm") === (b * 1000000L) / (20L - b))
      // int8 at 64 dims must preserve MOST of the top-10 set
      assert(b >= 5L)
    }
  }

  // ---- q265 PQ distortion ------------------------------------------------------

  test("pqDistortion: 8 subspaces, codebook self-encodings give zero_ppm > 0") {
    val rows = Quantize.pqDistortion(spark, sfDir).collect()
    assert(rows.length === 8)
    val n = rows.head.getAs[Long]("n_vecs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Long]("mean_dist_q") >= 0L)
      assert(r.getAs[Long]("max_dist_q") >= r.getAs[Long]("mean_dist_q"))
      // the 8 codebook vectors encode to themselves at exactly 0
      assert(r.getAs[Long]("zero_ppm") > 0L)
    }
  }
}
