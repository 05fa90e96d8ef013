package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Evaluate, Quantize, Sampling}

/** q247-q249, q251: t-closeness, Neyman allocation, participation ratio,
  * Cohen's kappa. Cores on handcrafted inputs with closed-form answers;
  * wrappers on the sf0.001 sample for cross-row invariants the oracle
  * gate can't express. */
class Round11Spec extends SparkSpec {

  // ---- q247 t-closeness -------------------------------------------------

  test("tClosenessOn: a class mirroring the global distribution has EMD 0") {
    import spark.implicits._
    // two classes with IDENTICAL n_chars multisets -> each equals global
    val docs = (1 to 10).flatMap(c =>
      Seq(("en", "a", c.toLong), ("en", "b", c.toLong)))
      .toDF("lang", "source", "n_chars")
    val rows = Curation.tClosenessOn(docs).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("emd_ppm") === 0L)
      assert(r.getAs[Long]("breach") === 0L)
    }
  }

  test("tClosenessOn: short-docs-only vs long-docs-only class, exact EMD") {
    import spark.implicits._
    // 20 distinct lengths; class a holds the longest 10 (deciles 1-5),
    // class b the shortest 10 (deciles 6-10). Hand-computed:
    // sd = 500, emd = floor(500e6 / (9*10*20) + 1/3) = 277778
    val docs = ((11 to 20).map(c => ("en", "a", c.toLong)) ++
      (1 to 10).map(c => ("en", "b", c.toLong)))
      .toDF("lang", "source", "n_chars")
    val rows = Curation.tClosenessOn(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("a").getAs[Long]("emd_ppm") === 277778L)
    assert(rows("b").getAs[Long]("emd_ppm") === 277778L)
    assert(rows("a").getAs[Long]("breach") === 1L)
  }

  test("tCloseness wrapper: every class reports, EMD bounded by the scale") {
    val rows = Curation.tCloseness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("emd_ppm")
      assert(e >= 0L && e <= 1000000L)
    }
  }

  // ---- q248 Neyman allocation -------------------------------------------

  test("neymanAllocOn: a zero-variance stratum gets zero Neyman budget") {
    import spark.implicits._
    // stratum a constant (sd 0); stratum b spread 0/200 (sd exactly 100)
    val docs = ((1 to 10).map(_ => ("a", 100L)) ++
      (1 to 10).map(i => ("b", if (i % 2 == 0) 0L else 200L)))
      .toDF("source", "n_chars")
    val rows = Sampling.neymanAllocOn(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("a").getAs[Long]("sd_milli") === 0L)
    assert(rows("b").getAs[Long]("sd_milli") === 100000L)
    assert(rows("a").getAs[Long]("alloc_neyman") === 0L)
    assert(rows("b").getAs[Long]("alloc_neyman") === 10000L)
    assert(rows("a").getAs[Long]("alloc_prop") === 5000L)
    // Neyman vs proportional variance ratio: exactly half here
    assert(rows("a").getAs[Long]("deff_ppm") === 500000L)
  }

  test("neymanAllocOn: equal variances collapse Neyman to proportional") {
    import spark.implicits._
    val docs = ((1 to 12).map(i => ("a", if (i % 2 == 0) 0L else 200L)) ++
      (1 to 4).map(i => ("b", if (i % 2 == 0) 0L else 200L)))
      .toDF("source", "n_chars")
    val rows = Sampling.neymanAllocOn(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("a").getAs[Long]("alloc_neyman")
      === rows("a").getAs[Long]("alloc_prop"))
    assert(rows("a").getAs[Long]("alloc_prop") === 7500L)
    assert(rows("a").getAs[Long]("deff_ppm") === 1000000L)
  }

  test("neymanAlloc wrapper: budget exhausted up to floor loss") {
    val rows = Sampling.neymanAlloc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("alloc_neyman")).sum
    assert(total <= 10000L && total > 10000L - rows.length)
    rows.foreach(r => assert(r.getAs[Long]("deff_ppm") <= 1000000L))
  }

  // ---- q249 participation ratio ------------------------------------------

  test("participationRatioOn: one live dimension -> PR exactly 1") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1f, 0.5f)), (2L, Array(-1f, 0.5f)),
      (3L, Array(1f, 0.5f)), (4L, Array(-1f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r = Quantize.participationRatioOn(vecs).collect().head
    assert(r.getAs[Long]("n_dims") === 2L)
    assert(r.getAs[Long]("n_dead") === 1L)
    assert(r.getAs[Long]("pr_milli") === 1000L)
    assert(r.getAs[Long]("top_share_ppm") === 1000000L)
  }

  test("participationRatioOn: isotropic dimensions -> PR = d") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1f, -1f)), (2L, Array(-1f, 1f)),
      (3L, Array(1f, 1f)), (4L, Array(-1f, -1f)))
      .toDF("vec_id", "embedding")
    val r = Quantize.participationRatioOn(vecs).collect().head
    assert(r.getAs[Long]("pr_milli") === 2000L)
    assert(r.getAs[Long]("top_share_ppm") === 500000L)
    assert(r.getAs[Long]("n_dead") === 0L)
  }

  test("participationRatio wrapper: PR in [1, d], share >= 1/d") {
    val r = Quantize.participationRatio(spark, sfDir).collect().head
    val d = r.getAs[Long]("n_dims")
    val pr = r.getAs[Long]("pr_milli")
    assert(pr >= 1000L && pr <= d * 1000L)
    assert(r.getAs[Long]("top_share_ppm") >= 1000000L / d)
  }

  // ---- q250 modularity -----------------------------------------------------

  test("modularityOn: two clean clique communities -> +250000 ppm each") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("doc_a", "doc_b")
    val comm = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")).toDF("doc_id", "source")
    val rows = graft.operators.Graph.modularityOn(pairs, comm).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("e_within") === 3L)
      assert(r.getAs[Long]("d_sum") === 6L)
      assert(r.getAs[Long]("contrib_ppm") === 250000L) // Q = 1/2 total
    }
  }

  test("modularityOn: every edge crossing -> exactly -250000 ppm each") {
    import spark.implicits._
    // complete bipartite K(2,2), communities = the two sides: worse
    // than the degree-preserving null model, contributions go negative
    val pairs = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("doc_a", "doc_b")
    val comm = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("doc_id", "source")
    val rows = graft.operators.Graph.modularityOn(pairs, comm).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("e_within") === 0L)
      assert(r.getAs[Long]("contrib_ppm") === -250000L)
    }
  }

  // ---- q252 LSH operating curve --------------------------------------------

  test("lshCurveOn: closed-form S-curve values at j = 0.5") {
    import spark.implicits._
    val hist = Seq((4L, 1L, 50L)).toDF("decile", "n_pairs", "jc")
    val byCfg = graft.operators.Dedup.lshCurveOn(hist).collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("r")) -> r).toMap
    // 1 - (1 - 0.5^r)^b on the ppm grid, floor+1/3 quantized
    assert(byCfg((16L, 1L)).getAs[Long]("p_ppm") === 999985L)
    assert(byCfg((8L, 2L)).getAs[Long]("p_ppm") === 899887L)
    assert(byCfg((4L, 4L)).getAs[Long]("p_ppm") === 227524L)
    assert(byCfg((2L, 8L)).getAs[Long]("p_ppm") === 7797L)
    // single-bucket histogram: recall equals the bucket's p
    byCfg.values.foreach(r =>
      assert(r.getAs[Long]("recall_ppm") === r.getAs[Long]("p_ppm")))
  }

  test("lshOperatingCurve wrapper: more bands -> higher recall, monotone") {
    val rows = graft.operators.Dedup.lshOperatingCurve(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val recall = rows.map(r =>
      (r.getAs[Long]("b"), r.getAs[Long]("r")) -> r.getAs[Long]("recall_ppm"))
      .toMap
    assert(recall((16L, 1L)) >= recall((8L, 2L)))
    assert(recall((8L, 2L)) >= recall((4L, 4L)))
    assert(recall((4L, 4L)) >= recall((2L, 8L)))
    rows.foreach { r =>
      val p = r.getAs[Long]("p_ppm")
      assert(p >= 0L && p <= 1000000L)
      // exact duplicates (jc clamped to 100) are always caught
      if (r.getAs[Long]("jc") === 100L) assert(p === 1000000L)
    }
  }

  // ---- q253 hybrid RRF -------------------------------------------------------

  test("hybridFusion: ranks contiguous, scores monotone, provenance set") {
    val rows = graft.operators.Similarity.hybridFusion(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq
        === (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("score_micro")).toSeq
      assert(scores === scores.sorted.reverse)
      sorted.foreach { r =>
        // provenance: a fused row came from at least one ranker, and
        // its score is consistent with membership
        val inD = r.getAs[Long]("in_dense")
        val inL = r.getAs[Long]("in_lex")
        assert(inD + inL >= 1L)
        val cap = inD * (1000000L / 61L) + inL * (1000000L / 61L)
        assert(r.getAs[Long]("score_micro") <= cap)
      }
    }
  }

  // ---- q254 BPE merges --------------------------------------------------------

  test("bpeMergesOn: hand-traced merges, tie-break, and exhaustion") {
    import spark.implicits._
    // round 1: (a,b) wins 5 (2 from aaab + 3 from ab) over (a,a) at 4;
    // round 2: (a,a) ties (a,ab) at 2, byte-order tie-break picks (a,a);
    // round 3: (aa,ab) at 2; round 4: no pairs left -> 3 rows, not 5
    val vocab = Seq(("aaab", 2L), ("ab", 3L)).toDF("tok", "freq")
    val rows = graft.operators.TextAnalysis.bpeMergesOn(vocab, k = 5)
      .collect().sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("sym_a"),
        r.getAs[String]("sym_b"), r.getAs[Long]("pair_count")))
    assert(rows.toSeq === Seq(
      (1L, "a", "b", 5L), (2L, "a", "a", 2L), (3L, "aa", "ab", 2L)))
  }

  test("bpeMerges wrapper: 5 ranked merges with non-increasing counts") {
    val rows = graft.operators.TextAnalysis.bpeMerges(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("merge_rank"))
    assert(rows.map(_.getAs[Long]("merge_rank")).toSeq === (1L to 5L))
    val counts = rows.map(_.getAs[Long]("pair_count")).toSeq
    // each round's argmax bounds the next (new pairs inherit at most
    // the merged pair's occurrence count)
    assert(counts === counts.sorted.reverse)
    assert(counts.last > 0L)
    // a merged symbol from an earlier round may re-enter later pairs;
    // symbols are always non-empty
    rows.foreach { r =>
      assert(r.getAs[String]("sym_a").nonEmpty)
      assert(r.getAs[String]("sym_b").nonEmpty)
    }
  }

  // ---- q255 cluster-aware split ---------------------------------------------

  test("clusterSplit: cluster scheme leaks structurally zero pairs") {
    val rows = graft.operators.Sampling.clusterSplit(spark, sfDir)
      .collect().map(r => r.getAs[String]("scheme") -> r).toMap
    assert(rows.keySet === Set("naive", "cluster"))
    // every near-dup pair is within-cluster by CC construction, so the
    // cluster-hash split cannot straddle one
    assert(rows("cluster").getAs[Long]("cross_pairs") === 0L)
    assert(rows("cluster").getAs[Long]("leak_ppm") === 0L)
    assert(rows("naive").getAs[Long]("cross_pairs")
      >= rows("cluster").getAs[Long]("cross_pairs"))
    // both schemes partition the same document universe
    def tot(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("n_train") + r.getAs[Long]("n_val") + r.getAs[Long]("n_test")
    assert(tot(rows("naive")) === tot(rows("cluster")))
    assert(tot(rows("naive")) > 0L)
  }

  // ---- q256 translated dups ----------------------------------------------------

  test("translatedDups: census is canonical and shares sum to ~1e6") {
    val rows = graft.operators.Similarity.translatedDups(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("lang_lo") <= r.getAs[String]("lang_hi"))
      assert(r.getAs[Long]("cross_lang")
        === (if (r.getAs[String]("lang_lo") == r.getAs[String]("lang_hi")) 0L
             else 1L))
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    val share = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(share <= 1000000L && share > 1000000L - rows.length)
  }

  // ---- q257 Fellegi–Sunter weights -------------------------------------------

  test("fsWeights: discriminative fields get positive weights, m >= sane floor") {
    val rows = graft.operators.Dedup.fsWeights(spark, sfDir).collect()
      .map(r => r.getAs[String]("field") -> r).toMap
    assert(rows.keySet === Set("lang", "source", "decile", "tok1"))
    rows.values.foreach { r =>
      val m = r.getAs[Long]("m_ppm"); val u = r.getAs[Long]("u_ppm")
      assert(m > 0L && m <= 1000000L)
      assert(u > 0L && u <= 1000000L)
      // weight sign must follow the m/u ratio (floor offset aside)
      val w = r.getAs[Long]("weight_milli")
      if (m > u) assert(w >= 0L) else if (m < u) assert(w <= 0L)
    }
    // near-dups agree on language at least as often as random pairs
    assert(rows("lang").getAs[Long]("m_ppm")
      >= rows("lang").getAs[Long]("u_ppm"))
  }

  // ---- q258 Zipf slope -------------------------------------------------------

  test("zipfSlope: negative slope per language, exact on a crafted grid") {
    import spark.implicits._
    val rows = graft.operators.TextAnalysis.zipfSlope(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("slope_milli") < 0L) // frequencies fall in rank
      assert(r.getAs[Long]("n_types") > 1L)
    }
  }

  test("kappaOn: perfect agreement -> exactly +1000 milli") {
    import spark.implicits._
    val labels = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("c", "c"))
      .toDF("gold", "predicted")
    val r = Evaluate.kappaOn(labels).collect().head
    assert(r.getAs[Long]("kappa_milli") === 1000L)
    assert(r.getAs[Long]("po_ppm") === 1000000L)
  }

  test("kappaOn: constant prediction -> exactly 0 (pure chance)") {
    import spark.implicits._
    val labels = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "a"))
      .toDF("gold", "predicted")
    val r = Evaluate.kappaOn(labels).collect().head
    assert(r.getAs[Long]("kappa_milli") === 0L)
  }

  test("kappaOn: systematic label swap -> exactly -1000 (worse than chance)") {
    import spark.implicits._
    // ARI would call this perfect agreement (partition-identical);
    // kappa sees the swapped LABELS — the q233/q251 distinction
    val labels = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("b", "a"))
      .toDF("gold", "predicted")
    val r = Evaluate.kappaOn(labels).collect().head
    assert(r.getAs[Long]("kappa_milli") === -1000L)
    assert(r.getAs[Long]("po_ppm") === 0L)
    assert(r.getAs[Long]("pe_ppm") === 500000L)
  }

  test("cohenKappa wrapper: bounded, sign consistent with po - pe") {
    // the trigram heuristic is near chance on the 60-doc sample (its
    // accuracy is a sf0.01+ property, q233's ARI shows the same) — the
    // wrapper invariants are the bounds and the po/pe/kappa identity
    val r = Evaluate.cohenKappa(spark, sfDir).collect().head
    val k = r.getAs[Long]("kappa_milli")
    assert(k >= -1000L && k <= 1000L)
    val diff = r.getAs[Long]("po_ppm") - r.getAs[Long]("pe_ppm")
    // floor quantization can move a hair across zero; allow 1-milli slack
    assert(math.signum(k.toDouble) * math.signum(diff.toDouble) >= 0d
      || math.abs(k) <= 1L)
    assert(r.getAs[Long]("n_agree") <= r.getAs[Long]("n_docs"))
  }
}
