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

  // ---- q251 Cohen's kappa -------------------------------------------------

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
