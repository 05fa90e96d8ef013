package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: OPQ dimension-permutation training (q300) and its
  * relationship to the q297/q265 audits it exists to answer. */
class Round14Spec extends SparkSpec {

  test("q300 opqPermute: planted anisotropy — permutation raises usage entropy, cuts distortion") {
    import spark.implicits._
    // fixture: ALL the variance lives in dims 0..7 — exactly the
    // identity layout's subspace 0; dims 8..63 are a shared constant.
    // Identity PQ spends one subspace's 8 codes on an 8-D spread and
    // wastes the other 7 subspaces' budget on a point mass (the q297
    // collapsed-subspace signal); the snake draft deals one hot dim to
    // each subspace, so every subspace's codes quantize a 1-D spread.
    val vecs = (0L until 512L).map { id =>
      val arr = Array.tabulate(64) { j =>
        if (j < 8) ((id * 131 + j * 17) % 997).toFloat / 100f
        else 0.25f
      }
      (id, arr)
    }.toDF("vec_id", "embedding")
    val rows = graft.operators.Quantize.opqPermuteVecs(vecs)
      .select($"variant", $"sub", $"n_vecs", $"n_codes_used",
        $"usage_ent_e4", $"mean_dist_q")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val base = rows.filter(_._1 == "base")
    val opq = rows.filter(_._1 == "opq")
    assert(base.length === 8 && opq.length === 8)
    assert(rows.forall(_._3 == 512L))
    // identity layout: the 7 cold subspaces collapse onto one code
    // (zero entropy, zero distortion), the hot one carries everything
    val coldBase = base.filter(_._5 == 0L)
    assert(coldBase.length >= 7,
      s"expected >=7 collapsed base subspaces, got ${coldBase.length}")
    // the permutation spreads the budget: EVERY subspace uses >1 code...
    assert(opq.forall(_._4 > 1L),
      s"opq left a collapsed subspace: ${opq.mkString(", ")}")
    // ...total usage entropy rises and total distortion falls
    val entBase = base.map(_._5).sum; val entOpq = opq.map(_._5).sum
    val distBase = base.map(_._6).sum; val distOpq = opq.map(_._6).sum
    info(s"usage entropy e4: base $entBase -> opq $entOpq; " +
      s"mean distortion q: base $distBase -> opq $distOpq")
    assert(entOpq > entBase,
      s"entropy did not rise: $entBase -> $entOpq")
    assert(distOpq < distBase,
      s"distortion did not fall: $distBase -> $distOpq")
  }

  test("q301 unigramEmStepOn matches an in-memory Viterbi-EM model") {
    import spark.implicits._
    val wordFreqs = Seq("hello" -> 10L, "help" -> 6L, "hell" -> 3L,
      "lo" -> 8L, "ohh" -> 2L, "shellfish" -> 4L, "she" -> 7L)
      .map { case (w, f) => (w.take(8), f) }
    val got = graft.operators.TextAnalysis
      .unigramEmStepOn(wordFreqs.toDF("w", "freq"), topN = 50)
      .as[(String, Long, Long)].collect()
      .map { case (p, c, r) => (p, c, r) }.toSeq.sortBy(_._3)
    // in-memory model: same candidate rule, same quantized scores, same
    // DP tie-breaks, same M-step
    val cnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wordFreqs; i <- 0 until w.length;
         l <- 1 to math.min(4, w.length - i))
      cnt(w.substring(i, i + l)) = cnt.getOrElse(w.substring(i, i + l), 0L) + f
    val kept = cnt.filter { case (p, c) => c >= 5L || p.length == 1 }
    val tot = kept.values.sum
    val sq = kept.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / tot.toDouble) * 1e6 + 1.0 / 3).toLong
    }
    def segment(w: String): Seq[String] = {
      val sc = Array.fill(w.length + 1)(Long.MinValue)
      val bl = Array.fill(w.length + 1)(0)
      sc(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
        val piece = w.substring(i - l, i)
        if (sc(i - l) != Long.MinValue && sq.contains(piece)) {
          val s = sc(i - l) + sq(piece)
          // ties -> smaller l; l ascends here, so strict > keeps the first
          if (s > sc(i)) { sc(i) = s; bl(i) = l }
        }
      }
      var pos = w.length
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (pos > 0) { out += w.substring(pos - bl(pos), pos); pos -= bl(pos) }
      out.toSeq
    }
    val emc = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- wordFreqs; p <- segment(w))
      emc(p) = emc.getOrElse(p, 0L) + f
    val expected = emc.toSeq.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex.map { case ((p, c), i) => (p, c, (i + 1).toLong) }
      .take(50)
    assert(got === expected, s"\ngot:      $got\nexpected: $expected")
  }

  test("q302 sketch-Jaccard: union estimate dominates singles, tracks the exact Jaccard") {
    import spark.implicits._
    val rows = SparkEntry.queries("q302_sketch_jaccard")(spark, sfDir)
      .select($"src_a", $"src_b", $"hll_a", $"hll_b", $"hll_union",
        $"exact_jaccard_ppm", $"sketch_jaccard_ppm")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ha, hb, hu) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // max-merged registers dominate each side's registers, and the
      // estimate is monotone in the registers
      assert(hu >= math.max(ha, hb), s"union est below a side: $r")
      assert(hu <= ha + hb, s"union est above the sum: $r")
      // 256 registers ≈ 6.5% per-cardinality error; the Jaccard composed
      // through inclusion–exclusion stays within coarse agreement
      val (ej, sj) = (r.getLong(5), r.getLong(6))
      assert(math.abs(ej - sj) < 300000L,
        s"sketch Jaccard off by ${math.abs(ej - sj)} ppm: $r")
    }
  }

  test("q303 compression: consistent with the q301 segmentation's totals") {
    import spark.implicits._
    val row = SparkEntry.queries("q303_unigram_comp")(spark, sfDir).collect()(0)
    val (types, toks, chars, pieces) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(types > 0 && toks >= types)
    // multi-char pieces exist, so the segmentation spends strictly fewer
    // pieces than characters; and at least one piece per word occurrence
    assert(pieces < chars, s"no compression: $pieces pieces / $chars chars")
    assert(pieces >= toks, s"fewer pieces than tokens: $pieces < $toks")
    assert(row.getLong(4) === pieces * 1000 / toks)
    assert(row.getLong(5) === chars * 1000000 / pieces)
  }

  test("q304 probe sweep: recall is monotone in nprobe and matches q290 at the q284 operating point") {
    import spark.implicits._
    val sweep = SparkEntry.queries("q304_probe_sweep")(spark, sfDir)
      .select($"nprobe", $"recall_ppm")
      .as[(Long, Long)].collect().toMap
    assert(sweep.keySet === Set(1L, 2L, 4L))
    // more probes can only add candidates — recall is non-decreasing
    assert(sweep(1L) <= sweep(2L) && sweep(2L) <= sweep(4L),
      s"recall not monotone in nprobe: $sweep")
    // nprobe=2 is q38/q284's operating point; the exact-scoring recall
    // there must clear the deployment gate the ADC path is held to
    assert(sweep(2L) >= 600000L, s"nprobe=2 recall below gate: ${sweep(2L)}")
  }

  test("q300 base variant IS q297/q265 on the shared columns (one report, same disciplines)") {
    import spark.implicits._
    val base = SparkEntry.queries("q300_opq_permute")(spark, sfDir)
      .where($"variant" === "base")
    val ent = graft.operators.Quantize.codeUsage(spark, sfDir)
      .select($"sub", $"n_codes_used", $"usage_ent_e4")
    val dist = graft.operators.Quantize.pqDistortion(spark, sfDir)
      .select($"sub", $"n_vecs", $"mean_dist_q")
    val joined = base.join(ent.withColumnRenamed("n_codes_used", "e_ncu")
        .withColumnRenamed("usage_ent_e4", "e_ent"), Seq("sub"))
      .join(dist.withColumnRenamed("n_vecs", "d_nv")
        .withColumnRenamed("mean_dist_q", "d_mdq"), Seq("sub"))
    assert(joined.count() === 8)
    assert(joined.where($"n_codes_used" =!= $"e_ncu"
      || $"usage_ent_e4" =!= $"e_ent"
      || $"n_vecs" =!= $"d_nv"
      || $"mean_dist_q" =!= $"d_mdq").isEmpty,
      "q300 base stats diverge from q297/q265")
  }
}
