package graft

import org.apache.spark.sql.functions._

/** Round-14 second batch: Lomb–Scargle (q305), suffix-sort cross-doc
  * repeats (q306), interval-overlap join (q307), residual quantization
  * (q308), isotonic calibration (q309), KMV sketch intersection (q310).
  * Each test drives the operator core on a planted fixture with a known
  * analytic or brute-force answer. */
class Round14bSpec extends SparkSpec {

  test("q305 lombScargle: planted uneven-sampled sinusoid peaks at its true frequency") {
    import spark.implicits._
    // 64 samples with deterministic irregular jitter; value is a pure
    // k=3 sinusoid of the rebased phase — the grid the operator scans
    val times = (0 until 64).map(i => i * 1000L + (i.toLong * i * 37) % 500)
    val t0 = times.min; val span = times.max - t0
    val sine = times.map { t =>
      val phase = (3.0 * (t - t0) / span) * 2 * math.Pi
      ("sine", t, 100.0 + 50.0 * math.sin(phase))
    }
    // a flat series (zero variance — the VV guard must drop it) and a
    // short one (n < 16 — the length guard must drop it)
    val flat = (0 until 32).map(i => ("flat", i * 997L, 42.0))
    val short = (0 until 5).map(i => ("short", i * 1000L, i.toDouble))
    val ev = (sine ++ flat ++ short).toDF("event_type", "tms", "value")
    val rows = graft.operators.Spectral.lombScargleOn(ev)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.forall(_._1 == "sine"),
      s"guards failed: ${rows.map(_._1).distinct.mkString(",")}")
    assert(rows.length === 8)
    val byK = rows.map(r => r._2 -> r._4).toMap
    info(s"power_milli by k: ${byK.toSeq.sortBy(_._1).mkString(", ")}")
    // normalized power ≈ 1 at the true frequency, small leakage elsewhere
    assert(byK(3L) > 900L, s"k=3 power ${byK(3L)}")
    assert((1L to 8L).filter(_ != 3L).forall(k => byK(k) < byK(3L)),
      s"k=3 is not the argmax: $byK")
  }

  test("q306 suffixDupOn matches a brute-force cross-doc LCP model") {
    import spark.implicits._
    val p = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"alpha beta $p and then some xxa"),
      (2L, s"gamma delta $p and then some yyb"),
      (3L, "completely unrelated words only here zebra"),
      (4L, "more unrelated text zebra plus padding words")).toDF("doc_id", "text")
    val got = graft.operators.Dedup.suffixDupOn(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // brute model: word-start suffixes capped at 48, all cross-doc pairs
    val texts = Map(1L -> s"alpha beta $p and then some xxa",
      2L -> s"gamma delta $p and then some yyb",
      3L -> "completely unrelated words only here zebra",
      4L -> "more unrelated text zebra plus padding words")
    val sfx = texts.toSeq.flatMap { case (id, t) =>
      (0 until t.length).filter(i => i == 0 || t(i - 1) == ' ')
        .filter(i => t(i) != ' ')
        .map(i => (id, t.substring(i, math.min(t.length, i + 48))))
    }.distinct
    def lcp(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val expect = texts.keys.map { id =>
      val best = (for {
        (da, sa) <- sfx if da == id
        (db, sb) <- sfx if db != id
      } yield (lcp(sa, sb).toLong,
        sa.substring(0, lcp(sa, sb)))).max
      id -> best
    }.toMap
    texts.keys.foreach { id =>
      assert(got(id)._2 === expect(id)._1,
        s"doc $id max_lcp: got ${got(id)._2}, brute ${expect(id)._1}")
      assert(got(id)._3 === expect(id)._2,
        s"doc $id top_sub: got '${got(id)._3}', brute '${expect(id)._2}'")
    }
    // the planted phrase dominates docs 1/2 and respects the 48-char cap
    assert(got(1L)._2 >= p.length && got(1L)._2 <= 48L)
    assert(got(1L)._3.startsWith("the quick brown fox"))
  }

  test("q307 intervalOverlap equals the brute inequality join, duplicate-free") {
    import spark.implicits._
    // nested / touching / disjoint / spanning intervals on both sides
    val as = Seq((1L, 0L, 100L), (2L, 90L, 110L), (3L, 200L, 200L),
      (4L, 50L, 60L), (5L, 500L, 5000L), (6L, 109L, 150L))
      .toDF("aid", "s_lo", "s_hi")
    val bs = Seq((10L, 100L, 200L), (11L, 0L, 49L), (12L, 1000L, 1001L),
      (13L, 55L, 58L), (14L, 201L, 300L))
      .toDF("bid", "e_lo", "e_hi")
    val got = graft.operators.RangeJoin
      .intervalOverlap(as, bs, "s_lo", "s_hi", "e_lo", "e_hi", width = 64L)
      .select($"aid", $"bid").as[(Long, Long)].collect().sorted.toSeq
    val brute = as.as("a").join(bs.as("b"),
        $"s_lo" <= $"e_hi" && $"e_lo" <= $"s_hi")
      .select($"aid", $"bid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === brute, s"got $got, brute $brute")
    assert(got.distinct.size === got.size, "bucketed rewrite duplicated a pair")
    // the touching pair (2, 10) at point 100 and (1, 10) at 100 are in
    assert(got.contains((2L, 10L)) && got.contains((1L, 10L)))
  }

  test("q308 rqEncodeOn: stage-2 residual codebook zeroes the planted residual patterns") {
    import spark.implicits._
    // centers c_i = 10 at dim i (vecs 0..7); residual patterns p_m = 0.5
    // at dim 8+m, planted on vecs 8..15 (one per center) and on every
    // later vector — so stage 2 must reconstruct exactly: d2 == 0
    def mk(center: Int, pat: Int): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(center) = 10f
      if (pat >= 0) a(8 + pat) = 0.5f
      a
    }
    val vecs = ((0 until 8).map(i => (i.toLong, mk(i, -1))) ++
      (8 until 16).map(j => (j.toLong, mk(j - 8, j - 8))) ++
      (16 until 256).map { id =>
        (id.toLong, mk(id % 8, (id / 8) % 8))
      }).toDF("vec_id", "embedding")
    val rows = graft.operators.Quantize.rqEncodeOn(vecs)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 256)
    val tail = rows.filter(_._1 >= 16L)
    // stage 1 lands on the planted center; d1 = ‖p‖² = 0.25
    assert(tail.forall(r => r._2 == r._1 % 8),
      "stage-1 assignment missed the planted center")
    assert(tail.forall(_._4 === 250000L),
      s"d1_q: ${tail.map(_._4).distinct.mkString(",")}")
    // stage 2 finds the exact residual pattern: d2 == 0, code = pattern
    assert(tail.forall(_._5 === 0L),
      s"d2_q nonzero: ${tail.filter(_._5 != 0L).take(3).mkString(",")}")
    assert(tail.forall(r => r._3 == (r._1 / 8) % 8),
      "stage-2 code is not the planted pattern")
  }

  test("q309 isotonicOn equals the brute minimax model and is monotone") {
    import spark.implicits._
    // a classic violator sequence: rates 1, 0, 1, 1, 0, 0, 1, 1 with
    // unequal weights — PAVA must pool the middle blocks
    val bins = Seq((0L, 2L, 2L), (1L, 3L, 0L), (2L, 1L, 1L), (3L, 2L, 2L),
      (4L, 4L, 0L), (5L, 1L, 0L), (6L, 3L, 3L), (7L, 2L, 2L))
      .toDF("bin", "n", "n_pos")
    val got = graft.operators.Evaluate.isotonicOn(bins)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // brute minimax over ppm-quantized block averages — the operator's
    // exact contract
    val b = Seq((0L, 2L, 2L), (1L, 3L, 0L), (2L, 1L, 1L), (3L, 2L, 2L),
      (4L, 4L, 0L), (5L, 1L, 0L), (6L, 3L, 3L), (7L, 2L, 2L))
    def avg(j: Int, k: Int): Long = {
      val n = b.slice(j, k + 1).map(_._2).sum
      val p = b.slice(j, k + 1).map(_._3).sum
      p * 1000000L / n
    }
    val expect = b.indices.map { i =>
      (0 to i).map(j => (i until b.size).map(k => avg(j, k)).min).max
    }
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r._5 === expect(i), s"bin $i: got ${r._5}, brute ${expect(i)}")
    }
    assert(got.map(_._5).sliding(2).forall(w => w(0) <= w(1)),
      s"isotonic fit not monotone: ${got.map(_._5).mkString(",")}")
    // pooling really happened: raw rates violate, fit differs from raw
    assert(got.exists(r => r._4 != r._5))
  }

  test("q310 kmvIntersectOn: sketches below k are exact — estimates equal the truth") {
    import spark.implicits._
    val xs = ('a' to 'j').map(c => ("x", s"tok_$c"))
    val ys = ('f' to 'o').map(c => ("y", s"tok_$c"))
    val rows = graft.operators.TextAnalysis
      .kmvIntersectOn((xs ++ ys).toDF("src", "tok"))
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("n_b") === 10L)
    assert(r.getAs[Long]("n_inter") === 5L)
    // vocab < k = 128: the sketch IS the set, every estimate is exact
    assert(r.getAs[Long]("kmv_a") === 10L && r.getAs[Long]("kmv_b") === 10L)
    assert(r.getAs[Long]("kmv_union") === 15L)
    assert(r.getAs[Long]("rho") === 5L)
    assert(r.getAs[Long]("kmv_inter") === 5L)
    assert(r.getAs[Long]("kmv_jac_ppm") === 333333L)
    assert(r.getAs[Long]("exact_jac_ppm") === 333333L)
  }

  test("q311 bloomFpOn matches a brute-force filter model on a planted vocabulary") {
    import spark.implicits._
    // 'aaa' sorts first -> it is the indexed set
    val en = (0 until 400).map(i => ("aaa", s"en_tok_$i"))
    val de = (0 until 300).map(i => ("bbb", s"de_tok_$i"))
    val fr = (0 until 100).map(i => ("ccc", s"fr_tok_$i")) ++
      Seq(("ccc", "en_tok_7")) // a TRUE member probe — must be excluded
    val rows = graft.operators.TextAnalysis
      .bloomFpOn((en ++ de ++ fr).toDF("src", "tok")).collect()
      .map(r => r.getAs[String]("src") -> r).toMap
    // brute model: same md5-slice positions mod 8192
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def positions(tok: String): Seq[Long] = {
      val h = md5hex(tok)
      Seq(0, 8, 16).map(o => java.lang.Long.parseLong(h.substring(o, o + 8), 16) % 8192L)
    }
    val bits = en.map(_._2).flatMap(positions).toSet
    def fps(probes: Seq[String]) =
      probes.count(t => positions(t).forall(bits.contains))
    assert(rows("bbb").getAs[Long]("n_bits_set") === bits.size.toLong)
    assert(rows("bbb").getAs[Long]("n_probes") === 300L)
    assert(rows("ccc").getAs[Long]("n_probes") === 100L,
      "true-member probe was not excluded")
    assert(rows("bbb").getAs[Long]("n_fp") === fps(de.map(_._2)).toLong)
    assert(rows("ccc").getAs[Long]("n_fp") ===
      fps(fr.map(_._2).filterNot(_ == "en_tok_7")).toLong)
    val fill = bits.size.toDouble / 8192
    val theory = math.floor(fill * fill * fill * 1e6 + 1.0 / 3).toLong
    assert(rows("bbb").getAs[Long]("theory_fp_ppm") === theory)
  }

  test("q312 ensembleDedup: mask census sums to the union, detectors agree with their cores") {
    import spark.implicits._
    val out = graft.operators.Dedup.ensembleDedup(spark, sfDir).collect()
      .map(r => r.getAs[String]("part") -> r).toMap
    val maskRows = out.filter { case (k, _) => k.startsWith("mask_") }
    val union = out("union")
    assert(maskRows.values.map(_.getAs[Long]("n_pairs")).sum ===
      union.getAs[Long]("n_pairs"),
      "mask census does not sum to the union pair count")
    assert(maskRows.keys.forall(k =>
      (1L to 7L).contains(k.stripPrefix("mask_").toLong)))
    assert(union.getAs[Long]("n_clusters") >= 1L)
    assert(union.getAs[Long]("max_cluster") >= 2L)
    // per-detector totals re-derived from the cores: a pair carries
    // detector bit b iff that core emitted it
    val mh = graft.operators.Dedup.minhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val minhashMass = maskRows.collect {
      case (k, r) if (k.stripPrefix("mask_").toLong & 1L) != 0 =>
        r.getAs[Long]("n_pairs")
    }.sum
    assert(minhashMass === mh.size.toLong,
      s"minhash mask mass $minhashMass != core pairs ${mh.size}")
  }

  test("q313 knCrossEntropyOn matches an in-memory Kneser-Ney model") {
    import spark.implicits._
    val docs = Seq(("A", "a b a c a b"), ("A", "b c a b"),
      ("B", "c c a b a"), ("B", "a c"))
      .toDF("source", "text")
    val got = graft.operators.TextAnalysis.knCrossEntropyOn(docs)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // brute: same discount, same continuation counts, same quantization
    val corpus = Seq(("A", "a b a c a b"), ("A", "b c a b"),
      ("B", "c c a b a"), ("B", "a c"))
    val bgs = corpus.flatMap { case (s, t) =>
      val w = t.split(" ", -1); w.indices.dropRight(1).map(i => (s, w(i), w(i + 1)))
    }
    val c12 = bgs.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1r = c12.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val cont = c12.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nb = c12.size.toLong
    def lnq(w1: String, w2: String): Long = {
      val p = math.max(c12((w1, w2)).toDouble - 0.75, 0.0) / c1(w1) +
        ((0.75 * n1r(w1)) / c1(w1)) * (cont(w2).toDouble / nb)
      math.floor(math.log(p) * 10000 + 1.0 / 3).toLong
    }
    corpus.map(_._1).distinct.foreach { src =>
      val mine = bgs.filter(_._1 == src)
      val ce = -mine.map(b => lnq(b._2, b._3)).sum / mine.size
      assert(got(src)._2 === mine.size.toLong, s"$src n_bigrams")
      assert(got(src)._3 === ce, s"$src ce: got ${got(src)._3}, brute $ce")
    }
  }

  test("q314 confidentJoint matches a driver-side re-derivation on testdata") {
    import spark.implicits._
    val scored = graft.operators.TextAnalysis.hashClassifier(spark, sfDir)
      .where($"n_tokens" > 0L)
      .select($"doc_id", $"n_tokens", $"margin")
      .as[(Long, Long, Long)].collect()
    val labs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val s = scored.map { case (id, n, m) =>
      (if (labs(id) == "en") "en" else "other",
        (m + 100 * n) * 1000000L / n)
    }
    def mean(xs: Seq[Long]) = xs.sum / xs.size
    val tEn = mean(s.filter(_._1 == "en").map(_._2).toSeq)
    val tOth = mean(s.filter(_._1 == "other").map(_._2).map(2e8.toLong - _).toSeq)
    val assigned = s.flatMap { case (y, sc) =>
      val cEn = sc >= tEn; val cOth = (200000000L - sc) >= tOth
      if (cEn && cOth)
        Some((y, if ((sc - tEn) >= (200000000L - sc - tOth)) "en" else "other"))
      else if (cEn) Some((y, "en"))
      else if (cOth) Some((y, "other"))
      else None
    }
    val expect = assigned.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.operators.Evaluate.confidentJoint(spark, sfDir)
      .select($"y", $"j_hat", $"n").as[(String, String, Long)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap === expect,
      s"confident joint mismatch: got ${got.mkString(",")}, expect $expect")
    // the estimator found SOME confident off-diagonal mass or none —
    // either way the census must cover every assigned doc exactly once
    assert(got.map(_._3).sum === assigned.size.toLong)
  }

  test("q316 dupCoverageOn matches a brute interval-merge model") {
    import spark.implicits._
    val p = "the quick brown fox jumps over the lazy dog"
    val q1 = "one two three four five six seven"
    val q2 = "eight nine ten eleven twelve thirteen"
    val texts = Map(
      1L -> s"alpha beta $p and then some xxa",
      2L -> s"gamma delta $p and then some yyb",
      3L -> "completely unrelated words only here zebra",
      5L -> s"$q1 spacer filler words $q2",
      6L -> s"$q1 other unrelated middle $q2")
    val got = graft.operators.Dedup
      .dupCoverageOn(texts.toSeq.toDF("doc_id", "text"), minLen = 20)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // brute: per word-start suffix, best cross-doc LCP (48-capped);
    // spans >= 20 merged per doc
    val sfx = texts.toSeq.flatMap { case (id, t) =>
      (0 until t.length).filter(i => i == 0 || t(i - 1) == ' ')
        .filter(i => t(i) != ' ')
        .map(i => (id, i + 1, t.substring(i, math.min(t.length, i + 48))))
    }
    def lcp(a: String, b: String): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    texts.foreach { case (id, t) =>
      val spans = sfx.filter(_._1 == id).flatMap { case (_, pos, s) =>
        val m = sfx.filter(_._1 != id).map(o => lcp(s, o._3))
          .foldLeft(-1)(math.max)
        if (m >= 20) Some((pos.toLong, pos.toLong + m)) else None
      }.sortBy(x => (x._1, x._2))
      val merged = spans.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }
      val covered = merged.map { case (s, e) => e - s }.sum
      assert(got(id)._3 === merged.size.toLong, s"doc $id n_spans")
      assert(got(id)._4 === covered, s"doc $id covered: got ${got(id)._4}, brute $covered")
      assert(got(id)._5 === covered * 1000000L / t.length, s"doc $id ppm")
    }
    // the two-phrase docs produce exactly two islands each
    assert(got(5L)._3 === 2L && got(6L)._3 === 2L)
    // the unrelated doc is uncovered
    assert(got(3L)._4 === 0L)
  }

  test("q315 hopkinsOn separates clustered from quasi-uniform data") {
    import spark.implicits._
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    // 3 tight 2-D blobs far apart — strongly clustered
    val clustered = (0 until 300).map { i =>
      val c = i % 3
      val (cx, cy) = Seq((0.0, 0.0), (100.0, 0.0), (0.0, 100.0))(c)
      (i.toLong, Array((cx + (h32(s"x$i") % 100) / 100.0).toFloat,
        (cy + (h32(s"y$i") % 100) / 100.0).toFloat))
    }
    val hC = graft.operators.Similarity
      .hopkinsOn(clustered.toDF("vec_id", "embedding"))
      .select($"hopkins_ppm").as[Long].head()
    // hash-scattered quasi-uniform square
    val uniform = (0 until 300).map { i =>
      (i.toLong, Array((h32(s"u$i") % 10000) / 100.0f,
        (h32(s"v$i") % 10000) / 100.0f))
    }
    val hU = graft.operators.Similarity
      .hopkinsOn(uniform.toDF("vec_id", "embedding"))
      .select($"hopkins_ppm").as[Long].head()
    info(s"hopkins: clustered $hC ppm, uniform $hU ppm")
    assert(hC > 800000L, s"clustered corpus read as unclustered: $hC")
    assert(hU > 300000L && hU < 700000L,
      s"uniform corpus did not read ~0.5: $hU")
    assert(hC > hU + 200000L)
  }

  test("q310 kmvIntersect on testdata: sketch Jaccard tracks the exact Jaccard") {
    import spark.implicits._
    val rows = graft.operators.TextAnalysis.kmvIntersect(spark, sfDir)
      .select($"exact_jac_ppm", $"kmv_jac_ppm").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // k = 128 gives σ(J) ≈ sqrt(J(1−J)/k) ≲ 0.045 — gate at 4σ
    rows.foreach { case (exact, kmv) =>
      assert(math.abs(exact - kmv) < 180000L,
        s"sketch Jaccard off by ${math.abs(exact - kmv)} ppm")
    }
  }
}
