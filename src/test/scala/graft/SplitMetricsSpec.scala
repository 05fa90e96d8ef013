package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Evaluate, Sampling, Similarity, TextAnalysis, Timeseries}

/** q135 temporal split, q136 Fleiss' kappa, q137 vocab growth, q138
  * hubness, q139 Markov transitions, q140 Good-Turing, q141 conformal
  * threshold, q142 rank overlap — in-memory model parity on sf0.001.
  * Models recompute from raw rows with plain Scala collections,
  * independent of the operators' plans.
  */
class SplitMetricsSpec extends SparkSpec {

  private lazy val events: Array[(Long, Long, String, Long)] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", unix_millis($"ts"))
      .as[(Long, Long, String, Long)].collect()
  }

  private lazy val docs: Array[(Long, String, String, Long)] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"source", $"n_chars")
      .as[(Long, String, String, Long)].collect()
  }

  private lazy val vecs: Array[(Long, Array[Float])] = {
    import spark.implicits._
    graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
  }

  // strict left-to-right double accumulation, the VectorOps contract
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  test("q135 split sizes: one test + one val per multi-event user, no leakage") {
    val byUser = events.groupBy(_._2)
    // model: sort each user ascending, last = test, second-last = val
    val labelled = byUser.toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      sorted.zipWithIndex.map { case (e, i) =>
        val split =
          if (i == sorted.length - 1) "test"
          else if (i == sorted.length - 2) "val" else "train"
        (split, e._3, e._2)
      }
    }
    val expect = labelled.groupBy(l => (l._1, l._2)).map { case (k, xs) =>
      k -> (xs.size.toLong, xs.map(_._3).distinct.size.toLong)
    }
    val got = Sampling.temporalSplit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    // every user contributes exactly one test event
    val nUsers = byUser.size.toLong
    assert(got.filter(_._1._1 == "test").values.map(_._1).sum == nUsers)
  }

  test("q136 Fleiss' kappa matches the textbook P-bar computation") {
    val votes = docs.map { case (_, t, _, _) =>
      val nc = t.length
      val punct = t.count(".!?,;".contains(_))
      val digits = t.count(_.isDigit)
      Seq(nc >= 200, t.toLowerCase.contains(" the "),
        punct * 20 >= nc, digits * 50 <= nc).count(identity)
    }
    val n = votes.length.toDouble
    val pBar = votes.map { s => (s * s + (4 - s) * (4 - s) - 4) / 12.0 }.sum / n
    val p1 = votes.sum / (4.0 * n)
    val pe = p1 * p1 + (1 - p1) * (1 - p1)
    val kappa = (pBar - pe) / (1 - pe)
    val row = Curation.fleissKappa(spark, sfDir).collect().head
    val gotPpm = row.getAs[Long]("kappa_ppm")
    // the operator truncates an exact rational; the double model is
    // within one ppm of it
    assert(math.abs(gotPpm - kappa * 1e6) <= 1.0, s"$gotPpm vs ${kappa * 1e6}")
    // integer identity: ppm is the truncated num/den fraction (Scala /
    // and Spark div share truncate-toward-zero semantics)
    assert(row.getAs[Long]("kappa_ppm") ==
      row.getAs[Long]("kappa_num") * 1000000L / row.getAs[Long]("kappa_den"))
  }

  test("q137 vocab growth: deciles partition docs, final row equals corpus totals") {
    val n = docs.length
    val dec = (id: Long) => math.min(id * 10 / n, 9L)
    val perDoc = docs.map { case (id, t, _, _) => (dec(id), t.split(" ", -1)) }
    val expectVocabCum = (0L to 9L).map { d =>
      d -> perDoc.filter(_._1 <= d).flatMap(_._2).distinct.length.toLong
    }.toMap
    val got = TextAnalysis.vocabGrowth(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(got.keySet == (0L to 9L).toSet)
    got.foreach { case (d, (docsCum, toksCum, vocabCum)) =>
      assert(docsCum == perDoc.count(_._1 <= d).toLong)
      assert(toksCum == perDoc.filter(_._1 <= d).map(_._2.length.toLong).sum)
      assert(vocabCum == expectVocabCum(d), s"decile $d")
    }
    // growth curve is monotone and ends at the full corpus vocab
    assert(got(9L)._3 == perDoc.flatMap(_._2).distinct.length.toLong)
  }

  test("q138 hubness matches brute-force reverse-kNN over the banded candidates") {
    val signs = (0 until 16).map { p =>
      (0 until 64).map { d0 =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$p:${d0 + 1}".getBytes("UTF-8"))
        if ((hex(0) & 0x80) != 0) 1.0f else -1.0f
      }.toArray
    }
    def bandBits(v: Array[Float]): Seq[(Int, Long)] =
      (0 until 4).map { b =>
        b -> (0 until 4).map { j =>
          if (dot(v, signs(4 * b + j).map(_.toFloat)) > 0.0) 1L << j else 0L
        }.sum
      }
    val sigs = vecs.map { case (id, v) => (id, v, bandBits(v)) }
    // per-bucket candidate-target cap (B=64, hash-chosen), mirroring the
    // operator's bucketCapped rule — a no-op when buckets are small
    def hubDraw(band: Int, bits: Long, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"hub:$band:$bits:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val inCap: Set[((Int, Long), Long)] = sigs
      .flatMap { case (id, _, bb) => bb.map(k => (k, id)) }
      .groupBy(_._1).toSeq.flatMap { case (k, xs) =>
        xs.map(_._2).sortBy(id => (hubDraw(k._1, k._2, id), id))
          .take(64).map(id => (k, id))
      }.toSet
    val cand = for {
      (qa, va, ba) <- sigs; (qb, vb, bb) <- sigs
      if qa != qb && ba.exists(k => bb.contains(k) && inCap((k, qb)))
    } yield (qa, qb, dot(va, vb) / (nrm(va) * nrm(vb)))
    val expect = cand.groupBy(_._1).toSeq.flatMap { case (_, cs) =>
      cs.sortBy(c => (-c._3, c._2)).take(3).map(_._2)
    }.groupBy(identity).map { case (id, xs) => id -> xs.size.toLong }
    val got = Similarity.hubness(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("q139 transition matrix: rows sum to row_total, ppm near-normalized") {
    val got = Timeseries.markovTransitions(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // model: per-user consecutive pairs in (ts, event_id) order
    val expect = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1)).map(_._3)
      sorted.zip(sorted.drop(1))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val gotCounts = got.map(g => (g._2, g._1) -> g._3).toMap
    assert(gotCounts == expect)
    // row-normalization invariant
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == rows.head._4)
      val ppmSum = rows.map(_._5).sum
      assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.size)
    }
  }

  test("q140 Good-Turing: sum(r*N_r) = corpus tokens; r* matches the estimator") {
    val counts = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map(_._2.length.toLong)
    val nr = counts.groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    val got = TextAnalysis.goodTuring(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.view.mapValues(_._1).toMap == nr)
    got.foreach { case (r, (n_r, rStar)) =>
      val expected = nr.get(r + 1).map(n1 => (r + 1) * n1 * 1000000L / n_r)
        .getOrElse(0L)
      assert(rStar == expected, s"r=$r")
    }
    assert(got.map { case (r, (n_r, _)) => r * n_r }.sum ==
      docs.map(_._2.split(" ", -1).length.toLong).sum)
  }

  test("q141 conformal threshold is the k-th order statistic, coverage >= 90%") {
    val bySource = docs.groupBy(_._3)
    val got = Evaluate.conformalThreshold(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    bySource.foreach { case (src, ds) =>
      val scores = ds.map(_._4).sorted
      val n = scores.length.toLong
      val k = math.min((9 * (n + 1) + 9) / 10, n)
      val (gn, gk, thr) = got(src)
      assert(gn == n && gk == k)
      assert(thr == scores((k - 1).toInt))
      // the conformal guarantee this threshold encodes
      assert(scores.count(_ <= thr) * 10 >= n * 9)
    }
    assert(got.keySet == bySource.keySet)
  }

  test("q143 RRF fusion matches the integer reciprocal-rank model") {
    val qs = vecs.filter(_._1 < 10)
    val expect = qs.flatMap { case (qid, qv) =>
      val scored = vecs.filter(_._1 != qid).map { case (id, v) =>
        (id, dot(qv, v), dot(qv, v) / (nrm(qv) * nrm(v)))
      }
      val rkCos = scored.sortBy(s => (-s._3, s._1)).zipWithIndex
        .map { case (s, i) => s._1 -> (i + 1) }.toMap
      val rkDot = scored.sortBy(s => (-s._2, s._1)).zipWithIndex
        .map { case (s, i) => s._1 -> (i + 1) }.toMap
      scored.map(_._1)
        .map(id => (id, 1000000000L / (60 + rkCos(id)) + 1000000000L / (60 + rkDot(id))))
        .sortBy { case (id, r) => (-r, id) }.take(5).zipWithIndex
        .map { case ((id, r), i) => (qid, (i + 1).toLong, id, r) }
    }.toSet
    val got = graft.operators.Similarity.rrfFusion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("q144 KS distance matches the brute two-sample statistic") {
    val bySource = docs.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    val grid = docs.map(_._4).distinct.sorted
    val srcs = bySource.keys.toSeq.sorted
    val expect = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = bySource(srcs(i)); b = bySource(srcs(j))
    } yield {
      val dNum = grid.map(s =>
        math.abs(a.count(_ <= s).toLong * b.length - b.count(_ <= s).toLong * a.length)).max
      (srcs(i), srcs(j)) -> (a.length.toLong, b.length.toLong, dNum,
        dNum * 1000000L / (a.length.toLong * b.length))
    }).toMap
    val got = graft.operators.Evaluate.ksTest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
  }

  test("q145 entropy rate: quantized terms sum, bounded by ln|types|") {
    val got = Timeseries.entropyRate(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // model: recompute the quantized-term sum from raw transitions
    val trans = events.groupBy(_._2).toSeq.flatMap { case (_, evs) =>
      val s = evs.sortBy(e => (e._4, e._1)).map(_._3)
      s.zip(s.drop(1))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val byPrev = trans.groupBy(_._1._1)
    val expect = byPrev.map { case (prev, m) =>
      val rt = m.values.sum
      val hq = m.values.map { n =>
        math.floor((n.toDouble / rt) * math.log(rt.toDouble / n) * 1e6 + 1.0 / 3).toLong
      }.sum
      prev -> (rt, m.size.toLong, hq)
    }
    assert(got == expect)
    // H(next|prev) <= ln(n_succ) + quantization slack
    got.values.foreach { case (_, nSucc, hq) =>
      assert(hq <= (math.log(nSucc.toDouble) * 1e6).toLong + nSucc)
      assert(hq >= 0L)
    }
  }

  test("q146 langid margin: sorted-score picks, low-conf iff margin*4 < top") {
    val got = TextAnalysis.langidMargin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    def occ(t: String, p: String): Long = {
      (t.length - t.replace(p, "").length).toLong / p.length
    }
    val profs = Seq(
      "en" -> Seq("the", "he ", "nd "), "de" -> Seq("der", "ein", "sch"),
      "fr" -> Seq("le ", "ent", "es "), "es" -> Seq("de ", "la ", "os "))
    docs.foreach { case (id, t, _, _) =>
      val scores = profs.map { case (l, ps) => l -> ps.map(occ(t, _)).sum }
      val sorted = scores.map(_._2).sorted
      val (sTop, sSecond) = (sorted(3), sorted(2))
      val (gp, gt, gs, gm, gl) = got(id)
      assert(gt == sTop && gs == sSecond && gm == sTop - sSecond)
      assert(gl == (if ((sTop - sSecond) * 4 < sTop) 1L else 0L))
      // predicted is the fixed-precedence argmax
      val sm = scores.toMap
      val pred =
        if (sm("en") >= sm("de") && sm("en") >= sm("fr") && sm("en") >= sm("es")) "en"
        else if (sm("de") >= sm("fr") && sm("de") >= sm("es")) "de"
        else if (sm("fr") >= sm("es")) "fr" else "es"
      assert(gp == pred)
    }
  }

  test("q147 source profile matches per-source brute stats incl. lower median") {
    val got = graft.operators.Relational.sourceProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    docs.groupBy(_._3).foreach { case (src, ds) =>
      val n = ds.length.toLong
      val toks = ds.map(_._2.split(" ", -1).length.toLong).sum
      val chars = ds.map(_._4)
      val lower = chars.sorted.apply(((n + 1) / 2 - 1).toInt)
      val langs = {
        import spark.implicits._
        graft.sources.Tables.documents(spark, sfDir)
          .where($"source" === src).select($"lang").distinct().count()
      }
      val en = {
        import spark.implicits._
        graft.sources.Tables.documents(spark, sfDir)
          .where($"source" === src && $"lang" === "en").count()
      }
      assert(got(src) == ((n, toks, chars.sum / n, lower, langs,
        en * 1000000L / n)), src)
    }
  }

  test("q148 Gini matches the sorted-counts formula and is in [0, 1)") {
    val counts = events.groupBy(_._2).values.map(_.size.toLong).toSeq.sorted
    val n = counts.length.toLong
    val s = counts.sum
    val iw = counts.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val gNum = 2 * iw - (n + 1) * s
    val row = graft.operators.Relational.activityGini(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_users") == n)
    assert(row.getAs[Long]("total_events") == s)
    assert(row.getAs[Long]("g_num") == gNum)
    assert(row.getAs[Long]("g_den") == n * s)
    val ppm = row.getAs[Long]("gini_ppm")
    assert(ppm == gNum * 1000000L / (n * s))
    assert(ppm >= 0L && ppm < 1000000L)
  }

  test("q149 PSI matches the quantized-term model; identical halves give ~0") {
    val got = graft.operators.Relational.psiDrift(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val mid = 1705363200000L
    val ev = {
      import spark.implicits._
      graft.sources.Tables.events(spark, sfDir)
        .select($"event_type", floor($"value" * 100).cast("long"),
          unix_millis($"ts"))
        .as[(String, Long, Long)].collect()
    }
    val expect = ev.groupBy(_._1).map { case (t, xs) =>
      val lo = xs.map(_._2).min; val hi = xs.map(_._2).max
      val binned = xs.map(x => (((x._2 - lo) * 10) / (hi + 1 - lo), x._3 < mid))
      val byBin = binned.groupBy(_._1)
      val na = binned.count(_._2).toLong; val nb = binned.count(!_._2).toLong
      val terms = byBin.toSeq.flatMap { case (_, bs) =>
        val a = bs.count(_._2).toLong; val b = bs.count(!_._2).toLong
        if (a > 0 && b > 0) {
          val pa = a.toDouble / na; val pb = b.toDouble / nb
          Some(math.floor((pa - pb) * math.log(pa / pb) * 1e6 + 1.0 / 3).toLong)
        } else None
      }
      t -> (terms.size.toLong, terms.sum)
    }
    assert(got == expect)
    // PSI is a sum of (p-q)ln(p/q) terms, each nonnegative up to
    // quantization slack of 1 per term
    got.values.foreach { case (nb, psi) => assert(psi >= -nb) }
  }

  test("q150 key-skew audit matches per-column brute counts and entropy") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
      .as[(Long, Long, Long)].collect()
    val got = graft.operators.Skew.keySkewAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val cols: Seq[(String, ((Long, Long, Long)) => Long)] = Seq(
      "l_orderkey" -> (_._1), "l_partkey" -> (_._2), "l_suppkey" -> (_._3))
    cols.foreach { case (name, f) =>
      val counts = li.map(f).groupBy(identity).map { case (k, xs) =>
        k -> xs.size.toLong
      }
      val nKeys = counts.size.toLong
      val nRows = li.length.toLong
      // struct-max tie-break: max count, then max key
      val (topK, topC) = counts.toSeq.maxBy { case (k, c) => (c, k) }
      val entropy = counts.values.map { c =>
        math.floor((c.toDouble / nRows) * math.log(nRows.toDouble / c) * 1e6
          + 1.0 / 3).toLong
      }.sum
      assert(got(name) == ((nKeys, nRows, topC, topK,
        topC * 1000000L / nRows, entropy)), name)
      // entropy never exceeds ln(n_keys) (+1-per-term quantization slack)
      assert(entropy <= (math.log(nKeys.toDouble) * 1e6).toLong + nKeys)
    }
  }

  test("q151 Theil-Sen slope matches the brute median-of-pairwise-slopes model") {
    val got = Timeseries.theilSen(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val hourly = events.groupBy(e => (e._3, e._4 / 3600000L))
      .map { case ((t, h), xs) => (t, h, xs.size.toLong) }
      .groupBy(_._1)
    val expect = hourly.map { case (t, hs) =>
      val pts = hs.map(x => (x._2, x._3)).toSeq.sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield ((pts(i)._1, pts(j)._1),
        (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1))
      val sorted = slopes.sortBy { case ((ha, hb), s) => (s, ha, hb) }
      val med = sorted(((sorted.length + 1) / 2 - 1).toInt)._2
      t -> (slopes.length.toLong,
        math.floor(med * 1e6 + 1.0 / 3).toLong)
    }
    assert(got == expect)
  }

  test("q152 hour-of-day profile: eta2 in [0,1e6], peak hour has the max mean score") {
    val got = graft.operators.Timeseries.hourOfDayProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    // model: recompute per-type from raw events with BigDecimal sums
    val raw = {
      import spark.implicits._
      graft.sources.Tables.events(spark, sfDir)
        .select($"event_type", unix_millis($"ts"), $"value")
        .as[(String, Long, Double)].collect()
    }
    raw.groupBy(_._1).foreach { case (t, xs) =>
      val (n, _, peakHod, eta2) = (got(t)._1, got(t)._2, got(t)._2, got(t)._4)
      assert(n == xs.length.toLong)
      assert(peakHod >= 0 && peakHod <= 23)
      assert(eta2 >= 0L && eta2 <= 1000000L, s"$t eta2=$eta2")
      // peak hod really has the maximal integer mean score
      val byH = xs.groupBy(x => (x._2 / 3600000L) % 24)
      val scores = byH.map { case (hod, ys) =>
        val sh = ys.map(y => BigDecimal(y._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum
        hod -> ((sh * 100).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
          * 1000000L / ys.size)
      }
      val best = scores.maxBy { case (hod, s) => (s, hod) }
      assert(best._1 == got(t)._2, s"$t peak")
    }
  }

  test("q153 Mann-Kendall S and tie-corrected variance match the brute model") {
    val got = Timeseries.mannKendall(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val hourly = events.groupBy(e => (e._3, e._4 / 3600000L))
      .map { case ((t, h), xs) => (t, h, xs.size.toLong) }.groupBy(_._1)
    val expect = hourly.map { case (t, hs) =>
      val cs = hs.toSeq.sortBy(_._2).map(_._3)
      val s = (for {
        i <- cs.indices; j <- (i + 1) until cs.length
      } yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
      val n = cs.length.toLong
      val tie18 = cs.groupBy(identity).values.map(_.size.toLong)
        .filter(_ > 1).map(tt => tt * (tt - 1) * (2 * tt + 5)).sum
      t -> (n, s, n * (n - 1) * (2 * n + 5) - tie18)
    }
    assert(got == expect)
    // S is bounded by the pair count
    got.values.foreach { case (n, s, _) =>
      assert(math.abs(s) <= n * (n - 1) / 2)
    }
  }

  test("q154 Lorenz deciles partition users exactly and end at 100%") {
    val got = graft.operators.Timeseries.lorenzDeciles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val counts = events.groupBy(_._2).values.map(_.size.toLong).toSeq.sorted
    val n = counts.length
    // model: rank-sliced deciles over the ascending counts
    val expect = (0 until 10).map { d =>
      val lo = (d * n + 9) / 10; val hi = ((d + 1) * n + 9) / 10
      val slice = counts.slice(lo, hi)
      d.toLong -> (slice.length.toLong, slice.sum)
    }.filter(_._2._1 > 0).toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == expect)
    // cumulative shares are monotone, deciles partition the population,
    // and the curve ends at exactly 100% of users and events
    assert(got.values.map(_._1).sum == n.toLong)
    assert(got.values.map(_._2).sum == counts.sum)
    val last = got(got.keys.max)
    assert(last._3 == 1000000L && last._4 == 1000000L)
    // Lorenz curve is convex-ish: event share never exceeds user share
    got.foreach { case (_, (_, _, up, ep)) => assert(ep <= up) }
  }

  test("q155 EB smoothing: shrinks toward the prior, monotone in n") {
    val got = graft.operators.Relational.ebSmoothedRates(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // the shared docs fixture lacks lang — pull (doc_id, lang, source) once
    val langs = {
      import spark.implicits._
      graft.sources.Tables.documents(spark, sfDir)
        .select($"doc_id", $"lang", $"source")
        .as[(Long, String, String)].collect()
    }
    val corpusPpm = langs.count(_._2 == "en").toLong * 1000000L / langs.length
    langs.groupBy(_._3).foreach { case (src, ds) =>
      val n = ds.length.toLong
      val nEn = ds.count(_._2 == "en").toLong
      val (gn, gne, gp, graw, gsm) = got(src)
      assert(gn == n && gne == nEn && gp == corpusPpm)
      assert(graw == nEn * 1000000L / n)
      assert(gsm == (nEn * 1000000L + 20L * corpusPpm) / (n + 20L))
      // shrinkage: smoothed sits between raw and the prior (integer
      // truncation can push it 1 ppm outside — allow that slack)
      val lo = math.min(graw, corpusPpm) - 1
      val hi = math.max(graw, corpusPpm) + 1
      assert(gsm >= lo && gsm <= hi, s"$src: $gsm not in [$lo, $hi]")
    }
  }

  test("q156 user surprisal matches the quantized transition-model score") {
    val got = Timeseries.userSurprisal(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val perUser = events.groupBy(_._2).view.mapValues { evs =>
      val s = evs.sortBy(e => (e._4, e._1)).map(_._3)
      s.zip(s.drop(1))
    }.toMap
    val model = perUser.values.flatten.groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val rowTot = model.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val termQ = model.map { case (k, n) =>
      k -> math.floor(math.log(rowTot(k._1).toDouble / n) * 1e6 + 1.0 / 3).toLong
    }
    perUser.foreach { case (uid, trans) =>
      if (trans.nonEmpty) {
        val sq = trans.map(termQ).sum
        assert(got(uid) == ((trans.length.toLong, sq, sq / trans.length)), uid)
      } else assert(!got.contains(uid))
    }
    // surprisal is nonnegative (p <= 1 for every transition)
    got.values.foreach { case (_, sq, _) => assert(sq >= 0L) }
  }

  test("q157 coverage curve matches the ranked-vocab cumulative model") {
    val got = TextAnalysis.coverageCurve(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val counts = docs.flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
    val ranked = counts.sortBy { case (t, tf) => (-tf, t) }
    val total = counts.map(_._2).sum
    val vocab = counts.length.toLong
    Seq(10, 20, 50, 100, 200, 500, 1000).filter(_ <= vocab).foreach { k =>
      val covered = ranked.take(k).map(_._2).sum
      assert(got(k.toLong) == ((covered, total, vocab,
        covered * 1000000L / total)), s"k=$k")
    }
    assert(got.keySet ==
      Seq(10L, 20L, 50L, 100L, 200L, 500L, 1000L).filter(_ <= vocab).toSet)
    // coverage is monotone in k
    val sorted = got.toSeq.sortBy(_._1).map(_._2._4)
    assert(sorted == sorted.sorted)
  }

  test("q158 basket lift matches the session-presence model") {
    val got = graft.operators.Relational.basketLift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // model: 30-min-gap sessions per user, distinct types per session
    val sessions = events.groupBy(_._2).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      var sid = 0L; var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._4 - prev > 1800000L) sid += 1
        prev = e._4
        ((uid, sid), e._3)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap
    val nSessions = sessions.size.toLong
    val typeCounts = sessions.values.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val pairCounts = sessions.values.toSeq.flatMap { ts =>
      val s = ts.toSeq.sorted
      for (i <- s.indices; j <- (i + 1) until s.length) yield (s(i), s(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val expect = pairCounts.map { case ((a, b), nab) =>
      (a, b) -> (nab, typeCounts(a), typeCounts(b),
        nab * nSessions * 1000000L / (typeCounts(a) * typeCounts(b)))
    }
    assert(got == expect)
  }

  test("q142 rank overlap matches brute-force double rankings") {
    val qs = vecs.filter(_._1 < 10)
    val expect = qs.map { case (qid, qv) =>
      val scored = vecs.filter(_._1 != qid).map { case (id, v) =>
        (id, dot(qv, v), dot(qv, v) / (nrm(qv) * nrm(v)))
      }
      val topCos = scored.sortBy(s => (-s._3, s._1)).take(10).map(_._1).toSet
      val topDot = scored.sortBy(s => (-s._2, s._1)).take(10).map(_._1).toSet
      qid -> ((topCos & topDot).size.toLong,
        scored.minBy(s => (-s._3, s._1))._1,
        scored.minBy(s => (-s._2, s._1))._1)
    }.toMap
    val got = Similarity.rankOverlap(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
  }
}
