package graft

import org.apache.spark.sql.functions._

/** Round-14 third batch: Dunning G² keyness (q317), Ljung–Box (q318),
  * gap statistic (q319), TextRank (q320). Each test drives the operator
  * core against a brute-force in-memory model or a planted fixture. */
class Round14cSpec extends SparkSpec {

  test("q317 keynessOn matches a brute G² model on a planted over-use corpus") {
    import spark.implicits._
    // source A over-uses 'zzz'; B/C share a background vocabulary
    val bg = "alpha beta gamma delta epsilon"
    val docs = Seq(
      ("A", s"$bg zzz zzz zzz zzz zzz zzz"),
      ("A", s"zzz zzz zzz $bg"),
      ("B", s"$bg $bg qqq"),
      ("C", s"$bg alpha beta qqq qqq")).toDF("source", "text")
    val got = graft.operators.TextAnalysis.keynessOn(docs)
      .as[(String, Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4, r._5, r._6)).toMap
    // brute model with the operator's exact quantization
    val toks = Seq(
      ("A", s"$bg zzz zzz zzz zzz zzz zzz"),
      ("A", s"zzz zzz zzz $bg"),
      ("B", s"$bg $bg qqq"),
      ("C", s"$bg alpha beta qqq qqq"))
      .flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val nn = toks.size.toLong
    val bySrcTok = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byTok = toks.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val bySrc = toks.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def lnq(cell: Long, colTot: Long, rowTot: Long): Long =
      if (cell <= 0) 0L
      else cell * math.floor(math.log(
        (cell * nn).toDouble / (colTot * rowTot).toDouble) * 10000
        + 1.0 / 3).toLong
    def g2(src: String, tok: String): Long = {
      val a = bySrcTok.getOrElse((src, tok), 0L)
      val nT = byTok(tok); val nS = bySrc(src)
      val b = nT - a
      2L * (lnq(a, nT, nS) + lnq(b, nT, nn - nS)
        + lnq(nS - a, nn - nT, nS) + lnq(nn - nS - b, nn - nT, nn - nS))
    }
    // 'zzz' must head source A's keyword list with exact counts and G²
    val (rk, a, b, g2q) = got(("A", "zzz"))
    assert(rk === 1L)
    assert(a === 9L && b === 0L)
    assert(g2q === g2("A", "zzz"), s"got $g2q expect ${g2("A", "zzz")}")
    // every reported row carries the brute G² and positive keyness
    got.foreach { case ((s, t), (_, ga, gb, gg)) =>
      assert(gg === g2(s, t), s"($s,$t): got $gg expect ${g2(s, t)}")
      val nS = bySrc(s)
      assert(ga * (nn - nS) > gb * nS, s"($s,$t) not positively key")
    }
  }

  test("q318 ljungBox matches a brute portmanteau model on the sf0.001 grid") {
    import spark.implicits._
    val grid = graft.operators.Timeseries.denseHourly(spark, sfDir)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.sortBy(_._2).map(_._3)
      }
    val expect = grid.map { case (t, xs) =>
      val n = xs.length.toLong
      val terms = (1 to 6).flatMap { k =>
        val pairs = xs.drop(k).zip(xs.dropRight(k))
        val np = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val da = np * sxx - sx * sx; val db = np * syy - sy * sy
        if (da > 0 && db > 0) {
          val r = math.floor((np * sxy - sx * sy).toDouble
            / math.sqrt(da.toDouble * db.toDouble) * 1e6 + 1.0 / 3).toLong
          Some((r * r * 1000L) / np)
        } else None
      }
      val q = (BigInt(n) * (n + 2) * terms.sum / BigInt("1000000000000")).toLong
      t -> (n, terms.size.toLong, q)
    }
    val got = graft.operators.Timeseries.ljungBox(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, nh, nl, qm, rej) =>
      val (en, enl, eq) = expect(t)
      assert(nh === en && nl === enl && qm === eq,
        s"$t: got ($nh,$nl,$qm) expect ($en,$enl,$eq)")
      assert(rej === (if (qm > 12592L) 1L else 0L))
    }
  }

  test("q319 gapStatisticOn separates planted blobs from scattered points") {
    import spark.implicits._
    def blobPoint(blob: Int, i: Int): Seq[Float] =
      // 4 tight blobs at distant corners of an 8-dim cube, ±0.01 jitter
      (0 until 8).map { d =>
        val center = if ((blob >> (d % 2)) % 2 == 0) 0f else 10f
        center + ((i * 31 + d * 7) % 21 - 10) * 0.001f
      }
    val blobs = (0 until 200).map { i =>
      (i.toLong, blobPoint(i % 4, i))
    }.toDF("vec_id", "embedding")
    // scattered: the md5-style hash chain fills the same cube uniformly
    val scattered = (0 until 200).map { i =>
      (i.toLong, (0 until 8).map { d =>
        ((i * 2654435761L + d * 40503L) % 10007L).toFloat / 10007f * 10f
      })
    }.toDF("vec_id", "embedding")
    val gapBlob = graft.operators.Similarity.gapStatisticOn(blobs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._6).toMap
    val gapScat = graft.operators.Similarity.gapStatisticOn(scattered)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._6).toMap
    info(s"blob gaps: $gapBlob; scattered gaps: $gapScat")
    // blobs: once k reaches the true 4, dispersion collapses vs uniform
    assert(gapBlob(4L) > 2000L, s"blob gap(4) = ${gapBlob(4L)}")
    assert(gapBlob(4L) > gapBlob(2L), "gap should rise through the true k")
    // scattered data stays far below the blob signal (the LCG lattice
    // carries mild genuine structure, so "near zero" is ±1.5)
    gapScat.foreach { case (k, g) =>
      assert(math.abs(g) < 1500L, s"scattered gap($k) = $g")
    }
    assert(gapBlob(4L) > gapScat(4L) + 1500L)
  }

  test("q320 textrankOn matches a brute integer-lattice PageRank model") {
    import spark.implicits._
    val docs = Seq(
      "hub alpha hub beta hub gamma hub delta",
      "alpha beta gamma delta",
      "leaf hub").toDF("text")
    val got = graft.operators.TextAnalysis.textrankOn(docs)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // brute model: same graph, same 5-round lattice
    val toks = Seq("hub alpha hub beta hub gamma hub delta",
      "alpha beta gamma delta", "leaf hub").map(_.split(" ", -1).toSeq)
    val adj = toks.flatMap(ts => ts.zip(ts.tail)).filter(p => p._1 != p._2)
    val edges = (adj ++ adj.map(_.swap)).groupBy(identity)
      .map { case ((u, v), l) => (u, v, l.size.toLong) }.toSeq
    val wdeg = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
    var r = wdeg.keys.map(_ -> 1000L).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _, w) => (w * r(u)) / wdeg(u) }.sum
      }
      r = contrib.map { case (v, c) => v -> (150L + (850L * c) / 1000L) }
    }
    assert(got.keySet === r.keySet)
    got.foreach { case (tok, (rm, s)) =>
      assert(rm === r(tok), s"$tok: got $rm expect ${r(tok)}")
      assert(s === wdeg(tok))
    }
    // the hub token must out-rank the leaf
    assert(got("hub")._1 > got("leaf")._1)
  }

  test("q321 kmeansParInitOn matches a brute k-means|| chain on a planted fixture") {
    import spark.implicits._
    val pts = (0 until 40).map { i =>
      (i.toLong, (0 until 4).map(d =>
        ((i * 13 + d * 5) % 17).toFloat + (if (i % 3 == 0) 10f else 0f)))
    }
    val df = pts.toDF("vec_id", "embedding")
    val got = graft.operators.Quantize.kmeansParInitOn(df)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // brute chain with identical quantization and hash draws
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val embD = pts.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    var centers = Vector((0L, 0L)) // (id, round)
    for (r <- 1 to 3) {
      val dq = embD.map { case (id, v) =>
        id -> math.floor(
          centers.map(c => d2(v, embD(c._1))).min * 1e6 + 1.0 / 3).toLong
      }
      val phi = dq.values.sum
      val picked = embD.keys.toSeq.sorted.filter { id =>
        val h = java.lang.Long.parseLong(
          md5hex(s"kp$r:$id").substring(0, 8), 16) % 1000000L
        BigInt(h) * phi < BigInt(8) * dq(id) * 1000000L
      }.filterNot(id => centers.exists(_._1 == id))
      centers ++= picked.map(_ -> r.toLong)
    }
    val weights = embD.keys.groupBy { id =>
      centers.map { case (cid, _) => (d2(embD(id), embD(cid)), cid) }
        .minBy(identity)._2
    }.map { case (cid, ids) => cid -> ids.size.toLong }
    val expect = centers.map { case (cid, r) =>
      (cid, r, weights.getOrElse(cid, 0L))
    }.sortBy(_._1)
    assert(got.toSeq === expect,
      s"got ${got.mkString(",")} expect ${expect.mkString(",")}")
    // the chain actually oversampled (more than the seed survived)
    assert(got.length > 1, "no candidates drawn — degenerate fixture")
  }

  test("q322 dbscanCore matches a brute banded-census model at sf0.001") {
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val signs = graft.operators.Similarity.signMatrix(36, 64)
    def band(v: Array[Double]): Seq[(Int, Long)] =
      (0 until 6).map { b =>
        b -> (0 until 6).map { j =>
          val s = signs(6 * b + j)
          val dot = v.indices.foldLeft(0.0)((a, i) => a + v(i) * s(i))
          if (dot > 0.0) 1L << j else 0L
        }.sum
      }
    val bands = vecs.map { case (id, v) => id -> band(v) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * a(i)))
      val nb = math.sqrt(b.indices.foldLeft(0.0)((acc, i) => acc + b(i) * b(i)))
      dot / (na * nb)
    }
    val ids = vecs.keys.toSeq.sorted
    val pairs = for {
      a <- ids; b <- ids if a < b
      if bands(a).zip(bands(b)).exists { case ((_, x), (_, y)) => x == y }
      if cos(vecs(a), vecs(b)) >= 0.3
    } yield (a, b)
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val core = deg.filter(_._2 >= 3L).keySet
    val nearCore = pairs.flatMap { case (a, b) =>
      Seq(a -> b, b -> a)
    }.filter { case (_, nb) => core(nb) }.map(_._1).toSet
    val got = graft.operators.Similarity.dbscanCore(spark, sfDir)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size === ids.size)
    ids.foreach { id =>
      val expSt =
        if (core(id)) 2L else if (nearCore(id)) 1L else 0L
      assert(got(id) === ((deg.getOrElse(id, 0L), expSt)),
        s"vec $id: got ${got(id)} expect (${deg.getOrElse(id, 0L)}, $expSt)")
    }
    // at ε = 0.3 the real corpus itself populates every stratum
    assert(core.nonEmpty, "no cores at sf0.001 — census degenerate")
    assert((ids.toSet -- core -- nearCore).nonEmpty, "no noise stratum")
    // and the structural claim is proven on a planted blob fixture:
    val planted = ((0 until 24).map { i =>
      // 3 tight blobs of 8 -> every member has 7 same-blob neighbors
      (100L + i, (0 until 64).map(d =>
        (if (d % 3 == i % 3) 10f else 0.1f)
          + ((i * 7 + d) % 5) * 0.01f))
    } ++ (0 until 6).map { i =>
      // isolated one-hot outliers in distinct far corners
      (200L + i, (0 until 64).map(d =>
        if (d == 40 + 4 * i) 20f else -0.2f * ((d + i) % 3)))
    }).toDF("vec_id", "embedding")
    val st = graft.operators.Similarity.dbscanCoreOn(planted)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(st.count(_._2 == 2L) >= 20, s"cores: ${st.count(_._2 == 2L)}")
    assert(st.count(_._2 == 0L) >= 4, s"noise: ${st.count(_._2 == 0L)}")
  }

  test("q323 facilitySelectOn matches a brute greedy model with diminishing gains") {
    import spark.implicits._
    val pts = (0 until 64).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (((i % 5) * 100 + (i * 7 + d * 3) % 13)).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.facilitySelectOn(df)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // brute greedy with identical quantization
    val embD = pts.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def nrm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    def covq(v: Seq[Double], c: Seq[Double]): Long = math.max(0L,
      math.floor(v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        / (nrm(v) * nrm(c)) * 1e6 + 1.0 / 3).toLong)
    val cands = (0L until 32L).toSeq
    var best = embD.keys.map(_ -> 0L).toMap
    var sel = Vector.empty[(Long, Long, Long)]
    var obj = 0L
    for (rk <- 1 to 8) {
      val gains = cands.filterNot(c => sel.exists(_._2 == c)).map { c =>
        c -> embD.keys.toSeq.map { v =>
          math.max(0L, covq(embD(v), embD(c)) - best(v))
        }.sum
      }
      val (wc, wg) = gains.maxBy { case (c, g) => (g, -c) }
      obj += wg
      sel :+= ((rk.toLong, wc, wg))
      best = best.map { case (v, b) =>
        v -> math.max(b, covq(embD(v), embD(wc)))
      }
    }
    val expect = sel.map { case (rk, c, g) =>
      (rk, c, g, sel.take(rk.toInt).map(_._3).sum)
    }
    assert(got.toSeq === expect,
      s"got ${got.mkString(",")} expect ${expect.mkString(",")}")
    // submodularity: marginal gains are non-increasing
    val gs = got.map(_._3)
    assert(gs.zip(gs.tail).forall { case (a, b) => a >= b })
  }

  test("q323 one-task greedy kernel == distributed aggregation loop " +
      "(localCutoff forced 0)") {
    import spark.implicits._
    val pts = (0 until 64).map { i =>
      (i.toLong, (0 until 8).map(d =>
        (((i % 5) * 100 + (i * 7 + d * 3) % 13)).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val kernel = graft.operators.Similarity.facilitySelectOn(df)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    spark.conf.set("spark.graft.facility.localCutoff", "0")
    try {
      val dist = graft.operators.Similarity.facilitySelectOn(df)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(kernel === dist,
        s"kernel ${kernel.mkString(",")} dist ${dist.mkString(",")}")
    } finally spark.conf.unset("spark.graft.facility.localCutoff")
  }
}
