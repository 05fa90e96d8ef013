package graft

import graft.operators.{Evaluate, Relational, TextAnalysis, Timeseries}

/** Brute-force model parity for the round-9 additions q218 (Pareto
  * skyline), q219 (Chao1 bigram richness), q220 (delete-one-source
  * jackknife), q221 (burst episodes), q222 (broken-stick regression),
  * q226 (Hill tail index) and q227 (propensity-score matching ATT),
  * on top of their DuckDB hash gates. Each test recomputes the operator's
  * answer from raw collected rows with an independent in-memory
  * algorithm — the O(n²)/sequential form the distributed plan must agree
  * with exactly.
  */
class SkylineRichnessSpec extends SparkSpec {

  private def toksOf(text: String): Array[String] = text.split(" ", -1)

  /** Raw (doc_id, n_chars, ttr_ppm) points exactly as q218 derives them. */
  private def points(): Seq[(Long, Long, Long)] = {
    import org.apache.spark.sql.functions._
    graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars").cast("long"), col("text"))
      .collect()
      .map { r =>
        val toks = toksOf(r.getString(2))
        (r.getLong(0), r.getLong(1),
          toks.distinct.length.toLong * 1000000L / toks.length)
      }.toSeq
  }

  test("q218 skyline: parity with the O(n^2) dominance scan") {
    val pts = points()
    val expect = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    val got = Relational.paretoSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q218 skyline: frontier is an antichain and contains both maxima") {
    val got = Relational.paretoSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    for ((ax, ay) <- got; (bx, by) <- got if (ax, ay) != (bx, by))
      assert(!(bx >= ax && by >= ay && (bx > ax || by > ay)),
        s"($ax,$ay) dominated by ($bx,$by) inside the skyline")
    val pts = points()
    assert(got.map(_._1).max === pts.map(_._2).max)
    assert(got.map(_._2).max === pts.map(_._3).max)
  }

  test("q219 chao1: parity with the in-memory frequency-of-frequencies model") {
    import org.apache.spark.sql.functions._
    val bigrams = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .flatMap { r =>
        val t = toksOf(r.getString(1))
        t.iterator.zip(t.iterator.drop(1))
          .map(p => (r.getString(0), p._1 + " " + p._2)).toSeq
      }
    val expect = bigrams.groupBy(_._1).map { case (lang, rows) =>
      val counts = rows.groupBy(_._2).map(_._2.size.toLong)
      val v = counts.size.toLong
      val n1 = counts.count(_ == 1L).toLong
      val n2 = counts.count(_ == 2L).toLong
      val chao = if (n2 > 0) 1000L * v + (1000L * n1 * n1) / (2L * n2)
                 else 1000L * v + (1000L * n1 * (n1 - 1)) / 2L
      lang -> ((v, n1, n2, counts.sum, chao,
        ((chao - 1000L * v) * 1000000L) / chao))
    }
    val got = TextAnalysis.chao1Richness(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expect)
  }

  test("q220 jackknife: parity + pseudovalue/influence algebra") {
    import org.apache.spark.sql.functions._
    val perSrc = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nAll = perSrc.map(_._2).sum
    val tAll = perSrc.map(_._3).sum
    val g = perSrc.length.toLong
    val theta = 1000L * tAll / nAll
    val expect = perSrc.map { case (s, n, t) =>
      val loo = 1000L * (tAll - t) / (nAll - n)
      s -> ((n, theta, loo, g * theta - (g - 1) * loo, theta - loo))
    }.toMap
    val got = Evaluate.jackknifeSource(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expect)
    // influence sums to ~0 only when sources are balanced; the hard
    // invariant is the pseudovalue identity itself, already asserted
    // per row. Also: deleting an above-mean source must lower theta.
    got.foreach { case (_, (_, th, loo, pseudo, infl)) =>
      assert(pseudo === g * th - (g - 1) * loo)
      assert(infl === th - loo)
    }
  }

  test("q221 bursts: parity with a sequential threshold-run scan") {
    import org.apache.spark.sql.functions._
    val hourly = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = hourly.groupBy(_._1).flatMap { case (tpe, rows) =>
      val byRank = rows.map(t => (t._3, t._2)).sorted
      val med = byRank((byRank.length + 1) / 2 - 1)._1
      val burst = rows.filter(t =>
          t._3 > med && (t._3 - med) * (t._3 - med) >= 4 * med)
        .map(t => (t._2, t._3)).sortBy(_._1)
      // split into consecutive-hour runs
      val runs = burst.foldLeft(List.empty[List[(Long, Long)]]) {
        case (acc @ (cur :: rest), hc) if cur.head._1 == hc._1 - 1 =>
          (hc :: cur) :: rest
        case (acc, hc) => List(hc) :: acc
      }
      runs.map { run =>
        (tpe, run.last._1, run.head._1, run.length.toLong,
          run.map(_._2).max, run.map(_._2).sum)
      }
    }.toSet
    val got = Timeseries.burstEpisodes(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
  }

  test("q222 broken stick: parity with a sequential cusum + exact fit") {
    import org.apache.spark.sql.functions._
    val hourly = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("h"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def slopeMilli(seg: Seq[(Long, Long)]): Long = {
      val x0 = seg.map(_._1).min
      val n = seg.length.toLong
      val sx = seg.map(_._1 - x0).sum
      val sy = seg.map(_._2).sum
      val sxy = seg.map(t => (t._1 - x0) * t._2).sum
      val sxx = seg.map(t => (t._1 - x0) * (t._1 - x0)).sum
      math.floor(1000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx)
        + 1.0 / 3).toLong
    }
    val expect = hourly.groupBy(_._1).flatMap { case (tpe, rows) =>
      val series = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val n = series.length.toLong
      val tot = series.map(_._2).sum
      if (n < 4) Nil
      else {
        val prefixed = series.scanLeft(0L)(_ + _._2).tail
          .zip(series).zipWithIndex
          .map { case ((pref, (h, _)), i) => (h, i + 1L, pref) }
        val cands = prefixed.filter(t => t._2 >= 2 && t._2 <= n - 2)
        val cp = cands.maxBy(t => (math.abs(n * t._3 - t._2 * tot), -t._1))._1
        val (pre, post) = series.partition(_._1 <= cp)
        List((tpe, cp, pre.length.toLong, post.length.toLong,
          slopeMilli(pre), slopeMilli(post),
          slopeMilli(post) - slopeMilli(pre)))
      }
    }.toSet
    val got = Timeseries.brokenStick(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got === expect)
  }

  test("q226 hill tail: parity with the sorted order-statistics model") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).flatMap { case (lang, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2))
      val n = rows.length.toLong
      val k = math.min(10L, (n - 1) / 2)
      if (k < 1 || sorted.length <= k) Nil
      else {
        val xk1 = sorted(k.toInt)._1
        val sumQ = sorted.take(k.toInt).map { case (x, _) =>
          math.floor(math.log(x.toDouble / xk1) * 10000 + 1.0 / 3).toLong
        }.sum
        val alpha = if (sumQ > 0)
          math.floor(k.toDouble * 1e7 / sumQ + 1.0 / 3).toLong else 0L
        List((lang, k, n, xk1, sumQ, alpha))
      }
    }.toSet
    val got = Relational.hillTail(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q227 psm: parity with a sequential nearest-score matching model") {
    import org.apache.spark.sql.functions._
    val users = graft.sources.Tables.events(spark, sfDir)
      .collect().groupBy(_.getAs[Long]("user_id")).map { case (uid, evs) =>
        val score = evs.length.toLong
        val y = evs.filter(_.getAs[String]("event_type") == "purchase")
          .map(e => math.floor(e.getAs[Double]("value") * 1000 + 1.0 / 3)
            .toLong).sum
        val nErr = evs.count(_.getAs[String]("event_type") == "error")
        (uid, score, y, if (nErr * 5 > score) 1 else 0)
      }.toSeq
    // representative control per score: max user_id
    val rep = users.filter(_._4 == 0).groupBy(_._2).map { case (s, rows) =>
      s -> rows.maxBy(_._1)._3
    }
    val repScores = rep.keys.toSeq.sorted
    def nearest(s: Long): Option[(Long, Long)] = {
      if (repScores.isEmpty) None
      else {
        val below = repScores.filter(_ <= s).lastOption
        val above = repScores.find(_ > s)
        val ms = (below, above) match {
          case (Some(b), Some(a)) => if (s - b <= a - s) b else a
          case (Some(b), None) => b
          case (None, Some(a)) => a
          case _ => return None
        }
        Some((ms, rep(ms)))
      }
    }
    val expect = users.filter(_._4 == 1).map { case (_, s, y, _) =>
      nearest(s) match {
        case Some((ms, yc)) if math.abs(s - ms) <= 5 =>
          (s / 10, 1L, 1L, y - yc)
        case _ => (s / 10, 1L, 0L, 0L)
      }
    }.groupBy(_._1).map { case (band, rows) =>
      val nT = rows.map(_._2).sum
      val nM = rows.map(_._3).sum
      val sd = rows.map(_._4).sum
      val att = if (nM > 0)
        math.floor(sd.toDouble / nM + 1.0 / 3).toLong else 0L
      band -> ((nT, nM, sd, att))
    }
    val got = Evaluate.psmAtt(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === expect)
  }

  test("q228 self-bleu: parity with an in-memory sampled pairwise model") {
    import org.apache.spark.sql.functions._
    def draw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"sb:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sampled = docs.sortBy(d => (draw(d._1), d._1)).take(20)
    val km1 = sampled.length.toLong - 1
    val bgs = sampled.map { case (id, text) =>
      val t = toksOf(text)
      id -> t.iterator.zip(t.iterator.drop(1))
        .map(p => p._1 + " " + p._2).toSet
    }.toMap
    val expect = bgs.map { case (a, sa) =>
      val ppms = bgs.toSeq.collect { case (b, sb) if b != a =>
        (sa & sb).size.toLong * 1000000L / sa.size
      }
      val hits = ppms.count(_ > 0).toLong
      a -> ((sa.size.toLong, hits, ppms.sum / km1))
    }
    val got = TextAnalysis.selfBleu(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got === expect)
    assert(got.size === 20)
  }

  test("q232 cv auc: parity with a brute out-of-fold pair-counting model") {
    import org.apache.spark.sql.functions._
    def draw(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cv:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        (r.getLong(0), draw(r.getLong(0)) % 4,
          if (r.getString(1) == "en") 1L else 0L,
          toksOf(r.getString(2)).distinct.toSeq)
      }
    // per-(fold, tok) and global containment counts
    val ftRows = docs.flatMap { case (_, f, y, toks) =>
      toks.map(t => ((f, t), (1L, y)))
    }
    val ft = ftRows.groupBy(_._1).map { case (k, xs) =>
      k -> ((xs.map(_._2._1).sum, xs.map(_._2._2).sum))
    }
    val gt = ft.groupBy(_._1._2).map { case (t, xs) =>
      t -> ((xs.values.map(_._1).sum, xs.values.map(_._2).sum))
    }
    def weight(f: Long, t: String): Option[Long] = {
      val (gc, gp) = gt(t)
      val (c, p) = ft.getOrElse((f, t), (0L, 0L))
      if (gc - c > 0) Some((gp - p) * 1000000L / (gc - c)) else None
    }
    val scored = docs.map { case (_, f, y, toks) =>
      (f, y, toks.flatMap(weight(f, _)).sum)
    }
    val expect = scored.groupBy(_._1).flatMap { case (f, rows) =>
      val pos = rows.filter(_._2 == 1L).map(_._3)
      val neg = rows.filter(_._2 == 0L).map(_._3)
      if (pos.isEmpty || neg.isEmpty) Nil
      else {
        val num2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        List(f -> ((pos.length.toLong, neg.length.toLong,
          num2 * 1000000L / (2L * pos.length * neg.length))))
      }
    }
    val got = Evaluate.cvAuc(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got === expect)
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
  }

  test("q229 w1 drift: parity with an in-memory CDF-transport model") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nAll = rows.length.toLong
    val grid = rows.map(_._2).distinct.sorted
    val corpusCum = grid.map(x => x -> rows.count(_._2 <= x).toLong).toMap
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val nS = rs.length.toLong
      val raw = grid.zip(grid.drop(1)).map { case (x, xn) =>
        val cumS = rs.count(_._2 <= x).toLong
        math.abs(cumS * nAll - corpusCum(x) * nS) * (xn - x)
      }.sum
      src -> ((nS,
        math.floor(raw.toDouble * 1000 / (nS * nAll) + 1.0 / 3).toLong))
    }
    val got = Evaluate.w1Drift(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
    // W1 of the corpus against itself is zero — a source that IS the
    // corpus distribution must read 0; all drifts are non-negative
    got.values.foreach { case (_, w1) => assert(w1 >= 0L) }
  }
}
