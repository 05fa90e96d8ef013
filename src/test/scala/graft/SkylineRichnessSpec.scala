package graft

import graft.operators.{Evaluate, Relational, TextAnalysis, Timeseries}

/** Brute-force model parity for the round-9 additions q218 (Pareto
  * skyline), q219 (Chao1 bigram richness), q220 (delete-one-source
  * jackknife), q221 (burst episodes) and q222 (broken-stick regression),
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
}
