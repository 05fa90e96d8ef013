package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Timeseries}

/** q130 canon dedup, q131 novelty, q132 Cohen's kappa, q133 minhash
  * estimator audit, q134 Kaplan-Meier — in-memory model parity on
  * sf0.001. Models recompute from raw text/events with plain Scala
  * (java MD5, Math.log), independent of the operators' plans.
  */
class CurationSurvivalSpec extends SparkSpec {

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private lazy val docs: Array[(Long, String)] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
  }

  private def shingleSet(text: String): Set[String] =
    text.split(" ", -1).sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  test("q130 canon dedup groups case/punct variants; q24 raw forms nest inside") {
    val canon = docs.map { case (id, t) =>
      (id, t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim, t)
    }
    val expect = canon.groupBy(_._2).map { case (c, ds) =>
      md5hex(c) -> (ds.map(_._1).min, ds.length.toLong,
        ds.map(d => md5hex(d._3)).distinct.length.toLong)
    }
    val got = Curation.canonDedup(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    // canonical groups are a coarsening of raw-exact groups
    assert(got.values.forall { case (_, n, nraw) => nraw <= n })
  }

  test("q131 novelty equals the df=1 fraction from explicit shingle sets") {
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }
      .filter(_._2.nonEmpty)
    val df = sets.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (s, xs) => s -> xs.length }
    val expect = sets.map { case (id, ss) =>
      val unique = ss.count(df(_) == 1).toLong
      id -> (ss.size.toLong, unique, unique * 1000000L / ss.size)
    }.toMap
    val got = Dedup.ngramNovelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
  }

  test("q132 kappa matches the direct chance-corrected computation") {
    val lfs = docs.map { case (_, t) =>
      val nPunct = t.count("[.!?,;]".toSet.filterNot(c => c == '[' || c == ']').contains)
      val nDigit = t.count(_.isDigit)
      Map(
        "lf_len" -> (if (t.length >= 200) 1L else 0L),
        "lf_stop" -> (if (t.toLowerCase.contains(" the ")) 1L else 0L),
        "lf_punct" -> (if (nPunct * 20 >= t.length) 1L else 0L),
        "lf_digit" -> (if (nDigit * 50 <= t.length) 1L else 0L))
    }
    val names = Seq("lf_len", "lf_stop", "lf_punct", "lf_digit")
    val n = lfs.length.toLong
    val expect = (for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield {
      val (a, b) = (names(i), names(j))
      val agree = lfs.count(m => m(a) == m(b)).toLong
      val a1 = lfs.map(_(a)).sum
      val b1 = lfs.map(_(b)).sum
      val e = a1 * b1 + (n - a1) * (n - b1)
      val num = agree * n - e
      val den = n * n - e
      (a, b) -> (n, agree, num, den, num * 1000000L / den)
    }).toMap
    val got = Curation.cohenKappa(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got == expect)
    // kappa bounded in [-1e6, 1e6]
    assert(got.values.forall { case (_, _, _, _, k) =>
      k >= -1000000L && k <= 1000000L })
  }

  test("q133 estimator audit: est from signatures, exact from sets, both reproduced") {
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }
      .filter(_._2.nonEmpty).toMap
    def mh(ss: Set[String]): IndexedSeq[String] =
      (0 until 12).map(seed => ss.map(s => md5hex(s"$seed:$s")).min)
    val sigs = sets.map { case (id, ss) => id -> mh(ss) }
    val bands = sigs.toSeq.flatMap { case (id, m) =>
      (0 until 4).map(b => (b, m.slice(3 * b, 3 * b + 3).mkString(",")) -> id)
    }
    val cand = bands.groupBy(_._1).values.flatMap { ids =>
      val v = ids.map(_._2).toSeq.sorted.distinct
      for (i <- v.indices; j <- (i + 1) until v.length) yield (v(i), v(j))
    }.toSet
    val expect = cand.map { case (a, b) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong
      val inter = (sets(a) & sets(b)).size.toLong
      val estPpm = est * 1000000L / 12
      val exactPpm = inter * 1000000L / (sets(a).size + sets(b).size - inter)
      (a, b, est, estPpm, exactPpm, math.abs(estPpm - exactPpm))
    }
    val got = Dedup.minhashEstAudit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "vacuous: no band-collision candidates at sf0.001")
  }

  test("q134 KM curve matches the sequential product-limit model") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_millis($"ts").as("t"))
      .as[(Long, Long)].collect()
    val tEnd = ev.map(_._2).max
    val durs = ev.groupBy(_._1).values.map { es =>
      val ts = es.map(_._2)
      ((ts.max - ts.min) / 3600000L,
        if (tEnd - ts.max < 43200000L) 1L else 0L)
    }.toSeq
    val byT = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.count(_._2 == 0L).toLong, xs.count(_._2 == 1L).toLong)
    }
    val total = durs.size.toLong
    var seen = 0L
    var lnq = 0L
    val expect = byT.flatMap { case (t, m, d, c) =>
      val nRisk = total - seen
      seen += m
      if (d > 0 && d < nRisk) {
        lnq += math.floor(math.log((nRisk - d).toDouble / nRisk) * 1000000 + 1.0 / 3).toLong
        Some((t, nRisk, d, c, lnq))
      } else None
    }.toSet
    val got = Timeseries.survivalCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
    // survival only decreases
    val ordered = expect.toSeq.sortBy(_._1).map(_._5)
    assert(ordered == ordered.sorted.reverse || ordered.size <= 1)
  }
}
