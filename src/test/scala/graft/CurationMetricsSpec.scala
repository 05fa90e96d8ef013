package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Evaluate, TextAnalysis, Timeseries}

/** q118 CUSUM, q119 Hampel, q120 AUC, q121 calibration, q122 entropy,
  * q123/q124 weak supervision — in-memory model parity on sf0.001.
  * The AUC model counts pairs from the Mann–Whitney DEFINITION (all
  * pos×neg comparisons), validating the operator's cumulative-count
  * algebra, not just re-running it.
  */
class CurationMetricsSpec extends SparkSpec {

  private lazy val events = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sfDir)
      .select($"event_type", $"event_id", unix_millis($"ts").as("t"), $"value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 1000 + 1.0 / 3).toLong))
  }

  private lazy val docs = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
  }

  test("q118 CUSUM matches the exhaustive integer model") {
    val expect = events.groupBy(_._1).map { case (tpe, es) =>
      val ord = es.sortBy(e => (e._3, e._2))
      val s = ord.map(_._4).sum
      val n = ord.length.toLong
      var cum = 0L
      val rows = ord.zipWithIndex.map { case (e, i) =>
        cum += e._4
        (e._2, e._3, math.abs(n * cum - (i + 1).toLong * s))
      }
      val best = rows.minBy(r => (-r._3, r._1))
      tpe -> (best._1, best._2, best._3, n)
    }
    val got = Timeseries.cusumChangePoint(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
  }

  test("q119 Hampel matches a direct sliding-window model") {
    def med2(a: Seq[Long]): Long = {
      val s = a.sorted; val k = s.length
      s((k + 1) / 2 - 1) + s(k / 2)
    }
    val expect = events.groupBy(_._1).flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._3, e._2))
      ord.indices.map { i =>
        val w = ord.slice(math.max(0, i - 2), math.min(ord.length, i + 3))
          .map(_._4)
        val m2 = med2(w)
        val m4 = med2(w.map(x => math.abs(2 * x - m2)))
        val vq = ord(i)._4
        val spike = math.abs(2 * vq - m2) * 2 > 3 * m4
        ord(i)._2 -> (m2, m4, if (spike) 1L else 0L,
          if (spike) m2 else 2 * vq)
      }
    }
    val got = Timeseries.hampelDespike(spark, sfDir).collect()
      .map(r => r.getLong(1) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got == expect)
    // a repaired series must be within the local window envelope
    assert(got.values.forall { case (m2, m4, _, _) => m4 >= 0 && m2 > 0 })
  }

  test("q120 AUC matches all-pairs Mann-Whitney counting") {
    val expect = docs.groupBy(_._4).flatMap { case (src, ds) =>
      val pos = ds.filter(_._3 == "en").map(_._5)
      val neg = ds.filter(_._3 != "en").map(_._5)
      if (pos.isEmpty || neg.isEmpty) None
      else {
        val num2 = (for (p <- pos; q <- neg) yield
          if (p > q) 2L else if (p == q) 1L else 0L).sum
        Some(src -> (pos.length.toLong, neg.length.toLong,
          num2 * 1000000L / (2L * pos.length * neg.length)))
      }
    }
    val got = Evaluate.aucBySource(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    assert(got.values.forall { case (_, _, a) => a >= 0L && a <= 1000000L })
  }

  test("q121 calibration bins partition the corpus exactly") {
    val got = Evaluate.calibrationBins(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == docs.length)
    got.foreach { r =>
      val bin = r.getLong(0)
      val members = docs.filter(d => d._5 / 100 == bin)
      assert(r.getLong(1) == members.length)
      assert(r.getLong(2) == members.count(_._3 == "en"))
      assert(r.getLong(4) == members.map(_._5).sum / members.length)
    }
  }

  test("q122 entropy matches the quantized-term model; bounds hold") {
    val expect = docs.map { case (id, text, _, _, _) =>
      val counts = text.toSeq.groupBy(identity).view.mapValues(_.length).toMap
      val len = text.length.toLong
      val eq = counts.values.map { n =>
        val r = n.toDouble / len
        math.floor(-r * math.log(r) * 10000 + 1.0 / 3).toLong
      }.sum
      id -> (len, counts.size.toLong, eq)
    }.toMap
    val got = TextAnalysis.charEntropy(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    // H <= ln(distinct): quantized entropy can't exceed the uniform bound
    got.values.foreach { case (_, k, eq) =>
      assert(eq <= math.ceil(math.log(k.toDouble) * 10000).toLong + k)
    }
  }

  test("q123/q124 vote algebra is internally consistent") {
    val perDoc = Curation.weakLabels(spark, sfDir).collect()
    perDoc.foreach { r =>
      val votes = (1 to 4).map(r.getLong).sum
      assert(r.getLong(5) == votes)
      assert(r.getLong(6) == (if (votes >= 3) 1L else 0L))
    }
    val agg = Curation.lfAgreement(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(agg.keySet == Set("lf_len", "lf_stop", "lf_punct", "lf_digit"))
    val n = perDoc.length.toLong
    val lenVotes = perDoc.map(_.getLong(1)).sum
    assert(agg("lf_len")._1 == lenVotes)
    assert(agg("lf_len")._2 == lenVotes * 1000000L / n)
  }
}
