package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

/** q109 incremental delta-dedup and q110 event-trigram mining. */
class DeltaDedupSpec extends SparkSpec {

  test("delta dedup: pairs are delta x corpus only, and agree with the symmetric q26 verdict") {
    import spark.implicits._
    val out = Dedup.deltaDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (newDoc, corpusDoc) =>
      assert(newDoc % 5 == 0, s"new_doc $newDoc is not in the delta batch")
      assert(corpusDoc % 5 != 0, s"corpus_doc $corpusDoc is not in the corpus")
    }
    // every delta-x-corpus pair the SYMMETRIC q26 run verifies must be
    // found by the incremental screen too (same bands, same verify)
    val full = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.flatMap { case (a, b) =>
      if (a % 5 == 0 && b % 5 != 0) Some((a, b))
      else if (b % 5 == 0 && a % 5 != 0) Some((b, a))
      else None
    }
    assert(out == expected)
  }

  test("PMI collocations match an in-memory model; joint never exceeds marginals") {
    import spark.implicits._
    val texts = graft.sources.Tables.documents(spark, sfDir)
      .select($"text").collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val toks = t.split(" ", -1)
      toks.zip(toks.drop(1))
    }
    val joint = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = joint.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val c2 = joint.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val n = joint.values.sum
    val expect = joint.collect { case ((w1, w2), c12) if c12 >= 5 =>
      val pmiQ = math.floor(
        math.log(c12.toDouble * n / (c1(w1) * c2(w2))) * 10000 + 1.0 / 3).toLong
      ((w1, w2), (c12, pmiQ))
    }.filter(_._2._2 > 0).toMap
    val got = graft.operators.TextAnalysis.pmiCollocations(spark, sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(5))))
      .toMap
    assert(got == expect)
    got.foreach { case ((w1, w2), (c12, _)) =>
      assert(c12 <= math.min(c1(w1), c2(w2)))
    }
  }

  test("decayed engagement matches the exact power-of-two model") {
    import spark.implicits._
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_millis($"ts").as("t"), $"value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val tMax = rows.map(_._2).max
    val expect = rows.groupBy(_._1).view.mapValues { es =>
      val terms = es.map { case (_, t, v) =>
        val age = math.min((tMax - t) / 86400000L, 62L)
        math.floor(v / (1L << age) * 1e6 + 1.0 / 3).toLong
      }
      (es.size.toLong, terms.sum)
    }.toMap
    val got = graft.operators.Relational.decayedEngagement(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
  }

  test("event trigrams: counts match a per-user in-memory scan") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_millis($"ts").as("t"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trigrams = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.size == 3).map(w => (u, (w(0), w(1), w(2)))).toSeq
    }
    val expect = trigrams.groupBy(_._2).view
      .mapValues(g => (g.size.toLong, g.map(_._1).distinct.size.toLong))
      .filter(_._2._1 >= 5).toMap
    val got = Relational.eventTrigrams(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
  }
}
