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
