package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, Preference, Relational, TextAnalysis}

/** q125 containment, q126 Bradley-Terry, q127 triangles, q128 retention,
  * q129 nucleus — in-memory model parity on sf0.001. Each model derives
  * the expectation from the DEFINITION (all-pairs containment, the MM
  * update run in plain Scala, brute triple enumeration), validating the
  * operators' pruned/blocked plans, not re-running them.
  */
class PreferenceGraphSpec extends SparkSpec {

  private def shingleSets: Map[Long, Set[String]] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }
      .filter(_._2.nonEmpty).toMap
  }

  test("q125 containment equals the all-pairs model (prefix pruning is exact)") {
    val sh = shingleSets
    val expect = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a != b && (sa.size < sb.size || (sa.size == sb.size && a < b))
      inter = (sa & sb).size.toLong
      ppm = inter * 1000000L / sa.size
      if ppm >= 800000L
    } yield (a, b, sa.size.toLong, sb.size.toLong, inter, ppm)).toSet
    val got = Dedup.containmentPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expect)
    assert(expect.nonEmpty, "vacuous corpus: no containment pairs at sf0.001")
  }

  test("q126 Bradley-Terry equals the MM update run in plain Scala") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.part(spark, sfDir),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand", $"l_quantity")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val matches = for {
      (ok1, b1, q1) <- li; (ok2, b2, q2) <- li
      if ok1 == ok2 && b1 < b2 && q1 != q2
    } yield (b1, b2, if (q1 > q2) 1L else 0L)
    val pair = matches.groupBy(m => (m._1, m._2)).map { case ((bi, bj), ms) =>
      (bi, bj, ms.length.toLong, ms.map(_._3).sum)
    }.toSeq
    val directed = pair.map(p => (p._1, p._2, p._3)) ++
      pair.map(p => (p._2, p._1, p._3))
    val wins = (pair.map(p => (p._1, p._4)) ++ pair.map(p => (p._2, p._3 - p._4)))
      .groupBy(_._1).map { case (i, ws) => i -> ws.map(_._2).sum }
    val nMatches = directed.groupBy(_._1).map { case (i, ds) => i -> ds.map(_._3).sum }
    var s: Map[String, Long] = wins.map { case (i, _) => i -> 1000000L }
    for (_ <- 1 to 3) {
      val denom = directed.groupBy(_._1).map { case (i, ds) =>
        i -> ds.map(d => d._3 * 1000000000000L / math.max(s(i) + s(d._2), 1L)).sum
      }
      val raw = wins.map { case (i, w) => i -> w * 1000000000000L / denom(i) }
      val mx = raw.values.max
      s = raw.map { case (i, r) => i -> r * 1000000L / mx }
    }
    val expect = wins.keys.map(i => (i, wins(i), nMatches(i), s(i))).toSet
    val got = Preference.bradleyTerry(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // the fit must separate brands (not all saturated at the rescale cap)
    assert(got.map(_._4).size > 1 || got.size <= 1)
  }

  test("q127 triangles equal brute triple enumeration; corner sum is 3x") {
    import spark.implicits._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    val e = byOrder.flatMap { items =>
      val sks = items.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        yield (sks(i), sks(j))
    }.groupBy(identity)
      // iterator first: Map.collect with a Tuple2 result would rebuild a
      // MAP and silently dedupe edges by their u endpoint
      .iterator.collect { case (p, os) if os.size >= 3 => p }.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      x <- nodes; y <- nodes if x < y && e((x, y))
      z <- nodes if y < z && e((y, z)) && e((x, z))
    } { expect(x) += 1; expect(y) += 1; expect(z) += 1 }
    val got = Graph.supplierTriangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect.toMap)
    assert(got.values.sum % 3 == 0)
  }

  test("q128 retention: offset-0 cell equals cohort size, rates bounded") {
    val rows = Relational.retentionCohorts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // every customer is active in their cohort month
    rows.filter(_._2 == 0L).foreach { case (_, _, nActive, cohortN, ppm) =>
      assert(nActive == cohortN); assert(ppm == 1000000L)
    }
    rows.foreach { case (_, off, nActive, cohortN, ppm) =>
      assert(off >= 0); assert(nActive <= cohortN)
      assert(ppm == nActive * 1000000L / cohortN)
    }
    // monotone base: offset cells never exceed the cohort cell
    assert(rows.groupBy(_._1).forall { case (_, cells) =>
      cells.filter(_._2 == 0).map(_._3).sum > 0
    })
  }

  test("q129 nucleus: k is the MINIMAL rank reaching 90% token mass") {
    import spark.implicits._
    val counts = graft.sources.Tables.documents(spark, sfDir)
      .select($"lang", explode(split($"text", " ")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = counts.groupBy(_._1).map { case (lang, ts) =>
      val ord = ts.sortBy(t => (-t._3, t._2))
      val total = ord.map(_._3).sum
      val cums = ord.scanLeft(0L)(_ + _._3).tail
      val k = cums.indexWhere(c => c * 10 >= total * 9) + 1
      lang -> (total, ord.length.toLong, k.toLong, cums(k - 1),
        k.toLong * 1000000L / ord.length)
    }
    val got = TextAnalysis.vocabNucleus(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    // minimality: the rank below k (if any) must be under 90%
    expect.foreach { case (lang, (total, _, k, _, _)) =>
      if (k > 1) {
        val ord = counts.filter(_._1 == lang).sortBy(t => (-t._3, t._2))
        val below = ord.take(k.toInt - 1).map(_._3).sum
        assert(below * 10 < total * 9)
      }
    }
  }
}
