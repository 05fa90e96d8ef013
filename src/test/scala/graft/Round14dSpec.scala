package graft

import org.apache.spark.sql.functions._

/** Round-14 fourth batch: personalized PageRank (q324), LPA communities
  * (q325), Chao1 richness (q326), Fisher's g-test (q327). Brute-force
  * in-memory models and planted structural fixtures. */
class Round14dSpec extends SparkSpec {

  // two 4-cliques joined by a single bridge edge (0..3 | 10..13)
  private val cliquePairs: Seq[(Long, Long)] = {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((3L, 10L))
  }

  private def bruteEdges: Map[Long, Seq[Long]] =
    (cliquePairs ++ cliquePairs.map(_.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

  test("q324 pprSeedsOn matches a brute 5-round PPR lattice on the bridge graph") {
    import spark.implicits._
    val got = graft.operators.Graph.pprSeedsOn(
        cliquePairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    val adj = bruteEdges
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    val seeds = adj.keys.toSeq.sorted.take(3) // 0, 1, 2
    val expect = seeds.flatMap { s =>
      var r = Map(s -> 1000000L)
      for (_ <- 1 to 5) {
        val prop = r.toSeq.flatMap { case (u, ru) =>
          adj(u).map(v => v -> (ru / deg(u)))
        }.groupBy(_._1).map { case (v, xs) =>
          v -> (85L * xs.map(_._2).sum) / 100L
        }
        r = (prop.toSeq :+ (s -> 150000L))
          .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
      }
      r.toSeq.sortBy { case (n, rv) => (-rv, n) }.take(10).zipWithIndex
        .map { case ((n, rv), i) => (s, n) -> (i + 1L, rv) }
    }.toMap
    assert(got === expect)
    // structural sanity: the seed's own clique outranks the far clique
    val s0 = got.collect { case ((0L, n), (_, r)) => n -> r }
    assert(s0(1L) > s0.getOrElse(11L, 0L))
  }

  test("q325 lpaCommunitiesOn splits the bridged cliques CC would merge") {
    import spark.implicits._
    val got = graft.operators.Graph.lpaCommunitiesOn(
        cliquePairs.toDF("doc_a", "doc_b"))
      .as[(Long, Long, Long)].collect()
    // brute synchronous 4-round LPA
    val adj = bruteEdges
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lbl = adj.map { case (n, nbs) =>
        val counts = nbs.map(lbl).groupBy(identity)
          .map { case (l, v) => (l, v.size) }
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expect = lbl.groupBy(_._2).map { case (c, m) =>
      (c, m.size.toLong, m.keys.min)
    }.toSet
    assert(got.toSet === expect)
    // the bridge does NOT merge the cliques: at least 2 communities,
    // and no community spans both id ranges
    assert(got.length >= 2)
    val byComm = lbl.groupBy(_._2).values.map(_.keys.toSeq)
    assert(byComm.forall(ids => ids.forall(_ <= 3L) || ids.forall(_ >= 10L)))
  }

  test("q326 fisherG matches the exact rational model over q36's spectrum") {
    import spark.implicits._
    val spec = graft.operators.Spectral.fftPower(spark, sfDir)
      .as[(Long, Long, Long)].collect()
      .filter(r => r._2 >= 1 && r._2 <= 3)
      .groupBy(_._1)
    val expect = spec.flatMap { case (u, rows) =>
      val sumq = rows.map(_._3).sum
      if (sumq <= 0) None else {
        val maxq = rows.map(_._3).max
        val kPeak = rows.filter(_._3 == maxq).map(_._2).min
        val p = (BigInt(3000000) * BigInt(sumq - maxq) * BigInt(sumq - maxq)
          / (BigInt(sumq) * BigInt(sumq))).toLong
        Some(u -> ((kPeak, maxq, sumq, maxq * 1000000L / sumq, p)))
      }
    }
    val got = graft.operators.Spectral.fisherG(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got.nonEmpty)
    assert(got === expect)
    // significance discriminates (not a constant column)
    info(s"p<5%: ${got.values.count(_._5 < 50000L)} of ${got.size}")
    assert(got.values.map(_._5).toSet.size > 1)
  }
}
