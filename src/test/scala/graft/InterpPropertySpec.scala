package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Interp, RangeJoin}

/** Property tests: the interpolation and range-join operators must equal
  * their brute-force models for arbitrary inputs (same seeded-generator
  * style as AsOfPropertySpec; one Spark job per round). */
class InterpPropertySpec extends SparkSpec {

  private val interpGen: Gen[(List[(Long, Double)], List[Long])] = for {
    // integer sample times (deduplicated), arbitrary values, probe times
    ts <- Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L))
    vs <- Gen.listOfN(ts.size, Gen.chooseNum(-1000.0, 1000.0))
    probes <- Gen.nonEmptyListOf(Gen.chooseNum(-120L, 120L))
  } yield (ts.distinct.zip(vs).toList, probes.toList)

  private def model(samples: List[(Long, Double)], t: Long): Option[Double] = {
    val prev = samples.filter(_._1 <= t).sortBy(_._1).lastOption
    val next = samples.filter(_._1 >= t).sortBy(_._1).headOption
    (prev, next) match {
      case (Some((t0, v0)), Some((t1, v1))) =>
        Some(if (t1 == t0) v0
             else v0 + (v1 - v0) * (t - t0).toDouble / (t1 - t0).toDouble)
      case _ => None
    }
  }

  test("Interp.linear equals the bracketing-lerp model (6 seeded rounds)") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(interpGen)
    for (round <- 0 until 6) {
      val groups = gen.pureApply(Gen.Parameters.default, Seed(7L + round))
        .zipWithIndex.map { case ((s, p), k) => (k.toLong, s, p.distinct) }
      val samples = groups.flatMap { case (k, s, _) => s.map(x => (k, x._1, x._2)) }
        .toDF("k", "t", "v")
      val probes = groups.flatMap { case (k, _, p) => p.map(t => (k, t)) }
        .toDF("k", "t")
      val got = Interp.linear(samples, probes, "k", "t", "v")
        .as[(Long, Long, Double)].collect()
        .map { case (k, t, v) => (k, t) -> v }.toMap
      for ((k, s, p) <- groups; t <- p) {
        val expect = model(s, t)
        assert(got.get((k, t)) === expect,
          s"round=$round k=$k t=$t samples=${s.sortBy(_._1).take(20)}")
      }
    }
  }

  private val rangeGen: Gen[(List[Double], List[(Double, Double)])] = for {
    pts <- Gen.nonEmptyListOf(Gen.chooseNum(-50.0, 50.0))
    ivs <- Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(-50.0, 50.0)
      len <- Gen.chooseNum(0.0, 20.0)
    } yield (a, a + len))
  } yield (pts.toList, ivs.toList)

  test("RangeJoin.pointInInterval equals the cross-filter model for any width") {
    import spark.implicits._
    for (round <- 0 until 4) {
      val (ptsL, ivsL) = rangeGen.pureApply(Gen.Parameters.default, Seed(99L + round))
      val pts = ptsL.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val ivs = ivsL.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iid", "lo", "hi")
      val expect = (for {
        (p, pi) <- ptsL.zipWithIndex; ((lo, hi), ii) <- ivsL.zipWithIndex
        if p >= lo && p <= hi
      } yield (pi.toLong, ii.toLong)).toSet
      for (w <- Seq(0.9, 7.3, 60.0)) {
        val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(got === expect, s"round=$round width=$w")
      }
    }
  }
}
