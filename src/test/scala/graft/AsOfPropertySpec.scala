package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.GraftPlans

/** Property test (SURVEY §5 test plan): the custom as-of merge exec must
  * equal the brute-force nearest-sample model — global argmin of |t - v|
  * with numpy first-minimum tie-breaking (earlier value, then earlier id)
  * — for arbitrary key groups, duplicate values, and probe positions.
  * ScalaCheck generators sampled with fixed seeds (scalatest+scalacheck
  * only; no scalatestplus bridge in the offline cache); each round builds
  * one multi-key DataFrame so it is a single Spark job. */
class AsOfPropertySpec extends SparkSpec {

  private val groupGen: Gen[(List[Double], List[Double])] = for {
    rights <- Gen.nonEmptyListOf(Gen.chooseNum(-50.0, 50.0))
    dups <- Gen.someOf(rights) // duplicates to force plateaus
    probes <- Gen.nonEmptyListOf(Gen.chooseNum(-60.0, 60.0))
  } yield ((rights ++ dups).toList, probes.toList)

  private def model(rights: Seq[(Double, Int)], t: Double): (Double, Int) =
    // numpy argmin over rows sorted by (value, id): first minimum wins
    rights.sortBy(identity).minBy { case (v, _) => math.abs(v - t) }

  test("asofMergeJoin equals the brute-force argmin model (8 seeded rounds)") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(groupGen)
    for (round <- 0 until 8) {
      val groups = gen.pureApply(Gen.Parameters.default, Seed(42L + round))
      val keyed = groups.zipWithIndex.map { case ((r, p), k) => (k, r, p) }
      val rightRows = for {
        (k, rights, _) <- keyed
        (v, id) <- rights.zipWithIndex
      } yield (k, v, id)
      val leftRows = for {
        (k, _, probes) <- keyed
        (t, pid) <- probes.zipWithIndex
      } yield (k, t, pid)
      val right = rightRows.toDF("k", "rv", "rid")
      val left = leftRows.toDF("k", "t", "pid")
      val got = GraftPlans
        .asofMergeJoin(left, right, Seq("k" -> "k"), "t", "rv",
          rightTie = Seq("rid"))
        .select($"k", $"pid", $"rv", $"rid")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getInt(3)))
        .toMap
      for ((k, rights, probes) <- keyed; (t, pid) <- probes.zipWithIndex) {
        val expect = model(rights.zipWithIndex, t)
        assert(got((k, pid)) === expect,
          s"round=$round key=$k probe=$t rights=${rights.sorted.take(20)}")
      }
    }
  }
}
