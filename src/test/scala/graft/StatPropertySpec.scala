package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Curation, Evaluate}

/** ScalaCheck properties for the round-9 statistics: the distributed
  * grid/aggregate formulations must equal the textbook brute-force
  * definitions on arbitrary small inputs — the check the DuckDB gate
  * can't provide (it proves cross-engine EQUALITY, not that both
  * engines compute the intended statistic). Generators sampled with
  * fixed seeds (no scalatestplus bridge in the offline cache — the
  * AsOfPropertySpec pattern). */
class StatPropertySpec extends SparkSpec {

  private val valuesGen: Gen[List[Long]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 8L)))

  test("q191 2U from the count grid equals brute-force pair counting") {
    import spark.implicits._
    (1 to 25).foreach { i =>
      val ctrl = valuesGen(Gen.Parameters.default, Seed(1000L + i)).get
      val treat = valuesGen(Gen.Parameters.default, Seed(2000L + i)).get
      val rows = (ctrl.map(v => ("t", v, false))
        ++ treat.map(v => ("t", v, true)))
        .toDF("event_type", "vq", "treat")
      val out = Evaluate.mannWhitneyOn(rows).collect()
      // brute force: 2U = 2*#{(t, c): t > c} + #{t == c}
      val brute = (for (t <- treat; c <- ctrl) yield {
        if (t > c) 2L else if (t == c) 1L else 0L
      }).sum
      if (out.nonEmpty) {
        assert(out.head.getAs[Long]("u2") === brute, s"round $i")
        assert(out.head.getAs[Long]("n0") === ctrl.length.toLong)
        assert(out.head.getAs[Long]("n1") === treat.length.toLong)
      } else {
        // the operator drops degenerate relations (zero variance);
        // it must only do so when ALL values are identical
        assert((ctrl ++ treat).distinct.length === 1, s"round $i")
      }
    }
  }

  private val panelGen: Gen[List[List[Option[Long]]]] =
    Gen.listOfN(12, Gen.listOfN(4,
      Gen.oneOf[Option[Long]](None, Some(0L), Some(1L))))

  test("q186 alpha from vote sums equals the coincidence-matrix formula") {
    import spark.implicits._
    (1 to 25).foreach { i =>
      val panel = panelGen(Gen.Parameters.default, Seed(3000L + i)).get
      val perDoc = panel.zipWithIndex.map { case (votes, idx) =>
        val m = votes.count(_.isDefined).toLong
        val n1 = votes.flatten.sum
        (idx.toLong, m, n1, m - n1)
      }.toDF("doc_id", "m", "n1", "n0")
      val out = Curation.alphaFrom(perDoc).collect()
      assert(out.length === 1)
      val r = out.head
      // direct Krippendorff (nominal, binary), cleared to the integer
      // form INDEPENDENTLY of the operator's expression
      val units = panel.map(v => (v.count(_.isDefined).toLong,
        v.flatten.sum)).filter(_._1 >= 2)
      val n = units.map(_._1).sum
      val n1t = units.map(_._2).sum
      val n0t = n - n1t
      if (n0t > 0 && n1t > 0) {
        val o6 = units.map { case (m, n1) =>
          (6 / (m - 1)) * (m - n1) * n1 }.sum
        val expect = 1000000L - (o6 * (n - 1) * 1000000L) / (6 * n0t * n1t)
        assert(r.getAs[Long]("alpha_ppm") === expect, s"round $i")
        // zero observed disagreement must read as perfect agreement
        if (o6 == 0) assert(r.getAs[Long]("alpha_ppm") === 1000000L)
      } else if (r.getAs[Long]("n_units") > 0) {
        assert(r.get(r.fieldIndex("alpha_ppm")) == null, s"round $i")
      }
    }
  }
}
