package graft

import graft.operators.{Curation, Dedup}

/** Model-level invariants for q210 (filter funnel) and q211 (dup source
  * matrix) on top of their DuckDB hash gates. */
class FunnelMatrixSpec extends SparkSpec {

  test("q210 funnel: first-fail counts partition the corpus and survivors decrease monotonically") {
    import spark.implicits._
    val rows = Curation.filterFunnel(spark, sfDir).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[Long]("n_first_fail"),
        r.getAs[Long]("n_any_fail"), r.getAs[Long]("survivors_after")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      Seq("1_too_short", "2_non_english", "3_word_len", "4_repetition", "5_kept"))
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // first-fail attributions + kept partition the corpus exactly
    assert(rows.map(_._2).sum === total,
      "first-fail attribution + kept does not partition the corpus")
    // a rule fires at least as often as it first-fires
    rows.init.foreach { case (s, first, any, _) =>
      assert(any >= first, s"$s: any=$any < first=$first")
    }
    // survivors monotonically decrease through the funnel and the kept
    // row closes it
    val surv = rows.init.map(_._4)
    assert(surv.zip(surv.tail).forall { case (a, b) => a >= b })
    assert(rows.last._4 === surv.last)
    assert(rows.last._2 === rows.last._4)
  }

  test("q211 matrix: canonical triangular pairs summing to the q28 pair count") {
    import spark.implicits._
    val m = Dedup.dupSourceMatrix(spark, sfDir).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    val nPairs = Dedup.simhashPairs(spark, sfDir).count()
    assert(m.map(_.getAs[Long]("n_pairs")).sum === nPairs,
      "matrix census does not partition the pair graph")
  }
}
