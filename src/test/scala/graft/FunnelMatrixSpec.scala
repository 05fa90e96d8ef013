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

  test("q212 truncation waste: monotone in L and bounded by the token mass") {
    val rows = graft.operators.Sampling.truncationWaste(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("max_len"), r.getAs[Long]("n_docs_over"),
        r.getAs[Long]("tokens_lost"), r.getAs[Long]("lost_ppm")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(16L, 32L, 64L, 96L))
    // larger caps lose fewer docs and fewer tokens
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 >= b._2 && a._3 >= b._3 && a._4 >= b._4)
      case _ =>
    }
    assert(rows.forall(r => r._4 >= 0L && r._4 <= 1000000L))
    // at L=16 with a 10..99-token corpus, waste must be nonzero
    assert(rows.head._3 > 0L)
  }

  test("q213 sweep: deciles in [5,10] and a consistent cumulative census") {
    val rows = graft.operators.Dedup.thresholdSweep(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_at_or_above")))
      .sortBy(-_._1)
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 5L && r._1 <= 10L && r._2 > 0L))
    // cumulative really is the running sum from the top decile down
    var acc = 0L
    rows.foreach { case (_, n, cum) => acc += n; assert(cum === acc) }
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
