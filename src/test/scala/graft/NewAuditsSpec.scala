package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Evaluate, Graph, Sampling, TextAnalysis}

/** q233-q236: agreement, vocabulary-generalization and split-balance
  * audits. Cores are exercised on handcrafted partitions with known
  * closed-form answers; the (spark, dir) wrappers on the sf0.001 sample
  * with invariants the oracle gate can't express (cross-row identities). */
class NewAuditsSpec extends SparkSpec {

  test("ariOn: identical partitions score exactly 1e6 ppm, even renamed") {
    import spark.implicits._
    val labels = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"),
      ("c", "z")).toDF("gold", "predicted")
    // predicted is gold under a bijective rename — ARI is defined on
    // partitions, so this must be perfect agreement
    val r = Evaluate.ariOn(labels).collect().head
    assert(r.getAs[Long]("ari_ppm") === 1000000L)
  }

  test("ariOn: a constant labeling scores exactly 0 (chance level)") {
    import spark.implicits._
    val labels = Seq(("a", "x"), ("a", "x"), ("b", "x"), ("b", "x"),
      ("c", "x"), ("c", "x")).toDF("gold", "predicted")
    val r = Evaluate.ariOn(labels).collect().head
    assert(r.getAs[Long]("ari_ppm") === 0L)
  }

  test("assortativityOn: a star is perfectly disassortative (-1000 milli)") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("doc_a", "doc_b")
    val r = Graph.assortativityOn(star).collect().head
    assert(r.getAs[Long]("r_milli") === -1000L)
    assert(r.getAs[Long]("m") === 8L) // both orientations
  }

  test("assortativityOn: a regular graph has zero degree variance -> r = 0") {
    import spark.implicits._
    val triangle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("doc_a", "doc_b")
    val r = Graph.assortativityOn(triangle).collect().head
    assert(r.getAs[Long]("r_milli") === 0L)
    assert(r.getAs[Long]("sum_deg_sq") === 24L) // 6 oriented edges x 2^2
  }

  test("splitBalance: marginals are consistent and chi2 is the contrib sum") {
    val rows = Sampling.splitBalance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("o")).sum
    val chi2 = rows.head.getAs[Long]("chi2_micro")
    assert(rows.forall(_.getAs[Long]("chi2_micro") === chi2))
    assert(chi2 === rows.map(_.getAs[Long]("contrib_micro")).sum)
    // every doc lands in exactly one cell
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(total === n)
  }

  test("splitOov: val/test only, and OOV counts bounded by totals") {
    val rows = TextAnalysis.splitOov(spark, sfDir).collect()
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("val", "test")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_oov_types") <= r.getAs[Long]("n_oov"))
      val ppm = r.getAs[Long]("oov_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }
}
