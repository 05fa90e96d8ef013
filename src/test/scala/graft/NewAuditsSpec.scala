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

  test("spearmanOn: any monotone map is rho = +1000, reversal is -1000") {
    import spark.implicits._
    // y = x^2 is monotone but non-linear: Pearson would be < 1, Spearman
    // must be exactly 1
    val mono = Seq((1L, 1L), (2L, 4L), (3L, 9L), (5L, 25L), (8L, 64L))
      .map { case (x, y) => ("en", x, y) }.toDF("lang", "x", "y")
    assert(Evaluate.spearmanOn(mono).collect()
      .head.getAs[Long]("rho_milli") === 1000L)
    val rev = mono.select($"lang", $"x", (-$"y").as("y"))
    assert(Evaluate.spearmanOn(rev).collect()
      .head.getAs[Long]("rho_milli") === -1000L)
  }

  test("spearmanOn: ties get average ranks (constant y -> rho 0)") {
    import spark.implicits._
    val const = Seq(("en", 1L, 7L), ("en", 2L, 7L), ("en", 3L, 7L))
      .toDF("lang", "x", "y")
    // zero y-variance -> vy = 0 -> guarded to 0, not NaN
    assert(Evaluate.spearmanOn(const).collect()
      .head.getAs[Long]("rho_milli") === 0L)
  }

  test("clusterSizes: census is conservative over the q62 labeling") {
    val rows = Graph.clusterSizes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("n_removable") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
    }
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
  }

  test("zOutliers: 20 dense ranks in score order") {
    val rows = graft.operators.Quantize.zOutliers(spark, sfDir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 20L))
    val scores = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("score_milli"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("vocabOverlap: intersections bounded by both vocabularies") {
    val rows = TextAnalysis.vocabOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, a, b) = (r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(s <= math.min(a, b))
      val ppm = r.getAs[Long]("jaccard_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
    }
  }

  test("calibrationEce: equal-count deciles, consistent weighted total") {
    val rows = Evaluate.calibrationEce(spark, sfDir).collect()
    assert(rows.length === 10)
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    assert(n === spark.read.parquet(s"$sfDir/documents.parquet").count())
    // equal-count within one doc of each other is NOT guaranteed under
    // ties, but no bin may be empty and counts must be near n/10
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0L)
      assert(r.getAs[Long]("acc_ppm") >= 0L
        && r.getAs[Long]("acc_ppm") <= 1000000L)
      assert(r.getAs[Long]("gap_ppm") ===
        math.abs(r.getAs[Long]("acc_ppm") - r.getAs[Long]("conf_ppm")))
    }
    val ece = rows.head.getAs[Long]("ece_ppm")
    val expect = rows.map(r =>
      r.getAs[Long]("n_docs") * r.getAs[Long]("gap_ppm")).sum / n
    assert(rows.forall(_.getAs[Long]("ece_ppm") === ece))
    assert(ece === expect)
  }

  test("slicedW1: 4 planes per label, nonnegative W1, swd is the plane mean") {
    val rows = Evaluate.slicedW1(spark, sfDir).collect()
    val byLabel = rows.groupBy(_.getAs[Long]("label"))
    byLabel.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("plane")).toSet === Set(0L, 1L, 2L, 3L))
      assert(rs.map(_.getAs[Long]("n_s")).toSet.size === 1)
      rs.foreach(r => assert(r.getAs[Long]("w1_micro") >= 0L))
      val swd = rs.head.getAs[Long]("swd_micro")
      assert(rs.forall(_.getAs[Long]("swd_micro") === swd))
      assert(swd === rs.map(_.getAs[Long]("w1_micro")).sum / 4)
    }
  }

  test("lexSemAgreement: intersection bounded by both pair sets") {
    val r = graft.operators.Dedup.lexSemAgreement(spark, sfDir)
      .collect().head
    val (nl, ns, nb) = (r.getAs[Long]("n_lex"), r.getAs[Long]("n_sem"),
      r.getAs[Long]("n_both"))
    assert(nb <= math.min(nl, ns))
    assert(r.getAs[Long]("pair_jaccard_ppm") <= 1000000L)
    if (nl > 0)
      assert(r.getAs[Long]("recall_vs_lex_ppm") === nb * 1000000L / nl)
  }

  test("cellLabelAri: one row, ARI within [-1, 1], full collection counted") {
    val r = graft.operators.Similarity.cellLabelAri(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_docs") ===
      spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    val ari = r.getAs[Long]("ari_ppm")
    assert(ari >= -1000000L && ari <= 1000000L)
  }

  test("radiusSweep: cumulative counts are the running sum and monotone") {
    val rows = graft.operators.Dedup.radiusSweep(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("radius"))
    assert(rows.map(_.getAs[Long]("radius")).toSeq === Seq(0L, 1L, 2L))
    var run = 0L
    rows.foreach { r =>
      run += r.getAs[Long]("n_pairs_at")
      assert(r.getAs[Long]("n_pairs_cum") === run)
    }
    val cov = rows.map(_.getAs[Long]("n_docs_covered"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    // radius 1 must reproduce q28's relation size exactly
    val q28 = graft.operators.Dedup.simhashPairs(spark, sfDir).count()
    assert(rows(1).getAs[Long]("n_pairs_cum") === q28)
  }

  test("dedupSavings: removal conserves docs and tokens vs the q62 labeling") {
    val rows = Graph.dedupSavings(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_removed") <= r.getAs[Long]("tokens_total"))
    }
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === spark.read.parquet(s"$sfDir/documents.parquet").count())
    // total removed docs == docs minus clusters (one keeper each)
    val labels = Graph.dupClusters(spark, sfDir)
    val nClusters = labels.select("cluster_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_removed")).sum === nDocs - nClusters)
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
