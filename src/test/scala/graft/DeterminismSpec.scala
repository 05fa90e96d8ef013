package graft

import org.apache.spark.sql.DataFrame

/** Partition-count independence — the determinism discipline's core
  * claim (SCALE.md ground rules): every query's RESULT is identical at
  * any shuffle width, because double sums route through decimal or
  * integer quantization, ties break on explicit keys, and floats only
  * appear inside per-row expressions or after exact aggregation. This
  * spec runs a cross-family sample of the hash-gated queries in two
  * cloned sessions at adversarial widths (3 vs 13 partitions, AQE on)
  * and compares collected results EXACTLY. */
class DeterminismSpec extends SparkSpec {

  // families with the most partition-sensitive machinery: libm + offset
  // quantization (fft/coherence/ewma), decimal sums, window ties,
  // iterative fixpoints, rank cuts, and the md5 draw path
  private val sample = Seq(
    "q01_agg_pushdown", "q17_topk_per_group", "q23_distinct_count",
    "q36_fft_power", "q42_quantiles", "q62_dup_clusters",
    "q90_tf_cosine", "q96_source_kl", "q103_pagerank",
    "q179_fdr_drift", "q180_ewma_forecast", "q184_hits",
    "q191_mann_whitney", "q194_neg_sampling", "q198_coherence",
    "q201_blob_phash", "q204_mixture_weights",
    // round-10 rewrites: explicit repartition widths + checkpointed
    // self-joins + two-phase rank — exactly the machinery a partition-
    // width change would shake loose
    "q151_theil_sen", "q158_basket_lift", "q196_mrr_eval", "q202_item_cf",
    // round 13: the md5-draw samplers (wedge CDF lookup, Poisson
    // bootstrap), the HLL register/harmonic-sum path, the ADC LUT
    // pipeline, and the weighted rank select — exactly the new
    // machinery a width change would shake loose
    "q285_wedge_sample", "q288_bootstrap_ci", "q292_hll_distinct",
    "q284_ivf_pq_adc", "q298_weighted_median")

  private def collectCanon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sampled queries are bit-identical at 3 vs 13 shuffle partitions") {
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.shuffle.partitions", "3")
    val s13 = spark.newSession()
    s13.conf.set("spark.sql.shuffle.partitions", "13")
    sample.foreach { name =>
      val q = SparkEntry.queries(name)
      val a = collectCanon(q(s3, sfDir))
      val b = collectCanon(q(s13, sfDir))
      assert(a === b, s"$name differs between partition widths")
      assert(a.nonEmpty || name == "q201_blob_phash", s"$name empty")
    }
  }

  test("cloned-session isolation: CC fixpoint and AQE window queries planned concurrently on one shared session") {
    // Graph.connectedComponents clones the caller session so its
    // loop conf (AQE off, narrow shuffles) cannot race concurrently
    // planned queries. The claim was backed by "Verify runs a thread
    // pool"; this pins it directly: many CC fixpoints and many
    // AQE-dependent windowed aggregates planned AT THE SAME TIME on the
    // SAME caller session, every result equal to its serial twin.
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val serialCc = collectCanon(SparkEntry.queries("q62_dup_clusters")(spark, sfDir))
    val serialWin = collectCanon(SparkEntry.queries("q17_topk_per_group")(spark, sfDir))
    val serialAgg = collectCanon(SparkEntry.queries("q01_agg_pushdown")(spark, sfDir))
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") === "true")
    val pool = Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val rounds = 3
      val futures = (0 until rounds).flatMap { _ =>
        Seq(
          Future(("cc", collectCanon(
            SparkEntry.queries("q62_dup_clusters")(spark, sfDir)))),
          Future(("win", collectCanon(
            SparkEntry.queries("q17_topk_per_group")(spark, sfDir)))),
          Future(("agg", collectCanon(
            SparkEntry.queries("q01_agg_pushdown")(spark, sfDir)))))
      }
      val results = Await.result(Future.sequence(futures), 10.minutes)
      results.foreach {
        case ("cc", r)  => assert(r === serialCc, "CC diverged under concurrency")
        case ("win", r) => assert(r === serialWin, "window query diverged under concurrency")
        case ("agg", r) => assert(r === serialAgg, "agg query diverged under concurrency")
        case other      => fail(s"unexpected tag $other")
      }
      // the shared caller session's conf must be untouched by the
      // cloned loops (AQE still on, width still the session default)
      assert(spark.conf.get("spark.sql.adaptive.enabled", "true") === "true")
    } finally pool.shutdown()
  }
}
