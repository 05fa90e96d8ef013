package graft

import org.apache.spark.sql.SparkSession

/** Latency-attribution probe for the small-query bench tail (not part
  * of the driver contract).
  *
  * Context: the per-round DIFF artifact compares each query's wall time
  * against DuckDB running in-process with zero scheduling machinery. On
  * sub-second queries the JVM's fixed per-job cost (plan → AQE stage
  * re-planning → task scheduling round-trips, multiplied by the number
  * of jobs a query runs — every Ckpt/collect boundary is one) dominates
  * Spark's wall time, so the per-query RATIO reads as a plan defect
  * when it is actually a constant. This probe separates the two:
  *
  *   t_empty = best-of-3 wall for the SAME query at sf0.001 (~no data:
  *             the full job DAG runs, the operators touch ~nothing —
  *             this IS the fixed overhead of that query's DAG shape)
  *   t_data  = best-of-3 wall at sf0.1 (the DIFF measurement scale)
  *   plan_s  = t_data - t_empty = the data-dependent part, the number
  *             DuckDB's per-query seconds should be compared against
  *
  * Session setup mirrors Bench (shared warmed session, 32 threads) plus
  * `spark.sql.adaptive.coalescePartitions.parallelismFirst=false` so
  * AQE coalesces toy-scale shuffles to few tasks instead of fanning
  * out to parallelism — the advisor-suggested knob for the tail.
  *
  * Output: one JSON object on stdout, `{name: {t_empty, t_data}}`;
  * `tools/attribute_tail.py` joins it with the round's DIFF artifact
  * into the COVERAGE attribution table.
  *
  * Usage: runMain graft.Overhead [queryName...] (default: the 47-query
  * ratio>=2, spark>=0.8s tail of DIFF_r11).
  */
object Overhead {

  /** DIFF_r11's material tail: ratio >= 2 vs DuckDB AND spark >= 0.8 s
    * (the sub-0.8 s rest of the >=2x set is pure fixed overhead by
    * inspection — DuckDB runs those in single-digit milliseconds). */
  val DefaultTail: Seq[String] = Seq(
    "q174_dataset_card", "q96_source_kl", "q182_js_divergence",
    "q137_vocab_growth", "q111_pmi_collocations", "q198_coherence",
    "q130_canon_dedup", "q175_mmr_diversify", "q204_mixture_weights",
    "q160_tfidf_terms", "q209_dsir_select", "q166_label_prop",
    "q78_salient_terms", "q23_distinct_count", "q203_exp_gof",
    "q122_char_entropy", "q158_basket_lift", "q242_sliced_w1",
    "q83_bloom_semijoin", "q232_cv_auc", "q254_bpe_merges",
    "q257_fs_weights", "q241_calibration_ece", "q235_assortativity",
    "q94_semantic_dedup", "q250_modularity", "q231_transitivity",
    "q119_hampel", "q108_vocab_coverage", "q45_interpolate",
    "q151_theil_sen", "q11_nearest_asof", "q196_mrr_eval",
    "q97_bigram_stats", "q211_dup_source_matrix", "q194_neg_sampling",
    "q159_doc_ppl", "q90_tf_cosine", "q230_dup_core",
    "q129_vocab_nucleus", "q25_ngram_jaccard", "q213_threshold_sweep",
    "q201_blob_phash", "q164_dup_token_rate", "q190_split_leakage",
    "q89_winnow_overlap", "q125_containment")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else DefaultTail
    // override to probe other layouts (e.g. a ScaleSmoke replica dir as
    // GRAFT_BIG_DIR to read a query's 1x->Nx ratio instead of its
    // overhead split)
    val tiny = sys.env.getOrElse("GRAFT_TINY_DIR", "/root/testdata/sf0.001")
    val big = sys.env.getOrElse("GRAFT_BIG_DIR", "/root/testdata/sf0.1")
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // untimed warm pass per (query, dir): janino/JIT compilation is the
    // dominant first-run cost and must not leak into either measurement
    names.foreach { n => run(n, tiny); run(n, big) }
    val out = names.map { n =>
      val e = (1 to 3).map(_ => run(n, tiny)).min
      val d = (1 to 3).map(_ => run(n, big)).min
      System.err.println(f"[overhead] $n%-24s empty=$e%6.3f data=$d%6.3f")
      f""""$n":{"t_empty":$e%.3f,"t_data":$d%.3f}"""
    }
    println("{" + out.mkString(",") + "}")
    spark.stop()
  }
}
