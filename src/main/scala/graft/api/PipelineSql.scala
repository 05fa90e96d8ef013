package graft.api

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** SQL surface for the LLM-pipeline verbs — the catalog-driven twin of
  * the reference's synthesized user API (`/root/reference/fdf/factory.py:654-686`
  * builds its whole surface from metadata at construction; this builds
  * the pipeline's SQL surface from the operator registry at session
  * setup). After `PipelineSql.register(spark, corpusDir)`:
  *
  *  - every verb is a session view (`SELECT * FROM graft_minhash_pairs
  *    WHERE jaccard >= 0.8`). Most views are LAZY logical plans, so
  *    Catalyst pushes filters and column pruning into the verb's own
  *    plan exactly as the Scala call site gets, and verbs compose with
  *    arbitrary SQL (joins against user tables, CTEs, aggregation).
  *    Two verbs are only PARTIALLY lazy by design:
  *    `graft_ivf_pq_adc` trains its codebook with driver-side jobs at
  *    registration (the codebook is a collected 8-row artifact), and
  *    `graft_wedge_sample` contains internal lineage-truncation
  *    checkpoints — its plan builds lazily, but once queried, pushdown
  *    stops at the checkpoint boundary and the view reads that
  *    materialized snapshot until re-registration;
  *  - the parameterized screens are SQL table functions
  *    (`SELECT * FROM minhash_pairs(0.8)`,
  *    `SELECT * FROM semdedup_verdicts(500000)`) — Spark 4 SQL UDFs
  *    whose bodies re-rank the registered views, so a SQL user never
  *    re-states the screen logic.
  *
  * The views bind the SAME operator entry points the correctness gate
  * runs (CatalogSqlSpec pins SQL == gated core row-for-row), so a SQL
  * user and a Scala user can never diverge.
  *
  * Parameter bounds are ENFORCED, not just documented: the cores only
  * generate candidates down to their design floors (`minhash_pairs`
  * banding verifies at Jaccard 0.5; `semdedup_verdicts`' `max_cos_q` is
  * the -2000000 sentinel below the 350000 ppm within-cell verify
  * floor), so a call below the floor cannot be answered exactly — the
  * function bodies `assert_true` the argument and fail loudly instead
  * of returning a plausible-looking under-report. */
object PipelineSql {

  /** Exact-answer floors of the parameterized table functions — the
    * candidate-generation design thresholds of the bound cores. */
  val MinhashJaccardFloor = 0.5
  val SemdedupCosFloorPpm = 350000L

  /** view name -> the gated core it binds (dir-parameterized). */
  val Verbs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graft_exact_dedup"         -> (Dedup.exactDedup _),
    "graft_ngram_jaccard_pairs" -> (Dedup.ngramJaccard _),
    "graft_minhash_pairs"       -> (Dedup.minhashLsh _),
    "graft_simhash_pairs"       -> (Dedup.simhashPairs _),
    "graft_ann_brute"           -> (Similarity.annBrute _),
    "graft_langid"              -> (TextAnalysis.langid _),
    "graft_token_count"         -> (TextAnalysis.tokenCount _),
    "graft_ivf_ann"             -> (Similarity.ivfAnn _),
    "graft_ivf_pq_adc"          -> (Similarity.ivfPqAdc _),
    "graft_stratified_sample"   -> (Sampling.langStratified _),
    "graft_dup_clusters"        -> (Graph.dupClusters _),
    "graft_cluster_keepers"     -> (Graph.clusterKeepers _),
    "graft_pii_redact"          -> (Curation.piiRedact _),
    "graft_semdedup"            -> (Similarity.semanticDedup _),
    "graft_curation_funnel"     -> (Curation.filterFunnel _),
    "graft_wedge_sample"        -> (Dedup.wedgeSample _),
    "graft_unigram_em"          -> (TextAnalysis.unigramEmStep _),
    "graft_sketch_jaccard"      -> (TextAnalysis.sketchJaccard _),
    "graft_suffix_dup"          -> (Dedup.suffixDup _),
    "graft_kmv_jaccard"         -> (TextAnalysis.kmvIntersect _),
    "graft_ensemble_dedup"      -> (Dedup.ensembleDedup _),
    "graft_kn_entropy"          -> (TextAnalysis.knCrossEntropy _),
    "graft_dup_coverage"        -> (Dedup.dupCoverage _),
    "graft_keyness"             -> (TextAnalysis.keyness _),
    "graft_textrank"            -> (TextAnalysis.textrank _),
    "graft_ljung_box"           -> (Timeseries.ljungBox _),
    "graft_dbscan_core"         -> (Similarity.dbscanCore _),
    "graft_lpa_communities"     -> (Graph.lpaCommunities _))
  // NOT registered as views (deliberate): gapStatistic, kmeansParInit,
  // facilitySelect, pprSeeds — each runs driver-side collect rounds at
  // plan-construction time, so a view would execute Spark jobs during
  // register() (the ADVICE r13 "views are LAZY" accuracy issue). They
  // remain Scala-API verbs; a SQL surface for them belongs behind an
  // explicitly-invoked TVF, not a session view.

  /** Internal checkpoints minted while building each session's views —
    * released (executor blocks + durable files) when [[register]] replaces
    * them, so repeated re-registration on a long-lived session does not
    * accumulate orphaned checkpoint storage. */
  private val sessionCkpts =
    new ConcurrentHashMap[SparkSession, Seq[DataFrame]]()

  /** Register the verb views and the parameterized table functions on
    * this session, bound to the corpus at `dir`. Views and temporary
    * functions are session-scoped; re-registration replaces the views
    * AND releases the previous registration's internal checkpoints. */
  def register(spark: SparkSession, dir: String): Unit = {
    val minted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    Ckpt.collecting(minted) {
      Verbs.foreach { case (view, f) =>
        f(spark, dir).createOrReplaceTempView(view)
      }
    }
    Option(sessionCkpts.put(spark, minted.toSeq))
      .foreach(_.foreach(Ckpt.release))
    // near-dup pairs at a caller-chosen verified-Jaccard floor. The guard
    // is a one-row relation FILTERED on assert_true: a filter bears
    // cardinality, so column pruning cannot drop it (a guard COLUMN is
    // pruned under count(*)), and the one-row side evaluates whether or
    // not the view produces rows, so an out-of-domain threshold fails
    // loudly even on an empty result. In-domain literal calls constant-
    // fold the predicate to true — zero runtime overhead.
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION minhash_pairs(min_jaccard DOUBLE)
         RETURNS TABLE (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)
         RETURN SELECT doc_a, doc_b, jaccard
         FROM (SELECT 1 AS one
               WHERE assert_true(min_jaccard >= ${MinhashJaccardFloor}D,
                 'minhash_pairs: min_jaccard below the banding design floor '
                 || '$MinhashJaccardFloor — candidates below it were never '
                 || 'generated, the result would under-report') IS NULL) guard
         CROSS JOIN graft_minhash_pairs
         WHERE jaccard >= min_jaccard""")
    // SemDeDup keep/drop verdicts at a caller-chosen cosine floor (ppm)
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION semdedup_verdicts(min_cos_ppm BIGINT)
         RETURNS TABLE (vec_id BIGINT, cell BIGINT, max_cos_q BIGINT,
                        kept BOOLEAN)
         RETURN SELECT vec_id, cell, max_cos_q,
           (max_cos_q < min_cos_ppm) AS kept
         FROM (SELECT 1 AS one
               WHERE assert_true(min_cos_ppm >= ${SemdedupCosFloorPpm}L,
                 'semdedup_verdicts: min_cos_ppm below the within-cell '
                 || 'verify floor $SemdedupCosFloorPpm — max_cos_q is the '
                 || '-2000000 sentinel below it, verdicts would be wrong') IS NULL) guard
         CROSS JOIN graft_semdedup""")
  }
}
