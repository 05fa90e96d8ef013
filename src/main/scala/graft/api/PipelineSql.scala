package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** SQL surface for the LLM-pipeline verbs — the catalog-driven twin of
  * the reference's synthesized user API (`/root/reference/fdf/factory.py:654-686`
  * builds its whole surface from metadata at construction; this builds
  * the pipeline's SQL surface from the operator registry at session
  * setup). After `PipelineSql.register(spark, corpusDir)`:
  *
  *  - every verb is a session view (`SELECT * FROM graft_minhash_pairs
  *    WHERE jaccard >= 0.8`) — views are LAZY logical plans, so
  *    Catalyst pushes filters and column pruning into the verb's own
  *    plan exactly as the Scala call site gets, and verbs compose with
  *    arbitrary SQL (joins against user tables, CTEs, aggregation);
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
  * Parameter bounds are inherited from the cores, not re-checkable in
  * SQL: `minhash_pairs(t)` is exact only for t at or above the banding
  * design threshold of the q26 core (candidates below it were never
  * generated), and `semdedup_verdicts(t)` for t >= 350000 ppm (the
  * within-cell verify floor — `max_cos_q` is the sentinel -2000000
  * when no earlier same-cell vector reached the floor). */
object PipelineSql {

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
    "graft_wedge_sample"        -> (Dedup.wedgeSample _))

  /** Register the verb views and the parameterized table functions on
    * this session, bound to the corpus at `dir`. Views and temporary
    * functions are session-scoped; re-registration replaces. */
  def register(spark: SparkSession, dir: String): Unit = {
    Verbs.foreach { case (view, f) =>
      f(spark, dir).createOrReplaceTempView(view)
    }
    // near-dup pairs at a caller-chosen verified-Jaccard floor
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION minhash_pairs(min_jaccard DOUBLE)
         RETURNS TABLE (doc_a BIGINT, doc_b BIGINT, jaccard DOUBLE)
         RETURN SELECT doc_a, doc_b, jaccard
         FROM graft_minhash_pairs WHERE jaccard >= min_jaccard""")
    // SemDeDup keep/drop verdicts at a caller-chosen cosine floor (ppm)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION semdedup_verdicts(min_cos_ppm BIGINT)
         RETURNS TABLE (vec_id BIGINT, cell BIGINT, max_cos_q BIGINT,
                        kept BOOLEAN)
         RETURN SELECT vec_id, cell, max_cos_q,
           (max_cos_q < min_cos_ppm) AS kept
         FROM graft_semdedup""")
  }
}
