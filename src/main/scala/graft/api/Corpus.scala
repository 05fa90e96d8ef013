package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Graph, TextOps}

/** Fluent corpus surface — the text-family twin of [[Curate]] and the
  * document-domain analog of the reference's chained signal verbs
  * (`fdf/fdf_signal.py`): every dedup/analysis pipeline stage exposed
  * as a verb over ONE `(doc_id, text, …)` relation, so a user composes
  *
  * {{{
  * val c = Corpus(docs)
  * val pairs    = c.nearDupPairs(0.6)          // exact PPJoin
  * val clusters = c.dupClusters(pairs)          // distributed CC
  * val verdicts = c.keepers(clusters)           // is_keeper per doc
  * val clean    = c.minus(verdicts.where(col("is_keeper")), keep = true)
  * }}}
  *
  * instead of hand-wiring the operator objects. All verbs delegate to
  * the oracle-gated cores (`Dedup.*On`, `Graph.*From`) — the fluent
  * layer adds NO computation of its own, so every plan here is exactly
  * the plan the correctness gate verified. Column contract: `doc_id`
  * (long) and `text` (string) must exist; extra columns ride along
  * untouched where the verb allows it. */
final case class Corpus(docs: DataFrame) {

  private def base: DataFrame = docs.select(col("doc_id"), col("text"))

  /** Exact-duplicate groups: one row per distinct text with its keeper
    * (lowest doc_id) and copy count. */
  def exactDupGroups(): DataFrame = base
    .groupBy(md5(col("text")).as("fp"))
    .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact near-duplicate pairs at word-3-gram Jaccard ≥ t — q25's
    * PPJoin (provably identical to the naive all-pairs join). */
  def nearDupPairs(t: Double = 0.6): DataFrame =
    // project away the n_a/n_b ride-alongs the core emits for q213 —
    // this verb's public schema is pinned to (doc_a, doc_b, n_shared,
    // jaccard), mirroring the q25 wrapper
    Dedup.ngramJaccardOn(base, t)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("jaccard"))

  /** Asymmetric containment pairs (quote/boilerplate inclusion) at
    * containment ≥ t — q125's prefix-pruned join. */
  def containmentPairs(t: Double = 0.8): DataFrame =
    Dedup.containmentOn(base, t)

  /** Exact duplicated-substring spans (win-token windows occurring in
    * ≥ 2 docs, merged to maximal spans) — q100's linear pipeline. */
  def dupSpans(win: Int = 5): DataFrame = Dedup.dupSpansOn(base, win)

  /** Inverted-index tf-cosine near-dup pairs — q90's posting-list
    * term-at-a-time join. */
  def tfCosinePairs(): DataFrame = Dedup.tfCosinePairsOn(base)

  /** Screen a NEW batch against this corpus by MinHash band collision +
    * exact-Jaccard verify — q109's ingest-gate shape: only the delta is
    * re-signed, cost O(delta + collisions). */
  def screenDelta(delta: DataFrame): DataFrame = {
    def shingled(d: DataFrame) = d
      .select(col("doc_id"), TextOps.shingles(TextOps.toks(col("text")), 3).as("sh"))
      .where(size(col("sh")) > 0)
    Dedup.deltaDedupOn(shingled(delta), shingled(base))
  }

  /** Connected components over any near-dup pair relation
    * `(doc_a, doc_b)` — every doc labeled with its cluster (q62's
    * pointer-jumping fixpoint; singletons label themselves). */
  def dupClusters(pairs: DataFrame): DataFrame =
    Graph.dupClustersFrom(pairs, base.select(col("doc_id")))

  /** Retention verdicts: every doc with its cluster, the cluster's
    * keeper (argmax quality, min-id ties; default quality: doc length),
    * and `is_keeper` — q79's selection over precomputed clusters, so
    * the CC fixpoint runs once per pipeline, not per verb. */
  def keepers(clusters: DataFrame, quality: Column = length(col("text")).cast("long"))
      : DataFrame =
    Graph.clusterKeepersFrom(clusters,
      base.select(col("doc_id"), quality.as("quality")))

  /** Restrict the corpus to (keep = true) or subtract (keep = false)
    * a `(doc_id, …)` selection — broadcast-friendly semi/anti join. */
  def minus(selection: DataFrame, keep: Boolean = false): Corpus =
    Corpus(docs.join(selection.select(col("doc_id")).distinct(),
      Seq("doc_id"), if (keep) "left_semi" else "left_anti"))

  /** Hand the relation to the verdict-composition builder. */
  def curate: Curate = Curate(docs)
}
