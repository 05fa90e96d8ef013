package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}

/** Fluent embedding-collection surface — the vector-family twin of
  * [[Corpus]]: the audit/search/compression verbs a 100 TB vector store
  * runs, exposed over ONE `(vec_id, embedding, …)` relation so a user
  * composes
  *
  * {{{
  * val e = Embeddings(vecs)
  * val stats  = e.dimStats()            // per-dim mean/variance census
  * val bad    = e.outliers(50)          // corrupt-vector triage
  * val clean  = e.minus(bad)            // drop them before indexing
  * val nbrs   = Embeddings(clean).topkFor(queries, k = 5)
  * val packed = Embeddings(clean).quantized()  // int8 storage codes
  * }}}
  *
  * All verbs delegate to the oracle-gated cores (`Quantize.*On`,
  * `Similarity.bruteTopkOn`) — the fluent layer adds NO computation of
  * its own, so every plan here is exactly the plan the correctness gate
  * verified. Column contract: `vec_id` (long) and `embedding`
  * (array<float|double>) must exist; extra columns ride along where the
  * verb allows it. */
final case class Embeddings(vecs: DataFrame) {

  private def base: DataFrame = vecs.select(col("vec_id"), col("embedding"))

  /** Per-dimension mean/variance census with dead-dimension flags —
    * q224's audit (anisotropy triage before any cosine retrieval). */
  def dimStats(): DataFrame = Quantize.dimVarianceOn(base)

  /** Top-n diagonal-Mahalanobis outliers — q239's corrupt-embedding
    * triage (wrong model version, truncated buffers, all-zeros). */
  def outliers(n: Int = 20): DataFrame = Quantize.zOutliersOn(base, n)

  /** Exact cosine top-k neighbors of each `(query_id, qemb)` row against
    * this collection — q29's brute baseline; the query side broadcasts,
    * the collection streams (no shuffle of the big side). */
  def topkFor(queries: DataFrame, k: Int = 5): DataFrame =
    Similarity.bruteTopkOn(base, queries, k)

  /** Self-query convenience: the `whereQuery` rows of THIS collection
    * become the query side. */
  def topk(whereQuery: org.apache.spark.sql.Column, k: Int = 5): DataFrame =
    topkFor(base.where(whereQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb")), k)

  /** Per-vector int8 scalar quantization codes + reconstruction error —
    * q67's storage path. */
  def quantized(): DataFrame = Quantize.quantizeOn(base)

  /** Drop the vectors named by a `(… vec_id …)` relation (e.g. the
    * [[outliers]] output) — one shuffled anti-join on the id key. */
  def minus(flagged: DataFrame): DataFrame =
    vecs.join(flagged.select(col("vec_id")), Seq("vec_id"), "left_anti")

  /** SemDeDup over this collection (q94's gated core) with the codebook
    * size DERIVED from the collection: k = [[Embeddings.autoK]] ≈
    * max(8, N/4096), Lloyd-refined `lloydIters` rounds (≥ 1 by default
    * — the production path; the oracle query keeps its fixed k = 8,
    * iters = 0 pinning). The q94 scale argument is k ~ N/cell-budget:
    * expected cell size stays ~4096 as the corpus grows, so the
    * within-cell pair work Σcell² stays ~N·4096 instead of quadratic —
    * growing the corpus means growing k, not changing the plan. Costs
    * one count() job up front to size the codebook (a production run
    * knows its collection size; pass nothing else). */
  def semdedup(lloydIters: Int = 1): DataFrame =
    Similarity.semanticDedupVecs(base, Embeddings.autoK(base.count()),
      lloydIters)
}

object Embeddings {
  /** Codebook size for [[Embeddings.semdedup]]: k ≈ max(8, N/4096),
    * capped at 65536 — beyond that the literal-codebook assignment
    * (k codegen'd dots per row) should give way to a broadcast-join
    * assignment; the cap makes the boundary explicit rather than
    * letting plan size grow unbounded. */
  def autoK(n: Long): Int = math.min(math.max(8L, n / 4096L), 65536L).toInt
}
