package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Shared text primitives for the pipeline operators (dedup, similarity,
  * text analysis). Everything here is built from engine-portable
  * expressions — `md5`, substring compares, integer arithmetic — so each
  * operator has a bit-identical DuckDB oracle twin in SparkEntry.oracleSql.
  *
  * All expressions stay inside whole-stage codegen (no UDFs): tokenize /
  * shingle / hash are `split`/`transform`/`md5` Catalyst expressions.
  */
object TextOps {

  /** Whitespace tokens; matches DuckDB string_split(text, ' ') incl. empty
    * tokens on repeated spaces. */
  def toks(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of a token-array column — native
    * single-pass expression (graft.functions.TextHash). The interpreted
    * higher-order equivalent (transform+slice+concat_ws) re-evaluated its
    * argument once per shingle per row — measured 20-100x slower. */
  def shingles(tokens: Column, n: Int): Column =
    graft.functions.TextHash.shingles(tokens, n)

  /** Documents spread across all cores BEFORE tokenize/explode. The
    * shingle explode multiplies rows ~50x, so repartitioning the raw docs
    * moves 50x fewer bytes than repartitioning after — and a single-file
    * parquet scan would otherwise pin the whole dedup family to one task.
    * At cluster scale the scan has many splits and AQE coalesces the tiny
    * exchange away. */
  def docsParallel(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalance(spark, dir, "documents",
      Tables.documents(spark, dir), col("doc_id"))

  /** (doc_id, shingle) long table — the base relation for all shingle
    * dedup operators. Distinct-per-doc by construction. Tokenizes in its
    * own projection so the shingle lambda reads a materialized array. */
  def shingled(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    import spark.implicits._
    docsParallel(spark, dir)
      .select($"doc_id", toks($"text").as("toks"))
      .select($"doc_id", explode(shingles($"toks", n)).as("shingle"))
  }

  /** Per-doc distinct-shingle cardinality. */
  def shingleCard(sh: DataFrame): DataFrame = {
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
  }

  /** Exact Jaccard for candidate (doc_a, doc_b) pairs: |A∩B| via a
    * shingle-equality join, |A∪B| = na + nb - shared. The division is
    * long/long -> double in both engines, so the result is bit-identical
    * to the oracle. */
  def jaccardFor(cand: DataFrame, sh: DataFrame): DataFrame = {
    val card = shingleCard(sh)
    val shared = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(card.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(card.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        (col("n_shared") / (col("ca.n") + col("cb.n") - col("n_shared")))
          .as("jaccard"))
  }
}
