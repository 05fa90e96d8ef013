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

  /** Distinct word n-gram shingles per document. Guarded so docs shorter
    * than n tokens yield an empty set (sequence() would otherwise produce
    * a descending range). */
  def shingles(text: Column, n: Int): Column = {
    val t = toks(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** (doc_id, shingle) long table — the base relation for all shingle
    * dedup operators. Distinct-per-doc by construction. */
  def shingled(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", explode(shingles($"text", n)).as("shingle"))
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
