package graft

import org.apache.spark.sql.functions._

import graft.api.Corpus
import graft.operators.Dedup

/** The fluent Corpus surface must be a zero-cost veneer: every verb
  * returns exactly what the underlying oracle-gated core returns, and
  * the composed dedup pipeline produces a correctly-deduped corpus. */
class CorpusSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog at dawn"),
      (2L, "the quick brown fox jumps over the lazy dog at dawn"), // dup of 1
      (3L, "the quick brown fox jumps over the lazy dog at dusk"), // near-dup
      (4L, "completely different content about spark query engines here"),
      (5L, "completely different content about spark query engines here"), // dup of 4
      (6L, "an unrelated singleton document with its own words entirely"))
      .toDF("doc_id", "text")
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("verbs delegate to the gated cores verbatim") {
    val c = Corpus(docs)
    // the verb pins the public 4-column schema (n_a/n_b are a core-only
    // ride-along for q213) but must agree with the core row-for-row
    val direct = Dedup.ngramJaccardOn(
      docs.select(col("doc_id"), col("text")), 0.6)
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("jaccard"))
      .collect().toSet
    val verb = c.nearDupPairs(0.6)
    assert(verb.columns.toSeq ===
      Seq("doc_a", "doc_b", "n_shared", "jaccard"))
    assert(verb.collect().toSet === direct)
    assert(c.exactDupGroups().where(col("n_copies") > 1).count() === 2)
  }

  test("pairs -> clusters -> keepers -> minus composes to a deduped corpus") {
    val c = Corpus(docs)
    val pairs = c.nearDupPairs(0.6)
    val clusters = c.dupClusters(pairs)
    // 1,2,3 cluster together; 4,5 pair via exact-dup (jaccard 1.0); 6 alone
    val comp = clusters.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(comp(1L) === comp(2L) && comp(2L) === comp(3L))
    assert(comp(4L) === comp(5L))
    assert(comp(6L) != comp(1L) && comp(6L) != comp(4L))
    val verdicts = c.keepers(clusters)
    assert(verdicts.count() === 6) // every doc gets a verdict row
    val keepers = verdicts.where(col("is_keeper"))
    val clean = c.minus(keepers, keep = true)
    // one survivor per cluster: 3 clusters -> 3 docs
    assert(ids(clean.docs).size === 3)
    assert(ids(clean.docs).contains(6L))
    // and the complement drops exactly the survivors
    val dropped = c.minus(keepers, keep = false)
    assert(ids(dropped.docs) === ids(docs.toDF()) -- ids(clean.docs))
  }

  test("screenDelta admits novel docs and flags near-dups of the corpus") {
    import spark.implicits._
    val delta = Seq(
      (100L, "the quick brown fox jumps over the lazy dog at dawn"), // dup
      (101L, "totally novel text that matches nothing in the index today"))
      .toDF("doc_id", "text")
    val hits = Corpus(docs).screenDelta(delta)
    val flagged = hits.select("new_doc").collect().map(_.getLong(0)).toSet
    assert(flagged.contains(100L))
    assert(!flagged.contains(101L))
  }

  test("curate hands the same relation to the verdict builder") {
    val out = Corpus(docs).curate.tokenCount().result()
    assert(out.count() === 6)
    assert(out.columns.toSeq === Seq("doc_id", "n_tokens"))
  }
}
