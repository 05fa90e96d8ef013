package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deduplication operators for training-data pipelines, over the
  * `documents` table. Four families: exact (hash-group), n-gram Jaccard
  * (shingle blocking), MinHash+LSH (band blocking), SimHash (bit-band
  * blocking). All hashes derive from `md5` so the DuckDB oracle computes
  * the identical values; min-hash "permutations" are lexicographic minima
  * of seed-salted md5 — a valid min-wise family that needs no engine-
  * specific 64-bit hash.
  *
  * Scale notes (100 TB): every pairing step is blocked — by shared
  * shingle (q25), LSH band (q26), or simhash byte-band (q28) — so no
  * all-pairs product ever forms. Aggregations are partial map-side; the
  * shingle explode is the only row multiplier and is bounded by document
  * length. At petabyte scale the q25 shingle join is the one to replace
  * with q26's banding (same verify stage, sublinear candidate set).
  */
object Dedup {

  /** Exact dedup via content fingerprint (the hash-groupBy family):
    * one row per distinct text, keeper = lowest doc_id. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Near-dup pairs by word-3-gram Jaccard >= 0.6. Candidate generation is
    * a shingle-equality self-join (blocking on shared shingles), so only
    * docs sharing content ever meet. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = TextOps.shingled(spark, dir, 3)
    val cand = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    TextOps.jaccardFor(cand, sh).where($"jaccard" >= 0.6)
  }

  /** MinHash + LSH banding: k=12 salted-md5 min-hashes per doc, 4 bands of
    * r=3; docs sharing any band signature are candidates, then verified
    * with exact Jaccard >= 0.5. The candidate set is sublinear in doc
    * pairs — this is the 100 TB-scale dedup path. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = TextOps.shingled(spark, dir, 3)
    val seeds = spark.range(12).select($"id".cast("int").as("seed"))
    // min over shingles of md5(seed:shingle) == one min-hash per (doc, seed)
    val mh = sh.crossJoin(broadcast(seeds))
      .groupBy($"doc_id", $"seed")
      .agg(min(md5(concat($"seed".cast("string"), lit(":"), $"shingle"))).as("mh"))
    // band signature: the r=3 min-hashes of the band, in seed order
    val bands = mh
      .groupBy($"doc_id", expr("seed div 3").as("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct($"seed", $"mh"))), x => x.getField("mh")),
        ",").as("sig"))
    val cand = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.sig" === $"b.sig" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    TextOps.jaccardFor(cand, sh)
      .where($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** 32-bit SimHash fingerprint per document, from term frequencies.
    * Bit j is set iff sum over tokens of tf * (+1 if hex digit j of
    * md5(token) >= '8' else -1) is positive — the hex-digit high bit is a
    * portable 1-bit projection both engines compute identically. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tf = Tables.documents(spark, dir)
      .select($"doc_id", explode(TextOps.toks($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    tf.select($"doc_id", $"tf", $"tok", explode(sequence(lit(0), lit(31))).as("j"))
      .withColumn("contrib",
        $"tf" * when(expr("substring(md5(tok), j + 1, 1)") >= "8", 1L).otherwise(-1L))
      .groupBy($"doc_id", $"j").agg(sum($"contrib").as("s"))
      .groupBy($"doc_id")
      .agg(sum(when($"s" > 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(0L))
        .as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance <= 1, candidates blocked on
    * any equal 8-bit byte-band of the 32-bit fingerprint (a doc pair with
    * hamming <= 3 must agree on at least one of the 4 bytes — pigeonhole),
    * so the join never considers unrelated docs. The threshold is tight
    * because a 32-bit simhash over a small vocabulary saturates: at
    * hamming 6 nearly every doc pair qualifies (measured: 3M of 12.5M
    * possible pairs at sf0.1). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shash = simhash(spark, dir)
    val banded = shash.select($"doc_id", $"simhash",
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("byte",
        expr("(simhash div shiftleft(CAST(1 AS BIGINT), band * 8)) % 256"))
    val cand = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.byte" === $"b.byte" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"a.simhash".as("sh_a"),
        $"b.doc_id".as("doc_b"), $"b.simhash".as("sh_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .where($"hamming" <= 1)
      .select($"doc_a", $"doc_b", $"hamming")
  }
}
