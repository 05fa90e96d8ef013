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

  /** q58: benchmark-contamination screening — the eval-leakage check a
    * training corpus needs before a model trains on it. A held-out
    * "benchmark" partition (doc_id % 11 == 0 stands in for the eval set)
    * contributes its distinct shingles; every training doc is scored by
    * the fraction of its shingles that appear in the benchmark set. The
    * benchmark side is small by construction -> broadcast hash join; the
    * corpus side stays map-local, no corpus-wide shuffle before the
    * per-doc aggregation. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = TextOps.shingled(spark, dir, 3)
    val bench = sh.where($"doc_id" % 11 === 0)
      .select($"shingle").distinct()
    val train = sh.where($"doc_id" % 11 =!= 0)
    val shared = train.join(broadcast(bench), "shingle")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
    val card = TextOps.shingleCard(train).withColumnRenamed("n", "n_total")
    shared.join(card, "doc_id")
      .select($"doc_id", $"n_shared", $"n_total",
        ($"n_shared" / $"n_total").as("contamination"))
  }

  /** Near-dup pairs by word-3-gram Jaccard >= 0.6. One shingle-equality
    * self-join produces candidate pairs AND their intersection size in the
    * same pass (shingles are distinct per doc, so the per-pair match count
    * IS |A∩B|) — no candidate set is ever re-joined against the shingle
    * table, which at sf0.1 avoided a 58M-row intermediate. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = TextOps.shingled(spark, dir, 3)
    val shared = sh.as("a").join(sh.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    val card = TextOps.shingleCard(sh)
    shared
      .join(card.as("ca"), $"doc_a" === $"ca.doc_id")
      .join(card.as("cb"), $"doc_b" === $"cb.doc_id")
      .select($"doc_a", $"doc_b", $"n_shared",
        ($"n_shared" / ($"ca.n" + $"cb.n" - $"n_shared")).as("jaccard"))
      .where($"jaccard" >= 0.6)
  }

  /** MinHash + LSH banding: k=12 salted-md5 min-hashes per doc, 4 bands of
    * r=3; docs sharing any band signature are candidates, then verified
    * with exact Jaccard >= 0.5. The candidate set is sublinear in doc
    * pairs — this is the 100 TB-scale dedup path.
    *
    * The whole signature is one map-only projection (native
    * TextHash.minhash over the shingle set — no explode, no crossJoin
    * with seeds, no groupBy); the only shuffled relation is the tiny
    * (doc, band, sig) table, and the Jaccard verify touches shingle SETS
    * (array_intersect per candidate pair) rather than re-joining an
    * exploded shingle table. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docSh = TextOps.docsParallel(spark, dir)
      .select($"doc_id", TextOps.shingles(TextOps.toks($"text"), 3).as("sh"))
      .where(size($"sh") > 0)
    // band b = min-hashes [3b, 3b+3), joined ',' in seed order; the banded
    // relation stays narrow (doc_id, band, sig_band) through the shuffle
    val banded = docSh.select($"doc_id",
        posexplode(graft.functions.TextHash.minhashBands($"sh", 12, 3))
          .as(Seq("band", "sig_band")))
    val cand = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.sig_band" === $"b.sig_band" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    cand
      .join(docSh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(docSh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .withColumn("n_shared", size(array_intersect($"sh_a", $"sh_b")).cast("long"))
      .withColumn("jaccard",
        $"n_shared" / (size($"sh_a").cast("long") + size($"sh_b").cast("long") - $"n_shared"))
      .where($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /** 32-bit SimHash fingerprint per document, from term frequencies.
    * Bit j is set iff sum over tokens of tf * (+1 if hex digit j of
    * md5(token) >= '8' else -1) is positive — the hex-digit high bit is a
    * portable 1-bit projection both engines compute identically.
    *
    * One native single-pass expression per document (TextHash.simhash):
    * map-only, zero shuffle — the relational formulation (explode tokens
    * x 32 bits, two groupBys) shuffled ~1700 intermediate rows per doc. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TextOps.docsParallel(spark, dir)
      .select($"doc_id",
        graft.functions.TextHash.simhash(TextOps.toks($"text")).as("simhash"))
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
    // hamming filter BEFORE the dedup shuffle: the per-row filter is free
    // and cuts the distinct's input from all band collisions to the few
    // true near-dups (distinct∘filter == filter∘distinct here)
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.byte" === $"b.byte" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .where($"hamming" <= 1)
      .distinct()
  }
}
