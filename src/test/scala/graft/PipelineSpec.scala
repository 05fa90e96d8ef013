package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Invariants for the training-data pipeline operators (dedup, similarity,
  * text analysis, multimodal). Exact values are gated by the DuckDB oracle;
  * these check the semantic contracts. */
class PipelineSpec extends SparkSpec {

  test("exact dedup partitions the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).count()
    val dd = Dedup.exactDedup(spark, sfDir)
    assert(dd.agg(sum($"n_copies")).as[Long].head() === docs)
    assert(dd.where($"n_copies" < 1).count() === 0)
  }

  test("ngram jaccard pairs are ordered, thresholded, and symmetric-free") {
    import spark.implicits._
    val p = Dedup.ngramJaccard(spark, sfDir).cache()
    assert(p.where($"doc_a" >= $"doc_b").count() === 0)
    assert(p.where($"jaccard" < 0.6 || $"jaccard" > 1.0).count() === 0)
    assert(p.count() > 0)
  }

  test("minhash-LSH finds the high-jaccard pairs (recall vs exact at 0.6)") {
    import spark.implicits._
    val exact = Dedup.ngramJaccard(spark, sfDir).select($"doc_a", $"doc_b")
    val lsh = Dedup.minhashLsh(spark, sfDir).select($"doc_a", $"doc_b")
    val missed = exact.except(lsh).count()
    val total = exact.count()
    // 4 bands x 3 rows: P[detect | jac .99] ~ 1; allow a small miss margin
    assert(missed <= total / 4, s"LSH missed $missed of $total exact pairs")
  }

  test("simhash is a 32-bit value and identical docs collide") {
    import spark.implicits._
    val sh = Dedup.simhash(spark, sfDir)
    assert(sh.where($"simhash" < 0 || $"simhash" > 4294967295L).count() === 0)
    assert(sh.count() === Tables.documents(spark, sfDir).count())
  }

  test("simhash pairs respect the hamming threshold") {
    import spark.implicits._
    val p = Dedup.simhashPairs(spark, sfDir)
    assert(p.where($"hamming" > 1 || $"hamming" < 0).count() === 0)
  }

  test("brute-force ANN returns dense ranks and no self-matches") {
    import spark.implicits._
    val r = Similarity.annBrute(spark, sfDir).cache()
    assert(r.count() === 50) // 10 queries x top-5
    assert(r.where($"query_id" === $"neighbor_id").count() === 0)
    val ranks = r.groupBy($"query_id").agg(collect_set($"rank").as("rs"))
      .where(size($"rs") =!= 5).count()
    assert(ranks === 0)
  }

  test("LSH ANN results are a subset of brute-force ordering per query") {
    import spark.implicits._
    // every LSH neighbor must rank correctly among LSH candidates; sanity:
    // ranks dense from 1, no self matches, queries < 10
    val r = Similarity.lshAnn(spark, sfDir).cache()
    assert(r.where($"query_id" === $"neighbor_id").count() === 0)
    assert(r.where($"rank" < 1 || $"rank" > 3).count() === 0)
    assert(r.where($"query_id" >= 10).count() === 0)
  }

  test("langid scores are non-negative and predicted is an argmax") {
    import spark.implicits._
    val l = TextAnalysis.langid(spark, sfDir).cache()
    assert(l.where($"score_en" < 0 || $"score_de" < 0 || $"score_fr" < 0 ||
      $"score_es" < 0).count() === 0)
    val best = greatest($"score_en", $"score_de", $"score_fr", $"score_es")
    val bad = l.where(
      (($"predicted" === "en") && $"score_en" =!= best) ||
      (($"predicted" === "de") && $"score_de" =!= best) ||
      (($"predicted" === "fr") && $"score_fr" =!= best) ||
      (($"predicted" === "es") && $"score_es" =!= best)).count()
    assert(bad === 0)
  }

  test("quality score is bounded [0,1] and ratios are sane") {
    import spark.implicits._
    val q = TextAnalysis.qualityScore(spark, sfDir)
    assert(q.where($"quality" < 0.0 || $"quality" > 1.0).count() === 0)
    assert(q.where($"stopword_ratio" < 0.0 || $"stopword_ratio" > 1.0).count() === 0)
  }

  test("token counts: subword estimate >= token count (each token >= 1 piece)") {
    import spark.implicits._
    val t = TextAnalysis.tokenCount(spark, sfDir)
    assert(t.where($"n_subwords" < $"n_tokens").count() === 0)
  }

  test("fingerprint is in [0, 2^31-1) and order-sensitive") {
    import spark.implicits._
    val f = TextAnalysis.fingerprint(spark, sfDir)
    assert(f.where($"fingerprint" < 0 || $"fingerprint" >= 2147483647L).count() === 0)
  }

  test("multimodal typed path agrees with a pure-SQL recomputation") {
    import spark.implicits._
    val typed = Multimodal.blobMeta(spark, sfDir)
    val sql = Tables.documents(spark, sfDir).select(
      $"doc_id",
      octet_length($"text".cast("binary")).cast("long").as("n_bytes2"),
      aggregate(transform(split(substring($"text", 1, 32), ""),
        c => when(length(c) > 0, ascii(c).cast("long")).otherwise(0L)),
        lit(0L), (a, x) => a + x).as("checksum2"))
    val joined = typed.join(sql, "doc_id")
    assert(joined.where($"n_bytes" =!= $"n_bytes2").count() === 0)
    assert(joined.where($"checksum32" =!= $"checksum2").count() === 0)
    assert(joined.where($"width" * $"height" > $"n_bytes").count() === 0)
  }

  test("cosine near-dup pairs are ordered and thresholded") {
    import spark.implicits._
    val p = Similarity.cosineNearDup(spark, sfDir)
    assert(p.where($"vec_a" >= $"vec_b").count() === 0)
    assert(p.where($"cos" < 0.4).count() === 0)
  }

  test("IVF ANN returns dense ranks <= 3, no self-matches") {
    import spark.implicits._
    val r = Similarity.ivfAnn(spark, sfDir)
    assert(r.where($"rank" > 3 || $"rank" < 1).count() === 0)
    assert(r.where($"query_id" === $"neighbor_id").count() === 0)
    // dense ranks per query: n rows for a query == its max rank
    val perQ = r.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"))
    assert(perQ.where($"n" =!= $"mx").count() === 0)
  }

  test("frame sample covers every 2nd 64-byte frame, sums match blob total") {
    import spark.implicits._
    val f = Multimodal.frameSample(spark, sfDir)
    assert(f.where($"frame_idx" % 2 =!= 0).count() === 0)
    assert(f.where($"frame_len" < 1 || $"frame_len" > 64).count() === 0)
    // a doc's sampled frames are a prefix-stride of its byte length
    val meta = Multimodal.blobMeta(spark, sfDir).select($"doc_id", $"n_bytes")
    val counts = f.groupBy($"doc_id").agg(count(lit(1)).as("n_frames"))
      .join(meta, "doc_id")
    assert(counts.where(
      $"n_frames" =!= ceil((ceil($"n_bytes" / 64.0) / 2.0))).count() === 0)
  }

  test("blob feature bins sum to the total byte sum") {
    import spark.implicits._
    val feats = Multimodal.blobFeatures(spark, sfDir)
      .withColumn("bin_total",
        $"f0" + $"f1" + $"f2" + $"f3" + $"f4" + $"f5" + $"f6" + $"f7")
    val totals = Tables.documents(spark, sfDir).select($"doc_id",
      aggregate(transform(split($"text", ""),
        c => when(length(c) > 0, ascii(c).cast("long")).otherwise(0L)),
        lit(0L), (a, x) => a + x).as("byte_total"))
    val j = feats.join(totals, "doc_id")
    assert(j.where($"bin_total" =!= $"byte_total").count() === 0)
  }
}
