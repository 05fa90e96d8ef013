package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic sampling / splitting / packing for training-data
  * pipelines.
  *
  * All randomness is content-hash-derived (md5 of a salt + stable id), not
  * `rand()`: the sample is reproducible across runs, stable under
  * repartitioning and resharding, and re-derivable row-by-row — the
  * properties a 100 TB corpus pipeline needs (a re-run after adding one
  * shard must not reshuffle every split assignment). Everything is a
  * map-only projection/filter: no shuffle, no state.
  *
  * (Beyond the reference's surface — the training-data mandate. The
  * reference's only sampling is its fixed first-1000-samples baseline,
  * `fdf/modules/usxr/_postprocess.py:11`.)
  */
object Sampling {

  /** Uniform-in-[0,1) hash of (salt, id): first 32 bits of md5, divided by
    * 2^32. md5+hex is bit-portable across engines (unlike rand or
    * xxhash64 seeds), so a DuckDB/Presto/Spark pipeline mix agrees on
    * every row's draw. */
  def hashUniform(salt: String, id: Column): Column =
    hash32(salt, id) / lit(4294967296.0)

  /** The raw 32-bit draw behind hashUniform, for integer uses (shard
    * assignment etc.) — ONE canonical implementation so the Scala and
    * oracle-SQL surfaces cannot silently diverge. The native
    * `graft_md5_int32` kernel is bit-identical to the former
    * conv(substring(md5(...), 1, 8), 16, 10) chain but skips its hex
    * round-trip and per-row BigInteger parse (~16 µs/row → ~0.3). */
  def hash32(salt: String, id: Column): Column =
    graft.functions.TextHash.md5Int32(
      concat(lit(salt + ":"), id.cast("string")))

  /** hash32 with a per-row salt (e.g. a sketch row index). */
  def hash32Col(salt: Column, id: Column): Column =
    graft.functions.TextHash.md5Int32(
      concat(salt, lit(":"), id.cast("string")))

  /** Keep each row with probability `rate(row)` — rate is a Column so
    * strata (language, source, quality band) can set their own rates. */
  def stratifiedSample(df: DataFrame, idCol: String, salt: String,
      rate: Column): DataFrame =
    df.where(hashUniform(salt, col(idCol)) < rate)

  /** Assign each row to a named split by cumulative threshold, e.g.
    * Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)). */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val u = hashUniform(salt, col(idCol))
    val assigned = splits.init.foldRight(lit(splits.last._1): Column) {
      case ((name, hi), elseCol) => when(u < hi, name).otherwise(elseCol)
    }
    df.withColumn("split", assigned)
  }

  /** q47: language-stratified corpus sampling — per-language keep rates
    * rebalance the en-heavy mix. */
  def langStratified(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rate = when($"lang" === "en", 0.9).when($"lang" === "de", 0.6)
      .when($"lang" === "es", 0.5).when($"lang" === "fr", 0.4)
      .when($"lang" === "zh", 0.3).otherwise(0.2)
    stratifiedSample(Tables.documents(spark, dir), "doc_id", "samp", rate)
      .select($"doc_id", $"lang", $"source")
  }

  /** q77: temperature-flattened language mixture (the mT5/XLM-R corpus
    * recipe): target share of language l is p_l ∝ (n_l / N)^(1/T) with
    * T = 2 (i.e. sqrt — flattens the en-heavy head, boosts the tail),
    * drawing a budget of N/2 documents, capped at rate 1. Rates become
    * integer thresholds on the canonical 32-bit content-hash draw, so the
    * sample is deterministic, reshard-stable, and engine-portable; the
    * +1/3 threshold offset absorbs the 1-ulp wobble of the 5-term
    * renormalization sum whose order neither engine pins.
    *
    * Two-phase scale shape: a |languages|-row stats agg broadcast back
    * onto the corpus; the corpus itself is filtered map-only — no
    * shuffle, no rand(). The corpus-wide totals (n_total, sum of weights)
    * are ONE-ROW aggregates cross-joined back as broadcasts — never a
    * single-partition global window, which would serialize on one task if
    * it ever saw a non-aggregated input. */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang")
    val byLang = docs.groupBy($"lang").agg(count(lit(1)).as("n_l"))
    val withW = byLang
      .crossJoin(broadcast(byLang.agg(sum($"n_l").as("n_total"))))
      .withColumn("w", sqrt($"n_l".cast("double") / $"n_total"))
    val thr = withW
      .crossJoin(broadcast(withW.agg(sum($"w").as("sw"))))
      .withColumn("rate",
        least(lit(1.0), $"w" / $"sw" * 0.5 * $"n_total" / $"n_l"))
      .withColumn("thr", floor($"rate" * 4294967296.0 + lit(1.0 / 3)).cast("long"))
      .select($"lang", $"thr")
    docs.join(broadcast(thr), "lang")
      .where(hash32("mix", $"doc_id") < $"thr")
      .select($"doc_id", $"lang")
  }

  /** q48: deterministic 80/10/10 train/val/test split. */
  def trainValTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hashSplit(Tables.documents(spark, dir), "doc_id", "split",
        Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
      .select($"doc_id", $"split")
  }

  /** q49: sequence packing ("concat then chunk"): docs are hashed into
    * independent pack shards, ordered within a shard, and assigned the
    * pack (context window) their running token offset lands in. The
    * window runs per shard — shard count scales with the cluster, no
    * global sort. Capacity 2048 whitespace tokens. */
  def seqPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id",
      size(split($"text", " ")).cast("long").as("n_tokens"),
      (hash32("pack", $"doc_id") % 8).as("shard"))
    val w = Window.partitionBy($"shard").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("start_tok", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("pack_id", floor($"start_tok" / 2048L))
      .select($"doc_id", $"shard", $"pack_id", $"n_tokens", $"start_tok")
  }

  /** q91: sliding-window chunking with stride — the context-window prep
    * step every embedding/pretraining pipeline runs (HF
    * `return_overflowing_tokens` semantics): windows of W = 64 tokens
    * at stride S = 48 (16-token overlap), chunk count
    * ceil(max(n - overlap, 1) / S) so every token is covered, the last
    * chunk may run short, and no chunk is fully contained in its
    * predecessor. Everything is integer arithmetic on token counts
    * plus an md5 content hash of each chunk, so the oracle agrees
    * bit-for-bit.
    *
    * Scale shape: map-only — tokenize, a bounded explode (fan-out
    * n/S per doc, proportional to output size), slice + hash per
    * chunk. No shuffle at all; at 100 TB this is embarrassingly
    * parallel and the output partitioning inherits the scan's. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toked = TextOps.docsParallel(spark, dir)
      .select($"doc_id", TextOps.toks($"text").as("toks"))
      .select($"doc_id", $"toks", size($"toks").cast("long").as("n_toks"))
    toked
      .select($"doc_id", $"toks", $"n_toks",
        explode(sequence(lit(0L),
          greatest(expr("(n_toks + 31) div 48"), lit(1L)) - 1L)).as("k"))
      .select($"doc_id", $"n_toks",
        ($"k" + 1L).as("chunk_id"),
        ($"k" * 48L + 1L).as("start_tok"),
        least(lit(64L), $"n_toks" - ($"k" * 48L)).as("n_chunk_toks"),
        md5(array_join(expr("slice(toks, CAST(k * 48 + 1 AS INT), 64)"),
          " ")).as("chunk_hash"))
  }

  /** q93: token-budget data selection — keep the highest-quality
    * documents until a token budget (here corpus_tokens/4) is spent:
    * the selection step of quality-threshold curation (CCNet buckets,
    * FineWeb-style filtering) done WITHOUT a global sort of the corpus.
    *
    * Two-phase: (1) a per-score token histogram — the score is q32's
    * quality quantized to a 1e-6 grid, so the histogram is BOUNDED at
    * 1,000,001 rows no matter the corpus size; (2) a cumulative sum
    * over that small relation (the one global window here runs on the
    * bounded histogram, NEVER the corpus — same invariant as
    * mixtureSample) picks the fully-kept score buckets and the single
    * boundary bucket, which then resolves per-doc by a window
    * partitioned on that one score value, ordered by doc_id. The
    * corpus itself is touched by broadcast joins and one boundary
    * window only. At extreme scale the boundary bucket is the only
    * skew point (all-tied scores); salt it or accept the one-bucket
    * sort — it holds a budget-bounded token mass by construction. */
  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = TextAnalysis.qualityScore(spark, dir)
      .select($"doc_id", $"n_tokens",
        floor($"quality" * 1e6 + lit(1.0 / 3)).cast("long").as("score_q"))
    val total = scored.agg(sum($"n_tokens").as("tot"))
    val h = scored.groupBy($"score_q").agg(sum($"n_tokens").as("tok_s"))
    // constant partition key documenting intent: the window runs on the
    // score-grid histogram (bounded 1e6+1 rows), so single-partition is
    // by design. (Spark 4.1 folds the constant away, so WindowExec still
    // logs its move-all-data warning — accurate and benign here.)
    val wH = Window.partitionBy(graft.functions.Win.bounded).orderBy($"score_q".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum_incl", sum($"tok_s").over(wH))
      .withColumn("cum_before", $"cum_incl" - $"tok_s")
      .crossJoin(broadcast(total))
      .withColumn("budget", expr("tot div 4"))
    val fullBuckets = cum.where($"cum_incl" <= $"budget").select($"score_q")
    val boundary = cum
      .where($"cum_incl" > $"budget" && $"cum_before" < $"budget")
      .select($"score_q", $"cum_before", $"budget")
    val wB = Window.partitionBy($"score_q").orderBy($"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = scored.join(broadcast(boundary), "score_q")
      .withColumn("doc_cum", sum($"n_tokens").over(wB))
      .where($"cum_before" + $"doc_cum" <= $"budget")
      .select($"doc_id", $"n_tokens", $"score_q")
    scored.join(broadcast(fullBuckets), "score_q")
      .select($"doc_id", $"n_tokens", $"score_q")
      .unionByName(keptBoundary)
  }

  /** q101: weighted sampling without replacement via priority sampling
    * (Duffield/Lund/Thorup): each doc draws priority u_i / w_i with
    * u_i the canonical 32-bit content-hash draw and w_i = n_chars; the
    * k = 100 SMALLEST priorities win, so inclusion probability is
    * proportional to document length — the "sample tokens, not docs"
    * correction every corpus subsampler needs. The draw is
    * deterministic and reshard-stable (no rand()); the priority is one
    * int/int division, which IEEE-rounds identically in every engine,
    * and ties break on doc_id. Output columns are all integers.
    *
    * Scale shape: map-only scoring + a global top-k that compiles to
    * TakeOrderedAndProject (per-partition k-heaps, k rows to the
    * driver-side merge) — no global sort, no shuffle of the corpus. */
  def prioritySample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars",
        hash32("prio", $"doc_id").as("draw"))
      .withColumn("priority", $"draw".cast("double") / $"n_chars")
      .orderBy($"priority".asc, $"doc_id".asc)
      .limit(100)
      .select($"doc_id", $"lang", $"n_chars", $"draw")
  }

  /** q54: deterministic k-per-group sampling — "3 random docs per source",
    * where random is the reproducible content-hash draw, realized as a
    * per-group top-k window (shuffles once on the group key; no rand()
    * and no global sort). */
  def perGroupSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val u = hashUniform("pick", $"doc_id")
    val w = Window.partitionBy($"source").orderBy(u.asc, $"doc_id".asc)
    Tables.documents(spark, dir)
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .select($"source", $"rk", $"doc_id")
  }

  /** q135: leakage-free temporal holdout — the leave-last-out protocol
    * of sequential/recommender training data: per user, the LAST event
    * (by ts, event_id tie-break) is `test`, the second-to-last is
    * `val`, everything earlier is `train`. Contrast with q48's hash
    * split: here the split axis is TIME WITHIN USER, so a model trained
    * on `train` never sees a user's future — the leakage a plain random
    * split silently commits on behavioral data.
    *
    * Output is the audit table a pipeline review reads: per (split,
    * event_type) the event count and distinct-user count — val/test
    * user counts must equal the eligible-user total, or the split is
    * broken.
    *
    * Scale shape: one window partitioned on `user_id` (the natural
    * high-cardinality key — parallelizes to any width), then a partial-
    * agged groupBy bounded by |splits|x|event types| = 15 rows. No
    * global sort, no skew (a user's event list is human-bounded). */
  def temporalSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rk", row_number().over(w))
      .withColumn("split",
        when($"rk" === 1, "test").when($"rk" === 2, "val").otherwise("train"))
      .groupBy($"split", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
  }

  /** q169: proportional budget allocation (Hamilton / largest-remainder
    * apportionment) — given a total sampling budget, how many documents
    * each source contributes so shares track corpus proportions
    * EXACTLY: base_i = (B·n_i) div N, and the Σbase shortfall goes to
    * the largest fractional remainders (ties by source name). The
    * integer-exact answer every mixture plan needs before q77-style
    * sampling executes it; Σ alloc = B by construction.
    *
    * Scale shape: one partial agg to |sources| rows; ranking and the
    * leftover broadcast run on that bounded relation — the corpus is
    * scanned once. */
  def budgetAllocation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val budget = 10000L
    val per = Tables.documents(spark, dir)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val withBase = per
      .crossJoin(broadcast(per.agg(sum($"n_docs").as("n_total"))))
      .withColumn("base", expr(s"($budget * n_docs) div n_total"))
      .withColumn("rem", expr(s"$budget * n_docs - base * n_total"))
    val leftover = withBase.agg((lit(budget) - sum($"base")).as("k"))
    withBase.crossJoin(broadcast(leftover))
      .withColumn("rk",
        // constant partition key: ranking runs on the bounded |sources|
        // relation (the q53 explicit-spec idiom)
        row_number().over(Window.partitionBy(graft.functions.Win.bounded)
          .orderBy($"rem".desc, $"source".asc)).cast("long"))
      .select($"source", $"n_docs", $"base",
        ($"base" + when($"rk" <= $"k", 1L).otherwise(0L)).as("alloc"))
  }

  /** Number of hash proposals q194 draws per customer. s = 16 buys
    * P(candidate owned or repeated for ALL 16 draws) ≈ (own-share)^16 —
    * vanishing for any customer owning < ~70% of the catalog — while
    * keeping per-customer work CONSTANT in catalog size. */
  val NegProposalsConf = "spark.graft.negsamp.proposals"

  /** q194: deterministic negative sampling — the contrastive-training
    * data generator over the customer→supplier purchase graph: for
    * each customer, suppliers they have NEVER bought from are
    * candidate negatives; two are drawn per customer by content-hash
    * order (md5 — the house derandomized draw), so resharding or
    * re-running never changes the training set. Output carries the
    * customer's positive count and the draw value for auditability.
    *
    * PROPOSAL-based (round 9; the standard word2vec/BPR shape): each
    * customer draws s = 16 pseudo-random catalog positions
    * (md5(cust:i) mod max-suppkey), rejects positions it owns with an
    * inline array_contains against its own owned-set, dedups repeated
    * positions, and keeps the first 2 surviving proposals in draw
    * order. Per-customer work is O(s) — INDEPENDENT of catalog size.
    * The previous exhaustive form ([[negativeSamplingExhaustive]],
    * kept for the parity spec) ranked every non-owned supplier per
    * customer: correct, and fast at sf0.1, but its candidate stream
    * is |cust|·|catalog| — at a 10⁶-item catalog the broadcast and
    * the rank-window input both blow up, the classic scale-killer
    * this variant removes.
    *
    * Scale shape: interactions collapse to ONE catalog-bounded
    * owned-set per customer (partial-agged collect_set); the s-way
    * proposal explode is born custkey-partitioned off that agg, the
    * draw/mod/membership steps are narrow, existence of the proposed
    * key is one equi-join against the supplier dimension (AQE
    * broadcasts it while it fits; unhinted, so a 10⁸-row catalog
    * falls back to a shuffle of the s·|cust| proposal stream, never
    * an OOM), and the dedup + top-2 windows run inside the custkey
    * clustering. A customer owning nearly the whole catalog can come
    * up short (< 2 negatives) — inherent to proposal sampling and
    * bounded by (n_pos/|catalog|)^s; the oracle computes the same
    * draws, so the gate still hashes identically. */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = spark.conf.getOption(NegProposalsConf).map(_.toInt).getOrElse(16)
    val owned = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("custkey"), $"l_suppkey".as("suppkey"))
      .groupBy($"custkey")
      .agg(collect_set($"suppkey").as("owned"))
      .select($"custkey", $"owned", size($"owned").cast("long").as("n_pos"))
    // draws map onto the [min, max] key envelope — dense-key catalogs
    // (TPC-H, whether 0- or 1-based) get full coverage; sparse ones
    // lose only the draws landing in holes (dropped by the existence
    // join below)
    val mx = Tables.supplier(spark, dir)
      .agg(min($"s_suppkey").as("minsk"), max($"s_suppkey").as("maxsk"))
    val prop = owned
      .select($"custkey", $"owned", $"n_pos",
        explode(sequence(lit(0L), lit(s - 1L))).as("i"))
      .withColumn("draw", hash32("negp",
        concat($"custkey".cast("string"), lit(":"), $"i".cast("string"))))
      .crossJoin(broadcast(mx))
      .withColumn("cand_sk",
        ($"draw" % ($"maxsk" - $"minsk" + 1L)) + $"minsk")
      .where(!array_contains($"owned", $"cand_sk"))
      // drop the owned array BEFORE the joins/windows (the q178 rule:
      // wide rows don't ride sorts)
      .select($"custkey", $"n_pos", $"cand_sk", $"draw")
    // a drawn position must name a REAL supplier (sparse key spaces);
    // dimension equi-join, deliberately unhinted (see Scaladoc)
    val cand = prop.join(Tables.supplier(spark, dir)
      .select($"s_suppkey".as("cand_sk")), "cand_sk")
    // both windows run inside one custkey clustering: dedup repeated
    // positions to their min draw, then rank survivors
    val wDedup = Window.partitionBy($"custkey", $"cand_sk").orderBy($"draw".asc)
    val wRank = Window.partitionBy($"custkey").orderBy($"draw".asc, $"cand_sk".asc)
    cand.withColumn("rn", row_number().over(wDedup))
      .where($"rn" === 1)
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .where($"rk" <= 2)
      .select($"custkey", $"n_pos", $"cand_sk".as("neg_suppkey"),
        $"rk", $"draw")
  }

  /** The pre-round-9 EXHAUSTIVE q194: rank every non-owned supplier per
    * customer by md5(cust:supp). Kept private for the parity spec and
    * the ScaleSmoke catalog axis — it is the O(|cust|·|catalog|)
    * baseline the proposal variant exists to beat. */
  private[graft] def negativeSamplingExhaustive(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val owned = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("custkey"), $"l_suppkey".as("suppkey"))
      .groupBy($"custkey")
      .agg(collect_set($"suppkey").as("owned"))
      .select($"custkey", $"owned", size($"owned").cast("long").as("n_pos"))
    val catalog = Tables.supplier(spark, dir)
      .select($"s_suppkey".as("suppkey"))
    val cand = owned.crossJoin(broadcast(catalog))
      .where(!array_contains($"owned", $"suppkey"))
      .select($"custkey", $"n_pos", $"suppkey")
      .withColumn("draw", hash32("neg",
        concat($"custkey".cast("string"), lit(":"),
          $"suppkey".cast("string"))))
    val w = Window.partitionBy($"custkey").orderBy($"draw".asc, $"suppkey".asc)
    cand.withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 2)
      .select($"custkey", $"n_pos", $"suppkey".as("neg_suppkey"),
        $"rk", $"draw")
  }

  /** q204: mixture reweighting from per-source excess surprisal — the
    * DoReMi-flavored loop (Xie et al. 2023) closed into one readout:
    * sources whose tokens are HARDER than the corpus average (positive
    * excess mean surprisal under the corpus unigram model, the q87
    * statistic aggregated per source) get up-weighted by
    * score_s = exp(excess_nats_s), and the next mixture is the
    * normalized score. Portability: the per-token ln terms are the q87
    * offset-quantized longs (exact under any shuffle order); the ONE
    * exp per source is quantized at 1e6 before normalization, so the
    * final weight is an integer ratio both engines agree on.
    *
    * Scale shape: the (token, count) vocab and its per-source split
    * partial-agg in one scan; everything after runs on |sources| rows. */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = graft.operators.TextOps.docsParallel(spark, dir)
      .select($"source", explode(graft.operators.TextOps.toks($"text")).as("tok"))
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("n_t"))
    val total = vocab.agg(sum($"n_t").as("n_total"))
    val tokenQ = floor(log($"n_total".cast("double") / $"n_t") * 10000
      + lit(1.0 / 3)).cast("long")
    val perSource = toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"), sum(tokenQ).as("surp_q"))
    val corpus = perSource.agg(sum($"n_tokens").as("n_all"),
      sum($"surp_q").as("surp_all"))
    val scored = perSource.crossJoin(broadcast(corpus))
      .withColumn("score_q", floor(exp(
        ($"surp_q".cast("double") / $"n_tokens".cast("double")
          - $"surp_all".cast("double") / $"n_all".cast("double"))
          / 10000.0) * 1e6 + lit(1.0 / 3)).cast("long"))
    val norm = scored.agg(sum($"score_q").as("score_sum"))
    scored.crossJoin(broadcast(norm))
      .select($"source", $"n_tokens",
        expr("surp_q div n_tokens").as("mean_surprisal_q"),
        $"score_q",
        expr("(score_q * 1000000) div score_sum").as("weight_ppm"))
  }

  /** q209: DSIR — Data Selection via Importance Resampling (Xie et
    * al., NeurIPS 2023): pick raw-pool documents whose hashed-n-gram
    * distribution looks like a TARGET corpus. Features are hashed
    * unigram buckets (B = 256, md5 mod B — the paper's hashed n-gram
    * space at n=1); both sides get +1 smoothing; each bucket carries
    * the log importance ratio λ_b = ln(p_target(b) / p_raw(b)), and a
    * document's log weight is Σ_tokens λ_bucket(tok). Top-50 raw docs
    * by (weight, doc_id) are the selection. The deterministic variant
    * of the paper's gumbel resampling: rank by the weight itself (the
    * house derandomization, as in q194/q101).
    *
    * Determinism across engines: λ_b quantizes ONE ln per bucket —
    * ln(A_b/D_b) with A_b = (c_t+1)·(N_raw+B), D_b = (c_raw+1)·
    * (N_target+B) exact longs (< 2^53 through sf10, so the quotient is
    * the same IEEE double everywhere; beyond that route the products
    * through decimal) — floored at 1e4 with the q87 +1/3 offset; doc
    * weights are then order-free long sums.
    *
    * Scale shape: one token-bucket pass (map-only md5+mod), TWO
    * bounded aggregates (256-row per-side bucket counts from one
    * conditional groupBy); λ is a 256-row broadcast joined into the
    * raw token stream, whose per-doc sum inherits the docsParallel
    * partitioning (no exchange); selection is TakeOrderedAndProject,
    * never a global sort. Target membership here is `source = 'src0'`
    * — a stand-in for the curated high-quality slice every DSIR run
    * designates. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val B = 256
    val toks = graft.operators.TextOps.docsParallel(spark, dir)
      .select($"doc_id", ($"source" === "src0").as("is_t"),
        explode(graft.operators.TextOps.toks($"text")).as("tok"))
      .withColumn("bucket", pmod(graft.functions.TextHash.md5Int32(
        concat(lit("dsir:"), $"tok")), lit(B.toLong)))
    val counts = toks.groupBy($"bucket")
      .agg(sum(when($"is_t", 1L).otherwise(0L)).as("ct"),
        sum(when(!$"is_t", 1L).otherwise(0L)).as("cr"))
    val totals = counts.agg(sum($"ct").as("nt"), sum($"cr").as("nr"))
    // λ per bucket; buckets unseen on either side still get smoothed
    // mass because the count relation is dense only in SEEN buckets —
    // unseen buckets never match a token, so their λ is irrelevant
    val lam = counts.crossJoin(broadcast(totals))
      .select($"bucket",
        floor(log((($"ct" + 1L) * ($"nr" + B)).cast("double")
          / (($"cr" + 1L) * ($"nt" + B)).cast("double")) * 10000
          + lit(1.0 / 3)).cast("long").as("lam_q"))
    val perDoc = toks.where(!$"is_t")
      .join(broadcast(lam), "bucket")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_toks"), sum($"lam_q").as("w_q"))
    // distributed top-k (TakeOrderedAndProject) FIRST; the rank window
    // then sorts 50 rows, not the corpus
    perDoc.orderBy($"w_q".desc, $"doc_id".asc).limit(50)
      .withColumn("rk", row_number().over(
        Window.partitionBy(graft.functions.Win.bounded).orderBy($"w_q".desc, $"doc_id".asc)).cast("long"))
      .select($"rk", $"doc_id", $"n_toks", $"w_q")
  }

  /** q212: truncation-waste table — for each candidate context length
    * L, how many documents overflow it and how many tokens the
    * truncation throws away (Σ max(0, n_toks − L)), as an absolute
    * count and ppm of the corpus token mass. The companion to q205's
    * packing audit: packing answers "how full are my sequences",
    * this answers "what does capping L cost" — the two tables a
    * pretraining config reads together. Ls chosen to straddle this
    * corpus's 10-99-token range.
    *
    * Scale shape: q210's one-row-census shape — a single map-side scan
    * feeds one conditional aggregation (every L is a pair of
    * conditional sums in the SAME agg), exploded into the 4-row report
    * from struct literals; no shuffle carries a document, no window. */
  def truncationWaste(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Ls = Seq(16L, 32L, 64L, 96L)
    val d = graft.operators.TextOps.docsParallel(spark, dir)
      .select(size(graft.operators.TextOps.toks($"text")).cast("long").as("n"))
    val aggs = count(lit(1)).as("n_docs") +: sum($"n").as("total_toks") +:
      Ls.flatMap { l =>
        Seq(sum(when($"n" > l, 1L).otherwise(0L)).as(s"over_$l"),
          sum(when($"n" > l, $"n" - l).otherwise(0L)).as(s"lost_$l"))
      }
    val one = d.agg(aggs.head, aggs.tail: _*)
    val rows = Ls.map { l =>
      struct(lit(l).as("max_len"), col(s"over_$l").as("n_docs_over"),
        col(s"lost_$l").as("tokens_lost"),
        expr(s"(lost_$l * 1000000) div total_toks").as("lost_ppm"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select($"r.max_len", $"r.n_docs_over", $"r.tokens_lost", $"r.lost_ppm")
  }

  /** q205: packing-efficiency audit of q49's sequence packer — per
    * 2048-token pack, the filled token count, binned into a bounded
    * fill histogram (buckets of 6.25% each, bucket = (n_toks*16) div
    * 2048 capped at 16, so 17 possible values 0..16; straddling docs
    * can push a pack past 100%, folded into bucket 16): the table a
    * pretraining pipeline reads to decide whether its packing strategy
    * wastes context budget. All counts exact integers off the same
    * hash-sharded pack assignment (no global sort — the q49 shape).
    *
    * Scale shape: the pack relation partial-aggs per (shard, pack) and
    * then to ≤16 histogram rows; nothing data-sized after the scan. */
  def packEfficiency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val packs = seqPack(spark, dir)
      .groupBy($"shard", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_toks"))
    packs
      .withColumn("bucket",
        least(expr("(n_toks * 16) div 2048"), lit(16L)))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_packs"), sum($"n_docs").as("n_docs"),
        sum($"n_toks").as("n_tokens"))
      .withColumn("mean_fill_ppm",
        expr("(n_tokens * 1000000) div (n_packs * 2048)"))
  }

  /** q215: UniMax language-budget allocation (Chung et al. 2023) —
    * spread a token budget as uniformly as possible across languages,
    * but cap every language at E epochs of its natural size so
    * low-resource languages are never over-repeated. The published
    * answer to "what sampling ratios for a multilingual corpus";
    * q204 weights sources by informativeness, this allocates by the
    * epoch-capped waterfill. Budget B = the corpus's own token count;
    * cap_l = ⌊6·n_l/5⌋ (E = 1.2 epochs — tight enough that small
    * languages saturate on this corpus and the head language absorbs
    * the surplus).
    *
    * Waterfill in closed form, no iteration: sort languages by cap
    * ascending; language i (1-based, N langs, cumsum c_i) is saturated
    * iff cap_i·(N−i) ≤ B−c_i — the test is prefix-monotone, so the
    * saturated set is the first k rows and the shared water level is
    * ⌊(B−c_k)/(N−k)⌋. All integer arithmetic (caps are token counts,
    * the level is one integer division), so the gate hashes exactly.
    *
    * Scale shape: the only corpus-sized work is the per-language token
    * count (one partial-agged shuffle); the waterfill itself runs on
    * the |languages|-row relation — windows and one-row broadcasts on
    * a bounded table, exactly where driver-free closed-form beats an
    * iterative allocator. */
  def unimaxAlloc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val caps = graft.operators.TextOps.docsParallel(spark, dir)
      .select($"lang",
        size(graft.operators.TextOps.toks($"text")).cast("long").as("n"))
      .groupBy($"lang").agg(sum($"n").as("n_toks"))
      .withColumn("cap", expr("(n_toks * 6) div 5"))
    val tot = caps.agg(sum($"n_toks").as("b"), count(lit(1)).as("nl"))
    val ord = Window.partitionBy(graft.functions.Win.bounded).orderBy($"cap".asc, $"lang".asc)
    val ranked = caps.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("c", sum($"cap").over(
        ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("sat",
        when($"cap" * ($"nl" - $"i") <= $"b" - $"c", 1L).otherwise(0L))
    val water = ranked.agg(
      max(when($"sat" === 1L, $"i").otherwise(0L)).as("k"),
      max(when($"sat" === 1L, $"c").otherwise(0L)).as("ck"))
    ranked.crossJoin(broadcast(water))
      .withColumn("alloc_toks",
        when($"sat" === 1L, $"cap")
          .otherwise(expr("(b - ck) div (nl - k)")))
      .select($"lang", $"n_toks", $"cap".as("cap_toks"), $"sat".as("saturated"),
        $"alloc_toks",
        expr("(alloc_toks * 1000000) div n_toks").as("epochs_ppm"))
  }

  /** q217: pack-order bias audit — is the hash-shuffled training
    * stream actually IID with respect to source? Order the corpus by
    * a salted content hash (the exact order q48/q49's sharding
    * induces) and census adjacent-position source agreement against
    * the closed-form expectation under exchangeability
    * ((n_s−1)/(N−1) for pairs whose left element is source s). A
    * stream whose same-source rate beats expectation leaks curriculum
    * structure into every batch; the audit is the cheap proof it
    * doesn't. All integer: counts and two ppm divisions.
    *
    * Scale shape: the q178 two-phase segmented global rank — rank
    * within 16 hash-prefix segments, add broadcast segment offsets,
    * then the adjacent pair is an equi-join on rn+1 (co-partitioned
    * shuffle), NOT a single-partition global window. The census
    * partial-aggs to |sources| rows. */
  def orderBias(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        md5(concat(lit("ob"), $"doc_id".cast("string"))).as("h"))
    val wSeg = Window.partitionBy($"seg").orderBy($"h".asc, $"doc_id".asc)
    val ranked = keys.withColumn("seg", substring($"h", 1, 1))
      .withColumn("rn_seg", row_number().over(wSeg).cast("long"))
    val wOff = Window.partitionBy(graft.functions.Win.bounded).orderBy($"seg".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranked.groupBy($"seg").agg(count(lit(1)).as("cnt"))
      .select($"seg", coalesce(sum($"cnt").over(wOff), lit(0L)).as("off"))
    val rr = ranked.join(broadcast(offs), "seg")
      .select($"doc_id", $"source", ($"rn_seg" + $"off").as("rn"))
    val pairs = rr.as("a")
      .join(rr.as("b"), col("b.rn") === col("a.rn") + 1L)
      .select(col("a.source").as("source"),
        when(col("a.source") === col("b.source"), 1L).otherwise(0L)
          .as("same"))
    val counts = Tables.documents(spark, dir)
      .groupBy($"source").agg(count(lit(1)).as("n_s"))
    val total = counts.agg(sum($"n_s").as("n"))
    pairs.groupBy($"source")
      .agg(count(lit(1)).as("n_prev"), sum($"same").as("n_same"))
      .join(counts, "source")
      .crossJoin(broadcast(total))
      .select($"source", $"n_s", $"n_prev", $"n_same",
        expr("(n_same * 1000000) div n_prev").as("same_ppm"),
        expr("((n_s - 1) * 1000000) div (n - 1)").as("exp_ppm"))
  }

  /** q236: split-balance audit — the χ² independence statistic of
    * language × train/val/test assignment under the deterministic hash
    * split (hash32 mod 10 → 8/1/1). A content-correlated split (the
    * classic "split by crawl date" mistake) shows up here as a large χ²
    * long before a model trains; the hash split's χ² should sit near the
    * (|langs|−1)(3−1) degrees-of-freedom mean. Per-cell output keeps the
    * offender visible (WHICH language leaked into val), with the total
    * as a window sum over the bounded cell table.
    *
    * Exactness: observed·n and the marginal product are exact longs; the
    * squared deviation runs in decimal(38,0) (d² reaches 1e36 at 1e9
    * docs); each cell's ONE division runs in double, floored to micro —
    * the identical op order on both engines makes the doubles equal
    * bit-for-bit.
    *
    * Scale shape: one corpus scan partial-aggs to ≤|langs|·3 cells;
    * marginals are windows over that bounded relation. No joins, no
    * second scan. */
  def splitBalance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val h = hash32("split", $"doc_id") % 10L
    val cell = Tables.documents(spark, dir)
      .select($"lang",
        when(h <= 7L, "train").when(h === 8L, "val")
          .otherwise("test").as("split"))
      .groupBy($"lang", $"split").agg(count(lit(1)).as("o"))
    val wAll = Window.partitionBy(graft.functions.Win.bounded).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    cell
      .withColumn("n_lang", sum($"o").over(Window.partitionBy($"lang")))
      .withColumn("n_split", sum($"o").over(Window.partitionBy($"split")))
      .withColumn("n", sum($"o").over(wAll))
      .withColumn("d", $"o" * $"n" - $"n_lang" * $"n_split")
      .withColumn("contrib_micro",
        floor(($"d".cast(dec) * $"d").cast("double") * 1e6
          / ($"n".cast(dec) * $"n_lang" * $"n_split").cast("double"))
          .cast("long"))
      .withColumn("chi2_micro", sum($"contrib_micro").over(wAll))
      .select($"lang", $"split", $"o",
        // double, not long·1000: the marginal product already brushes
        // int64 range at 1e9 docs; both engines share the op order
        floor(($"n_lang".cast(dec) * $"n_split").cast("double") * 1000d
          / $"n".cast("double")).cast("long").as("exp_milli"),
        $"contrib_micro", $"chi2_micro")
  }

  /** q248: Neyman-optimal stratified allocation — for a fixed labeling /
    * eval budget of 10,000 docs, how many to draw from each source?
    * Proportional allocation n_h ∝ N_h wastes budget on strata whose
    * doc-length variance is tiny; Neyman 1934's n_h ∝ N_h·σ_h minimizes
    * the estimator variance, and the (Σ N_h σ_h)² / (N · Σ N_h σ_h²)
    * ratio (≤ 1) is the design-effect gain a sampling plan reports to
    * justify itself. The audit a quality-annotation campaign runs before
    * spending its budget.
    *
    * Exactness: per-stratum variance numerator V_h = N_h·Σx² − (Σx)² in
    * decimal(38,0) (exact at any corpus size); σ_h quantized to milli via
    * one sqrt on a correctly-rounded double quotient (sqrt and / are
    * IEEE exact-rounded, so both engines agree bit-for-bit); allocations
    * are pure long arithmetic on the milli grid from there.
    *
    * Scale shape: one partial-agged scan to |sources| rows; the
    * allocation totals are windows over that bounded relation. */
  def neymanAlloc(spark: SparkSession, dir: String): DataFrame =
    neymanAllocOn(Tables.documents(spark, dir))

  /** Testable core over any `(source, n_chars)` relation. */
  private[graft] def neymanAllocOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val wAll = Window.partitionBy(graft.functions.Win.bounded).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val strata = docs
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars".cast(dec)).as("sx"),
        sum($"n_chars".cast(dec) * $"n_chars").as("sxx"))
      .withColumn("vnum", ($"n_docs".cast(dec) * $"sxx"
        - $"sx" * $"sx").cast("double"))
      .withColumn("sd_milli",
        floor(sqrt($"vnum" / ($"n_docs".cast("double") * $"n_docs"))
          * 1000d + lit(1.0 / 3)).cast("long"))
      // w = N_h·σ_h in decimal(38,0): at 1e9 docs × σ~1e6 milli the
      // long product wraps silently while the oracle's HUGEINT stays
      // exact — route w (and the 10000·w numerator below, which rides
      // this type) through decimal like sx/sxx/b already do
      .withColumn("w", $"n_docs".cast(dec) * $"sd_milli")
    strata
      .withColumn("t", sum($"w").over(wAll))
      .withColumn("n_total", sum($"n_docs").over(wAll))
      .withColumn("b", sum($"n_docs".cast(dec)
        * $"sd_milli" * $"sd_milli").over(wAll))
      .select($"source", $"n_docs", $"sd_milli",
        expr("(10000 * w) div t").as("alloc_neyman"),
        expr("(10000 * n_docs) div n_total").as("alloc_prop"),
        // variance ratio Neyman/proportional (≤ 1e6 ppm); milli scales
        // cancel between T² and N·B
        floor(($"t".cast(dec) * $"t").cast("double") * 1e6
          / ($"n_total".cast("double") * $"b".cast("double"))
          + lit(1.0 / 3)).cast("long").as("deff_ppm"))
  }

  /** q255: cluster-aware train/val/test split — the leakage-FREE
    * assignment, next to the naive one, with the leakage measured. A
    * per-document hash split (q236's) puts ~32% of near-duplicate pairs
    * across split boundaries (2·0.8·0.2 + 2·0.1·0.9-ish for 80/10/10) —
    * the test set then contains near-copies of training documents and
    * every eval number is inflated (q190 detects this AFTER the fact;
    * this op prevents it). The fix is standard: hash the q62 CLUSTER id,
    * not the doc id, so a whole near-dup family lands in one split —
    * cross-split pair count drops to structurally zero because every
    * near-dup pair is within-cluster by CC construction.
    *
    * Output: one row per scheme (naive, cluster) with split sizes, the
    * straddling pair count, and its ppm share — the before/after a split
    * policy review reads.
    *
    * Scale shape: rides the q62 CC labeling (the one fixpoint); both
    * assignments are map-side hashes, sizes are one conditional agg,
    * leakage is the pair relation joined co-partitioned to the two
    * endpoint assignments. Output: 2 rows. */
  /** q288: Poisson-bootstrap confidence interval for per-source mean
    * document length — the distributed bootstrap (Chamandy et al. 2012,
    * Google's "Estimating Uncertainty for Massive Data Streams"
    * formulation): classic resampling needs n draws WITH replacement
    * per replicate (a shuffle per replicate at scale); the Poisson
    * bootstrap instead mints each row's B = 200 replicate
    * multiplicities LOCALLY (w ~ Poisson(1), here from the row's md5
    * stream — deterministic, reshard-stable, the Sampling discipline),
    * so the whole thing is one map-side weight fan-out + one partial
    * agg to the |sources|·B grid. This is the error bar every other
    * per-source point estimate in the suite (means, rates, drifts)
    * should be read against.
    *
    * The draw truncates the Poisson tail at w = 5 (P ≈ 6·10⁻⁴ lumped
    * into 5 — bias far below the CI's own Monte-Carlo noise at
    * B = 200); the interval is the (5th smallest, 5th largest)
    * replicate-mean order statistics = a 95% percentile bootstrap on
    * the exact ppm grid (0.025·B = 5), replicate index as tie-break.
    * All arithmetic is exact integers: weighted sums of longs, one
    * trunc-div per replicate, order statistics.
    *
    * Scale shape: one corpus scan with a 200-way in-row fan-out
    * absorbed by the map-side partial agg (no 200x shuffle rows reach
    * the reducer beyond the |sources|·B grid); bounded 200-row
    * per-source windows for the order statistics. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val reps = 200L
    // cumulative Poisson(1) on the 1e6 grid: floor(CDF(k)·1e6)
    val cum = Seq(367879L, 735758L, 919698L, 981011L, 996340L)
    val docs = Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"n_chars")
    val rows = docs
      .withColumn("b", explode(typedLit((0L until reps).toSeq)))
      .withColumn("u",
        conv(substring(md5(concat($"doc_id", lit(":"), $"b")), 1, 15), 16, 10)
          .cast("long") % 1000000L)
      .withColumn("w",
        when($"u" < cum(0), 0L).when($"u" < cum(1), 1L)
          .when($"u" < cum(2), 2L).when($"u" < cum(3), 3L)
          .when($"u" < cum(4), 4L).otherwise(5L))
    val means = rows.groupBy($"source", $"b")
      .agg(sum($"w" * $"n_chars").as("sx"), sum($"w").as("sw"))
      .where($"sw" > 0L)
      .select($"source", $"b",
        // decimal-routed like the oracle's HUGEINT: sx*1e6 wraps a long
        // past ~9.2e12 weighted chars per (source, replicate)
        expr("(cast(sx as decimal(38,0)) * 1000000) div sw").as("m_ppm"))
    val wAsc = Window.partitionBy($"source").orderBy($"m_ppm".asc, $"b".asc)
    val wDesc = Window.partitionBy($"source").orderBy($"m_ppm".desc, $"b".desc)
    val ci = means
      .withColumn("ra", row_number().over(wAsc))
      .withColumn("rd", row_number().over(wDesc))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_reps"),
        max(when($"ra" === 5, $"m_ppm")).as("lo_ppm"),
        max(when($"rd" === 5, $"m_ppm")).as("hi_ppm"))
    val point = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sx"))
      .select($"source", $"n_docs",
        expr("(cast(sx as decimal(38,0)) * 1000000) div n_docs").as("mean_ppm"))
    point.join(ci, Seq("source"))
      .select($"source", $"n_docs", $"mean_ppm", $"n_reps",
        $"lo_ppm", $"hi_ppm")
  }

  def clusterSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Ckpt(Dedup.simhashPairs(spark, dir)
      .select($"doc_a", $"doc_b"), eager = false)
    val lbl = Graph.dupClustersFrom(pairs,
      TextOps.docsParallel(spark, dir).select($"doc_id"))
    def splitOf(h: Column): Column =
      when(h <= 7L, "train").when(h === 8L, "val").otherwise("test")
    val assign = Ckpt(lbl.select($"doc_id",
      splitOf(hash32("split", $"doc_id") % 10L).as("naive"),
      splitOf(hash32("csplit", $"cluster_id") % 10L).as("clus")),
      eager = false)
    val sizes = assign
      .select(expr("stack(2, 'naive', naive, 'cluster', clus)")
        .as(Seq("scheme", "split")))
      .groupBy($"scheme")
      .agg(sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when($"split" === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when($"split" === "test", 1L).otherwise(0L)).as("n_test"))
    val pj = pairs
      .join(assign.select($"doc_id".as("doc_a"),
        $"naive".as("na"), $"clus".as("ca")), "doc_a")
      .join(assign.select($"doc_id".as("doc_b"),
        $"naive".as("nb"), $"clus".as("cb")), "doc_b")
    val cross = pj.agg(
        sum(when($"na" =!= $"nb", 1L).otherwise(0L)).as("ncross"),
        sum(when($"ca" =!= $"cb", 1L).otherwise(0L)).as("ccross"),
        count(lit(1)).as("np"))
      .select(expr("stack(2, 'naive', ncross, 'cluster', ccross)")
        .as(Seq("scheme", "cross_pairs")), $"np")
    sizes.join(broadcast(cross), "scheme")
      .select($"scheme", $"n_train", $"n_val", $"n_test", $"cross_pairs",
        when($"np" > 0L, expr("(cross_pairs * 1000000) div np"))
          .otherwise(0L).as("leak_ppm"))
  }
}
