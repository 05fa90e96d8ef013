package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation operators a training-data pipeline runs between dedup
  * and packing: PII masking, boilerplate/repetition scoring (the Gopher
  * repetition filters), and URL canonicalization for source-level dedup.
  * All pure Catalyst expressions — regex and array ops stay map-side, the
  * only shuffles are the per-doc aggregations that need them.
  *
  * The synthetic `documents` corpus contains no contact strings or URLs,
  * so q64/q66 first weave deterministic ones from existing columns
  * (doc_id, source, lang) — the MASKING/CANONICALIZATION machinery is the
  * operator under test, and the DuckDB oracle builds the identical input
  * from the same columns.
  */
object Curation {

  /** q64: PII masking — count and redact email addresses and phone
    * numbers. Patterns are in the RE2 ⋂ java.util.regex common subset so
    * the oracle's regex engine agrees: character classes, +, bounded
    * repeats; no lookaround, no backrefs. At scale this is a map-only
    * projection (regexp_count/regexp_replace are codegen'd). */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val email = "[a-z0-9]+@[a-z][a-z.]*[a-z]"
    val phone = "\\+1-555-[0-9]{4}"
    val aug = concat($"text",
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@mail.example or +1-555-"),
      lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
    TextOps.docsParallel(spark, dir)
      .select($"doc_id", aug.as("aug"))
      .select(
        $"doc_id",
        regexp_count($"aug", lit(email)).cast("long").as("n_emails"),
        regexp_count($"aug", lit(phone)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace($"aug", email, "<EMAIL>"),
          phone, "<PHONE>")).as("redacted_md5"),
        length(regexp_replace(regexp_replace($"aug", email, "<EMAIL>"),
          phone, "<PHONE>")).cast("long").as("redacted_len"))
  }

  /** q65: repetition/boilerplate scoring (the Gopher-style filters):
    * fraction of bigram occurrences taken by the single most frequent
    * bigram, and fraction of 3-gram occurrences that are repeats of an
    * earlier 3-gram. Bigram counting is the one shuffle (explode +
    * two-level agg, partial map-side); the 3-gram dup fraction needs no
    * shuffle at all — TextHash.shingles is distinct-per-doc by
    * construction, so distinct/total falls out of two array lengths. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = TextOps.docsParallel(spark, dir)
      .select($"doc_id", TextOps.toks($"text").as("t"))
      .where(size($"t") >= 3)
    val n = size($"t")
    // consecutive pairs via a shifted zip; zip_with pads the shorter side
    // with null, so cut both slices to exactly n-1 elements
    val bigrams = zip_with(
      slice($"t", lit(1), n - 1), slice($"t", lit(2), n - 1),
      (a, b) => concat_ws(" ", a, b))
    // the trigram stats are per-row map-only values — ride them through
    // the bigram aggregation (min() of a per-doc constant) instead of a
    // second documents scan + join
    docs
      .select($"doc_id", explode(bigrams).as("bigram"),
        (n - 2).cast("long").as("n_tri"),
        size(TextOps.shingles($"t", 3)).cast("long").as("n_tri_d"))
      .groupBy($"doc_id", $"bigram")
      .agg(count(lit(1)).as("c"), min($"n_tri").as("n_tri"), min($"n_tri_d").as("n_tri_d"))
      .groupBy($"doc_id").agg(
        sum($"c").as("n_bigrams"),
        max($"c").as("top_bigram_n"),
        min($"n_tri").as("n_trigrams"),
        min($"n_tri_d").as("n_trigrams_distinct"))
      .select($"doc_id", $"n_bigrams", $"top_bigram_n",
        ($"top_bigram_n" / $"n_bigrams").as("top_bigram_frac"),
        $"n_trigrams", $"n_trigrams_distinct",
        (lit(1.0) - $"n_trigrams_distinct" / $"n_trigrams").as("dup_trigram_frac"))
  }

  /** q66: URL canonicalization + dedup — lowercase, strip scheme and
    * leading `www.`, drop the query string, drop one trailing slash, then
    * group identical canonical URLs (keeper = min doc_id). The canonical
    * form is a map-side projection; the dedup is one partial-aggregated
    * shuffle on the canonical string. */
  def urlCanon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // deterministic synthetic URL with case noise, an optional query
    // string, and an optional trailing slash, all keyed off doc_id
    val url = concat(
      when($"doc_id" % 3 === 0, "HTTPS://WWW.").otherwise("https://www."),
      $"source", lit(".example.com/"), $"lang",
      lit("/item"), ($"doc_id" % 50).cast("string"),
      when($"doc_id" % 2 === 0,
        concat(lit("/?utm_source=feed&ref="), $"doc_id".cast("string")))
        .otherwise(lit("")))
    val canon =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(url), "^https?://", ""),
            "^www\\.", ""),
          "\\?.*$", ""),
        "/$", "")
    TextOps.docsParallel(spark, dir)
      .select($"doc_id", canon.as("canon_url"))
      .groupBy($"canon_url")
      .agg(count(lit(1)).as("n_urls"), min($"doc_id").as("keep_id"))
  }

  /** q84: boilerplate-line detection — the C4/RefinedWeb cleaning step
    * that drops lines repeated across many documents (nav bars, cookie
    * banners, "all rights reserved"). A line is boilerplate when it
    * appears in >= 5% of the corpus; each document reports its line
    * count, boilerplate count/fraction, and a keep verdict.
    *
    * The corpus has no line structure, so (q64-style) deterministic
    * boilerplate suffixes are woven onto `' | '`-separated lines keyed
    * off doc_id; the oracle builds the identical input. The DETECTION
    * machinery is the operator: lines keyed by md5 (join keys stay 32
    * bytes however long the line), line-df via two-phase distinct agg,
    * the corpus size a one-row broadcast, verdicts map-side. Shuffles:
    * by line-hash (df + rejoin) and by doc (final agg) — both carry
    * hashes, never text. */
  def boilerplate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val aug = concat($"text",
      when($"doc_id" % 3 === 0,
        lit(" | subscribe to our newsletter for daily updates")).otherwise(lit("")),
      when($"doc_id" % 7 === 0,
        lit(" | all rights reserved contact us for details")).otherwise(lit("")))
    val lines = TextOps.docsParallel(spark, dir)
      .select($"doc_id", explode(split(aug, " \\| ")).as("line"))
      .select($"doc_id", md5($"line").as("lh"))
    val lineDf = lines.groupBy($"lh")
      .agg(countDistinct($"doc_id").as("line_df"))
    val total = TextOps.docsParallel(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    lines.join(lineDf, "lh")
      .crossJoin(broadcast(total))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when($"line_df" >= $"n_docs" * 0.05, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac", $"n_boiler" / $"n_lines")
      .withColumn("kept", $"boiler_frac" <= 0.5)
  }

  /** q82: the end-to-end curation decision — language-ID, quality
    * scoring, and exact-dedup keeper selection composed into ONE
    * declarative plan, the per-document verdict a real preprocessing
    * pipeline materializes before sampling/packing.
    *
    * Scale shape: all text-derived columns (trigram scores, token stats,
    * content fingerprint) are computed in a single map-side projection
    * over ONE corpus scan, and `text` is dropped before the only shuffle
    * — the window by fingerprint moves ~50-byte rows, not documents.
    * Keeper = min doc_id per fingerprint via an unordered partition
    * window (no window sort). The final verdict is a map-side boolean.
    * Contrast with joining q31⋈q32⋈q24 outputs on doc_id: that re-scans
    * the corpus three times and shuffles it twice; composition in one
    * projection is the form a 100 TB pipeline wants.
    *
    * Mirrors the reference's derived-quantity chaining (signals composed
    * into new signals, /root/reference/fdf/factory.py:380-420) applied to
    * the curation domain. Expressed through the fluent
    * [[graft.api.Curate]] builder so pipeline users get this zero-join
    * single-scan shape by default, not by example. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.api.Curate(TextOps.docsParallel(spark, dir))
      .langId("predicted")
      .tokenCount("n_tokens")
      .quality("quality")
      .exactDedup("is_keeper")
      .keepWhere($"is_keeper" && $"quality" >= 0.5)
      .result()
  }

  /** Four cheap labeling functions over a document (the Snorkel-style
    * weak-supervision pattern: many noisy heuristics, one denoised
    * label). Shared by q123 (per-doc votes) and q124 (per-LF agreement)
    * so the two queries can never drift. All integer/boolean built-ins
    * with exact DuckDB twins (`regexp_replace` needs the 'g' flag
    * there; Spark replaces all matches by default). */
  private def labelFns(text: Column): Seq[(String, Column)] = {
    val nc = length(text)
    val punct = nc - length(regexp_replace(text, "[.!?,;]", ""))
    val digits = nc - length(regexp_replace(text, "[0-9]", ""))
    Seq(
      "lf_len"   -> when(nc >= 200, 1L).otherwise(0L),
      "lf_stop"  -> when(instr(lower(text), " the ") > 0, 1L).otherwise(0L),
      "lf_punct" -> when(punct * 20 >= nc, 1L).otherwise(0L),
      "lf_digit" -> when(digits * 50 <= nc, 1L).otherwise(0L))
  }

  /** q123: weak-supervision label model (majority vote) — each doc gets
    * the four LF votes, the vote count, and the majority label
    * (≥3 of 4; the tie at 2-2 abstains to 0, standard for an even LF
    * panel).
    *
    * Scale shape: map-only — four codegen'd predicates per row, no
    * shuffle at all. */
  def weakLabels(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lfs = labelFns($"text")
    val votes = lfs.map(_._2).reduce(_ + _)
    graft.operators.TextOps.docsParallel(spark, dir)
      .select($"doc_id" +: lfs.map { case (n, c) => c.as(n) } :+
        votes.as("n_votes"): _*)
      .withColumn("majority", when($"n_votes" >= 3, 1L).otherwise(0L))
  }

  /** q124: labeling-function agreement audit — for each LF, how often
    * it votes and how often it agrees with the majority label (the
    * table a practitioner reads to spot a broken heuristic before it
    * poisons the label model).
    *
    * Scale shape: the per-doc vote relation unpivots via `stack` (a
    * generator, no shuffle) then ONE partial-agged groupBy bounded at
    * |LFs| = 4 rows. */
  def lfAgreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    weakLabels(spark, dir)
      .select(expr(
        """stack(4, 'lf_len', lf_len, 'lf_stop', lf_stop,
                    'lf_punct', lf_punct, 'lf_digit', lf_digit)
           AS (lf, v)"""), $"majority")
      .groupBy($"lf")
      .agg(count(lit(1)).as("n_docs"),
        sum($"v").as("n_vote"),
        sum(when($"v" === $"majority", 1L).otherwise(0L)).as("n_agree"))
      .select($"lf", $"n_vote",
        expr("(n_vote * 1000000) div n_docs").as("vote_ppm"),
        expr("(n_agree * 1000000) div n_docs").as("agree_ppm"))
  }

  /** q130: canonical-form dedup — the normalization pass between exact
    * dedup (q24, byte-identical only) and near-dup (q25+): lowercase,
    * strip punctuation to spaces, collapse runs, trim; docs sharing the
    * canonical form are trivial variants (case/punct re-edits) that no
    * pipeline should pay shingle-level machinery to find. Keeper =
    * lowest doc_id; n_raw_forms counts how many distinct raw texts the
    * group folds (== 1 means q24 already caught it).
    *
    * Scale shape: map-only canonicalization + one partial-agged groupBy
    * on the md5 fingerprint — exactly q24's shape, same 100 TB story. */
  def canonDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val canon = trim(regexp_replace(
      regexp_replace(lower($"text"), "[^a-z0-9 ]", " "), " +", " "))
    graft.operators.TextOps.docsParallel(spark, dir)
      .select($"doc_id", md5(canon).as("fp"), md5($"text").as("raw_fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_docs"),
        countDistinct($"raw_fp").as("n_raw_forms"))
  }

  /** q132: pairwise Cohen's kappa between the q123 labeling functions —
    * chance-corrected agreement, the audit that distinguishes "these
    * two LFs genuinely corroborate" from "they agree because both
    * almost always vote 1". kappa = (n·agree − E) / (n² − E) with
    * E = a1·b1 + a0·b0 — every term an exact integer; the signed ppm
    * division truncates toward zero in BOTH engines (verified: DuckDB
    * `//` and Spark `div` are Java-style truncation), so negative
    * kappas port exactly.
    *
    * Scale shape: ONE corpus pass computes all 4 vote sums and all 6
    * pairwise agreement sums as partial aggs into a single row; the
    * kappa algebra runs on the stacked 6-row relation. Nothing but the
    * one reduction ever touches the corpus. */
  def cohenKappa(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Seq("lf_len", "lf_stop", "lf_punct", "lf_digit")
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield (names(i), names(j))
    val aggs = Seq(count(lit(1)).as("n")) ++
      names.map(n => sum(col(n)).as(s"s_$n")) ++
      pairs.map { case (a, b) =>
        sum(when(col(a) === col(b), 1L).otherwise(0L)).as(s"ag_${a}_${b}")
      }
    val one = weakLabels(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = one.select(expr(
      s"""stack(${pairs.length}, ${pairs.map { case (a, b) =>
        s"'$a', '$b', ag_${a}_${b}, s_$a, s_$b" }.mkString(", ")})
          AS (lf_a, lf_b, agree, a1, b1)"""), $"n")
    stacked
      .withColumn("e_chance", $"a1" * $"b1" + ($"n" - $"a1") * ($"n" - $"b1"))
      .select($"lf_a", $"lf_b", $"n", $"agree",
        ($"agree" * $"n" - $"e_chance").as("kappa_num"),
        ($"n" * $"n" - $"e_chance").as("kappa_den"))
      .withColumn("kappa_ppm", expr("(kappa_num * 1000000) div kappa_den"))
  }

  /** q136: Fleiss' kappa over the whole 4-LF panel — the one-number
    * panel-agreement summary that complements q132's pairwise view
    * (Cohen covers 2 raters; Fleiss is the R-rater chance-corrected
    * agreement a weak-supervision audit actually reports). Binary
    * categories, R = 4 raters per doc: with s = positive votes on a
    * doc, the per-doc pair-agreement numerator is s² + (R−s)² − R, and
    *   kappa = (P̄ − P̄e) / (1 − P̄e)
    *         = (R·n·ΣP − (R−1)·(S² + (R·n − S)²))
    *           / (R·(R−1)·n² ·… )  — cleared to the integer form below
    * with S = Σs over docs, ΣP = Σ(s² + (R−s)² − R). For R = 4 the
    * cleared fraction is kappa = (4n·ΣP − 3·(S² + (4n−S)²))
    * / (48n² − 3·(S² + (4n−S)²)) — all-long arithmetic, ppm by integer
    * division, truncation identical in both engines.
    *
    * Long-overflow bound: 48n² needs n < 4.4e8 docs; beyond that route
    * the three products through decimal(38,0) (the q60 recipe).
    *
    * Scale shape: ONE partial-agged global aggregate over map-side LF
    * predicates — no shuffle wider than the 3-long partial rows. */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val one = weakLabels(spark, dir)
      .select($"n_votes".as("s"))
      .agg(count(lit(1)).as("n"), sum($"s").as("s_pos"),
        sum($"s" * $"s" + (lit(4L) - $"s") * (lit(4L) - $"s") - lit(4L))
          .as("p_sum"))
    one
      .withColumn("chance2",
        $"s_pos" * $"s_pos" +
          (lit(4L) * $"n" - $"s_pos") * (lit(4L) * $"n" - $"s_pos"))
      .select($"n", $"s_pos", $"p_sum",
        (lit(4L) * $"n" * $"p_sum" - lit(3L) * $"chance2").as("kappa_num"),
        (lit(48L) * $"n" * $"n" - lit(3L) * $"chance2").as("kappa_den"))
      .where($"kappa_den" =!= 0L)
      .withColumn("kappa_ppm", expr("(kappa_num * 1000000) div kappa_den"))
  }

  /** q166: cluster-consensus label propagation — the semi-supervised
    * step after weak labeling: documents whose labeling functions
    * AGREE (≥3 of 4 votes → seed 1, ≤1 → seed 0) lend their label to
    * undecided documents (2 of 4 votes) that share the same
    * distinctive RARE keyword — the doc's top tf-idf term among terms
    * with df·4 ≤ N (rarer than a quarter of the corpus; an absolute df
    * cap degenerates on a small synthetic vocabulary). Majority of
    * seed labels per keyword group; ties stay abstained. One round —
    * the label-prop fixpoint would iterate this, but in curation
    * practice one hop over confident seeds is the standard
    * (Snorkel-style) densification.
    *
    * Scale shape: votes are map-side; consensus is a GROUP aggregate
    * (never a pair join), so a popular keyword can only widen one
    * partial-agg group, not form a quadratic block; the keyword
    * grouping partial-aggs to ≤|terms| rows and joins back on the
    * term key. */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val lfs = labelFns($"text")
    val votes = lfs.map(_._2).reduce(_ + _)
    val seeds = TextOps.docsParallel(spark, dir)
      .select($"doc_id",
        when(votes >= 3, 1L).when(votes <= 1, 0L).otherwise(2L).as("seed"))
    // the (doc, term) counts feed BOTH the df aggregation and the
    // tf-idf scoring; a Ckpt barrier here was A/B'd same-JVM in round 9
    // and REJECTED (1.11 s vs 1.04 s without) — the duplicated CPU is
    // real (~2x tokenize) but fully hidden at 32 threads, while the
    // barrier adds a materialize+read pass on the critical path
    val tf = TextOps.docsParallel(spark, dir)
      .select($"doc_id", explode(TextOps.toks($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val nDocs = TextOps.docsParallel(spark, dir).agg(count(lit(1)).as("n_docs"))
    val rn = row_number().over(
      Window.partitionBy($"doc_id").orderBy($"score".desc, $"tok".asc))
    val topTerm = tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .where($"df" * 4 <= $"n_docs")
      .withColumn("score", $"tf" *
        floor(log($"n_docs" / $"df") * 10000 + lit(1.0 / 3)).cast("long"))
      .withColumn("rn", rn)
      .where($"rn" === 1 && $"score" > 0)
      .select($"doc_id", $"tok")
    // feeds the consensus agg AND the final join; same round-9 A/B as
    // tf — re-running the seeds regex scan (1.4 s CPU, 0.1 s wall)
    // beats a barrier
    val grouped = seeds.join(topTerm, "doc_id")
    val consensus = grouped
      .groupBy($"tok")
      .agg(sum(when($"seed" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"seed" === 0, 1L).otherwise(0L)).as("n0"))
    grouped.join(consensus, "tok")
      .select($"doc_id", $"tok", $"seed",
        when($"seed" =!= 2, $"seed")
          .when($"n1" > $"n0", 1L)
          .when($"n0" > $"n1", 0L)
          .otherwise(2L).as("label"),
        $"n1", $"n0")
  }

  /** q174: dataset card — the per-source summary panel a corpus ships
    * with (Datasheets for Datasets, Gebru et al. 2021): volume, token
    * mass, mean length, language-mix entropy, and exact-duplicate rate,
    * one row per source. The numbers a mixing/curation decision reads
    * first.
    *
    * Scale shape: two corpus passes — one map-side scan partial-aggs
    * volume/tokens/lang cells (entropy folds over the ≤|sources|×|langs|
    * relation), and the dup rate needs the fingerprint groupBy (the
    * q24 shuffle) re-aggregated per source. Both shuffles move
    * aggregate-sized rows, never documents. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = TextOps.docsParallel(spark, dir)
      .select($"doc_id", $"source", $"lang", $"n_chars",
        size(TextOps.toks($"text")).cast("long").as("n_toks"),
        md5($"text").as("fp"))
    val base = docs.groupBy($"source", $"lang")
      .agg(count(lit(1)).as("nl"), sum($"n_toks").as("tl"),
        sum($"n_chars").as("cl"))
    // language-mix entropy: Σ -p ln p over the bounded lang cells,
    // each ln offset-quantized before the sum (the q87 recipe)
    val perSource = base
      .withColumn("n", sum($"nl").over(Window.partitionBy($"source")))
      .withColumn("term_q",
        floor(($"nl" / $"n") * log($"n" / $"nl") * 1000000 + lit(1.0 / 3))
          .cast("long"))
      .groupBy($"source")
      .agg(sum($"nl").as("n_docs"), sum($"tl").as("n_tokens"),
        sum($"cl").as("n_chars"), count(lit(1)).as("n_langs"),
        sum($"term_q").as("lang_entropy_q"))
    val dups = docs
      .withColumn("n_fp", count(lit(1)).over(Window.partitionBy($"fp")))
      .where($"n_fp" > 1)
      .groupBy($"source").agg(count(lit(1)).as("n_dup_docs"))
    perSource.join(dups, Seq("source"), "left")
      .select($"source", $"n_docs", $"n_tokens",
        expr("(n_chars * 1000) div n_docs").as("mean_chars_milli"),
        $"n_langs", $"lang_entropy_q",
        coalesce($"n_dup_docs", lit(0L)).as("n_dup_docs"),
        expr("(coalesce(n_dup_docs, 0) * 1000000) div n_docs")
          .as("dup_ppm"))
  }

  /** Abstaining variants of the q123 labeling functions — each votes
    * 1/0 only in its confident band and returns null (abstains) in the
    * middle, the shape real Snorkel-style LFs have. Shared by q186 so
    * the operator and its oracle can't drift. */
  private def abstainingLabelFns(text: Column): Seq[(String, Column)] = {
    val nc = length(text)
    val punct = nc - length(regexp_replace(text, "[.!?,;]", ""))
    val digits = nc - length(regexp_replace(text, "[0-9]", ""))
    val theCount = (nc - length(regexp_replace(text, " the ", ""))) / 5
    Seq(
      "lf_len"   -> when(nc >= 300, 1L).when(nc < 150, 0L),
      "lf_stop"  -> when(theCount >= 3, 1L).when(theCount === 0, 0L),
      "lf_punct" -> when(punct * 20 >= nc, 1L).when(punct * 50 <= nc, 0L),
      "lf_digit" -> when(digits * 50 <= nc, 1L).when(digits * 10 >= nc, 0L))
  }

  /** q186: Krippendorff's alpha over the abstaining LF panel — the
    * agreement coefficient that HANDLES MISSING RATINGS, which is why
    * it (and not Cohen q132 / Fleiss q136, both of which require
    * complete panels) is the right audit once labeling functions
    * abstain (Krippendorff 2004, nominal data). Binary values; units
    * with ≥ 2 votes enter the coincidence matrix with weight
    * 1/(m_u − 1). Everything stays integer: m_u ≤ 4 makes (m_u − 1) a
    * divisor of 6, so the disagreement mass is accumulated as
    * o6 = Σ (6 div (m_u−1))·n0_u·n1_u — exact longs — and
    * alpha_ppm = 10⁶ − o6·(n−1)·10⁶ div (6·n0·n1) is one integer
    * division (n = total ratings). Long bound: o6·(n−1)·10⁶ needs
    * n ≲ 10⁸ ratings; beyond that route through decimal(38,0).
    *
    * Scale shape: map-only LF evaluation, one partial-agged per-doc
    * reduction, then a one-row total — the corpus never shuffles. */
  def krippendorffAlpha(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lfs = abstainingLabelFns($"text")
    val perDoc = graft.operators.TextOps.docsParallel(spark, dir)
      .select($"doc_id" +: lfs.map { case (n, c) => c.as(n) }: _*)
      .select($"doc_id",
        lfs.map { case (n, _) =>
          when(col(n).isNotNull, 1L).otherwise(0L) }.reduce(_ + _).as("m"),
        lfs.map { case (n, _) => coalesce(col(n), lit(0L)) }
          .reduce(_ + _).as("n1"))
      .withColumn("n0", $"m" - $"n1")
    alphaFrom(perDoc)
  }

  /** Testable aggregation core over any per-unit `(m, n1, n0)` vote
    * relation — StatPropertySpec checks alpha against the direct
    * Krippendorff coincidence-matrix formula on random panels. */
  private[graft] def alphaFrom(perDoc: DataFrame): DataFrame = {
    import perDoc.sparkSession.implicits._
    perDoc.where($"m" >= 2)
      .agg(count(lit(1)).as("n_units"),
        sum($"m").as("n_ratings"),
        sum($"n0").as("n0_tot"),
        sum($"n1").as("n1_tot"),
        sum(expr("(6 div (m - 1)) * n0 * n1")).as("o6"))
      .withColumn("alpha_ppm",
        when($"n0_tot" > 0 && $"n1_tot" > 0,
          lit(1000000L) - expr(
            "(o6 * (n_ratings - 1) * 1000000) div (6 * n0_tot * n1_tot)")))
  }

  /** q207: k-anonymity audit — before releasing or sharing a corpus,
    * how re-identifiable are its records through quasi-identifiers
    * (Sweeney 2002)? Here the QI tuple is (lang, source, length
    * decile): every equivalence class smaller than k = 5 is a
    * re-identification risk. Output: the k-distribution histogram
    * (class-size buckets 1, 2-4, 5-9, 10-49, ≥50) with record counts,
    * plus the risk headline — records in classes below k as ppm.
    * Length deciles are the q192 value-group cut on the bounded
    * n_chars grid, so the whole audit is exact integers.
    *
    * Scale shape: one scan partial-aggs to the QI-class relation
    * (bounded by |lang|×|source|×10); the histogram and the risk ppm
    * are arithmetic on that aggregate. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .groupBy($"n_chars").agg(count(lit(1)).as("cnt"))
    val wGt = Window.partitionBy(graft.functions.Win.bounded).orderBy($"n_chars".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(graft.functions.Win.bounded).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val deciles = g
      .withColumn("cum_gt", coalesce(sum($"cnt").over(wGt), lit(0L)))
      .withColumn("n_tot", sum($"cnt").over(wAll))
      .select($"n_chars", expr("(cum_gt * 10) div n_tot + 1").as("decile"))
    val classes = Tables.documents(spark, dir)
      .join(broadcast(deciles), "n_chars")
      .groupBy($"lang", $"source", $"decile")
      .agg(count(lit(1)).as("class_size"))
    val bucket = when($"class_size" === 1, "1_unique")
      .when($"class_size" < 5, "2_to_4")
      .when($"class_size" < 10, "5_to_9")
      .when($"class_size" < 50, "10_to_49")
      .otherwise("50_plus")
    classes
      .withColumn("bucket", bucket)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_classes"),
        sum($"class_size").as("n_records"),
        sum(when($"class_size" < 5, $"class_size").otherwise(0L))
          .as("n_at_risk"))
      .withColumn("total", sum($"n_records").over(
        Window.partitionBy(graft.functions.Win.bounded).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select($"bucket", $"n_classes", $"n_records",
        expr("(n_at_risk * 1000000) div total").as("risk_ppm"))
  }

  /** q210: filter-funnel census — the attrition table every corpus
    * release documents (the Gopher / RedPajama quality-filter report):
    * four ordered drop rules, each doc attributed to the FIRST rule
    * that kills it, plus each rule's independent fire count and the
    * survivor count after every funnel stage. Rules (all integer
    * thresholds, calibrated to fire on this corpus): too short
    * (< 20 tokens), non-English, mean word length outside
    * [4.20, 4.80] (centi-units, the Gopher word-length screen), and
    * duplicate-token share ≥ 60% (repetition). first-fail vs any-fail
    * is the point of the table: a rule with high any-fail but low
    * first-fail is redundant with the rules above it — the funnel
    * ORDER is an editorial decision this census makes checkable.
    *
    * Scale shape: one map-side scan computes all four flags (no
    * shuffle touches a document); the census is a single conditional
    * aggregation to ONE row, exploded into the 5-row report
    * driver-free; cumulative survivors fold inside the struct
    * literals, not a window. */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = TextOps.toks($"text")
    val d = TextOps.docsParallel(spark, dir)
      .select($"lang",
        size(t).cast("long").as("n_toks"),
        size(array_distinct(t)).cast("long").as("n_dist"),
        length(regexp_replace($"text", " ", "")).cast("long").as("n_let"))
      .select(
        ($"n_toks" < 20L).as("f1"),
        ($"lang" =!= "en").as("f2"),
        (expr("(n_let * 100) div n_toks") < 420L
          || expr("(n_let * 100) div n_toks") > 480L).as("f3"),
        (expr("((n_toks - n_dist) * 100) div n_toks") >= 60L).as("f4"))
    val one = d.agg(
      count(lit(1)).as("total"),
      sum(when($"f1", 1L).otherwise(0L)).as("a1"),
      sum(when($"f2", 1L).otherwise(0L)).as("a2"),
      sum(when($"f3", 1L).otherwise(0L)).as("a3"),
      sum(when($"f4", 1L).otherwise(0L)).as("a4"),
      sum(when($"f1", 1L).otherwise(0L)).as("c1"),
      sum(when(!$"f1" && $"f2", 1L).otherwise(0L)).as("c2"),
      sum(when(!$"f1" && !$"f2" && $"f3", 1L).otherwise(0L)).as("c3"),
      sum(when(!$"f1" && !$"f2" && !$"f3" && $"f4", 1L).otherwise(0L)).as("c4"))
    def row(stage: String, first: Column, any: Column, surv: Column) =
      struct(lit(stage).as("stage"), first.as("n_first_fail"),
        any.as("n_any_fail"), surv.as("survivors_after"))
    one.select(explode(array(
        row("1_too_short", $"c1", $"a1", $"total" - $"c1"),
        row("2_non_english", $"c2", $"a2", $"total" - $"c1" - $"c2"),
        row("3_word_len", $"c3", $"a3", $"total" - $"c1" - $"c2" - $"c3"),
        row("4_repetition", $"c4", $"a4",
          $"total" - $"c1" - $"c2" - $"c3" - $"c4"),
        row("5_kept", $"total" - $"c1" - $"c2" - $"c3" - $"c4", lit(0L),
          $"total" - $"c1" - $"c2" - $"c3" - $"c4"))).as("r"))
      .select($"r.stage", $"r.n_first_fail", $"r.n_any_fail",
        $"r.survivors_after")
  }

  /** q216: l-diversity census — q207's k-anonymity asks "how small are
    * the quasi-identifier classes"; l-diversity asks the harder
    * question (Machanavajjhala et al. 2007): within each class, how
    * many DISTINCT sensitive values appear? A class of 50 records is
    * still a disclosure if all 50 share one sensitive value. Classes
    * are q207's exact grid — (lang, source, n_chars decile) — and the
    * sensitive attribute is the document's leading token (the
    * content proxy this schema affords). Report is the l-histogram:
    * for each observed l, how many classes and records sit at that
    * diversity level — the "how much of the corpus is below l = 3"
    * table a release review reads.
    *
    * Scale shape: the decile grid is a ≤|distinct n_chars| relation
    * built from one partial-agged count (broadcast back, as in q207);
    * the class census is one exact count-distinct groupBy — Spark
    * expands it to a two-level partial aggregation, never a per-class
    * collect — and the histogram partial-aggs again to ≤|l| rows. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = Tables.documents(spark, dir)
      .groupBy($"n_chars").agg(count(lit(1)).as("cnt"))
    val wGt = Window.partitionBy(graft.functions.Win.bounded).orderBy($"n_chars".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(graft.functions.Win.bounded).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val deciles = g
      .withColumn("cum_gt", coalesce(sum($"cnt").over(wGt), lit(0L)))
      .withColumn("n_tot", sum($"cnt").over(wAll))
      .select($"n_chars", expr("(cum_gt * 10) div n_tot + 1").as("decile"))
    val classes = Tables.documents(spark, dir)
      .join(broadcast(deciles), "n_chars")
      .withColumn("sensitive", element_at(split($"text", " "), 1))
      .groupBy($"lang", $"source", $"decile")
      .agg(countDistinct($"sensitive").as("l"),
        count(lit(1)).as("class_size"))
    classes.groupBy($"l")
      .agg(count(lit(1)).as("n_classes"), sum($"class_size").as("n_records"))
      .withColumn("total", sum($"n_records").over(
        Window.partitionBy(graft.functions.Win.bounded).rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select($"l", $"n_classes", $"n_records",
        expr("(n_records * 1000000) div total").as("mass_ppm"))
  }

  /** q247: t-closeness — the third member of the privacy triad (q207
    * k-anonymity counts class sizes, q216 l-diversity counts distinct
    * sensitive values; neither sees a class whose sensitive DISTRIBUTION
    * is skewed, the attack t-closeness exists to name). For every
    * quasi-identifier class (lang, source), the Earth-Mover's Distance
    * between the class's length-decile distribution and the global one,
    * over the ORDERED decile scale: EMD = (1/(m-1))·Σ_i |P(≤i) − Q(≤i)|
    * (Li, Li & Venkatasubramanian 2007's ordered-attribute form). The
    * decile grid is q216's exact construction, so the triad shares one
    * sensitive-attribute definition.
    *
    * Exactness: cumulative differences as N·cum_c − n_k·cum_g integer
    * products routed through decimal(38,0) (the q60 discipline — no
    * silent overflow at any corpus size), one double division floored
    * with the +1/3 boundary offset.
    *
    * Scale shape: one (lang, source, decile) partial-agged shuffle; the
    * decile map and the 10-row global distribution are broadcasts; the
    * cumulative window is partitioned per class over ≤10 rows. Output:
    * |lang×source| rows. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame =
    tClosenessOn(Tables.documents(spark, dir))

  /** Testable core over any `(lang, source, n_chars)` relation. */
  private[graft] def tClosenessOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val g = docs
      .groupBy($"n_chars").agg(count(lit(1)).as("cnt"))
    val wGt = Window.partitionBy(graft.functions.Win.bounded).orderBy($"n_chars".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(graft.functions.Win.bounded).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val deciles = g
      .withColumn("cum_gt", coalesce(sum($"cnt").over(wGt), lit(0L)))
      .withColumn("n_tot", sum($"cnt").over(wAll))
      .select($"n_chars", expr("(cum_gt * 10) div n_tot + 1").as("decile"))
    val tagged = docs
      .join(broadcast(deciles), "n_chars")
      .select($"lang", $"source", $"decile")
    // global cumulative mass per decile (10 rows, broadcast)
    val glob = tagged.groupBy($"decile").agg(count(lit(1)).as("g"))
      .withColumn("cum_g", sum($"g").over(
        Window.partitionBy(graft.functions.Win.bounded).orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_total", sum($"g").over(wAll))
      .select($"decile", $"cum_g", $"n_total")
    // dense per-class decile grid: a class missing a decile still
    // carries its cumulative mass forward
    val classCnt = tagged.groupBy($"lang", $"source", $"decile")
      .agg(count(lit(1)).as("c"))
    val classes = tagged.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"))
    val grid = classes
      .select($"lang", $"source", $"n_docs",
        explode(sequence(lit(1L), lit(10L))).as("decile"))
      .join(classCnt, Seq("lang", "source", "decile"), "left")
      .withColumn("c", coalesce($"c", lit(0L)))
      .withColumn("cum_c", sum($"c").over(
        Window.partitionBy($"lang", $"source").orderBy($"decile")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(glob), "decile")
    grid
      .withColumn("d_abs", abs($"cum_c".cast(dec) * $"n_total"
        - $"cum_g".cast(dec) * $"n_docs"))
      .groupBy($"lang", $"source")
      .agg(first($"n_docs").as("n_docs"),
        first($"n_total").as("n_total"),
        sum($"d_abs").as("sd"))
      .withColumn("emd_ppm",
        floor($"sd".cast("double") * 1e6
          / (lit(9d) * $"n_docs".cast("double") * $"n_total".cast("double"))
          + lit(1.0 / 3)).cast("long"))
      .select($"lang", $"source", $"n_docs", $"emd_ppm",
        when($"emd_ppm" > 200000L, 1L).otherwise(0L).as("breach"))
  }
}
