package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.sources.Tables

/** Embedding compression + codebook operators — the storage-side
  * counterparts of the similarity search family (Similarity.scala): int8
  * scalar quantization (what a 100 TB vector store actually persists) and
  * a k-means codebook refinement step (how the IVF coarse quantizer in
  * Similarity.ivfAnn would actually be trained).
  */
object Quantize {

  /** q67: per-vector int8 scalar quantization and its reconstruction
    * error. Each vector maps to 64 codes in [0,255] on its own [lo, hi]
    * range; the output reports the code checksum and the max absolute
    * dequantization error. Map-only — every row is independent, nothing
    * shuffles; the per-element folds are the same left-to-right order as
    * the oracle's list_reduce, so the doubles agree bit-for-bit. */
  def embedQuant(spark: SparkSession, dir: String): DataFrame =
    quantizeOn(Tables.embeddings(spark, dir))

  /** Testable core over any `(vec_id, embedding)` relation. */
  private[graft] def quantizeOn(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val emb = transform($"embedding", x => x.cast("double"))
    val e = vecs.select($"vec_id", emb.as("emb"))
      .select($"vec_id", $"emb",
        array_min($"emb").as("lo"), array_max($"emb").as("hi"))
      .select($"vec_id", $"emb", $"lo", $"hi",
        (($"hi" - $"lo") / 255.0).as("scale"))
    val codes = transform($"emb", x =>
      when($"scale" === 0.0, lit(0L))
        .otherwise(least(lit(255L), floor(((x - $"lo") / $"scale")).cast("long"))))
    e.select($"vec_id", $"emb", $"lo", $"hi", $"scale", codes.as("codes"))
      .select(
        $"vec_id", $"lo", $"hi",
        aggregate($"codes", lit(0L), (acc, q) => acc + q).as("q_sum"),
        aggregate(
          zip_with($"emb", $"codes", (x, q) => abs(x - ($"lo" + q * $"scale"))),
          lit(0.0), (acc, d) => greatest(acc, d)).as("err_max"))
  }

  /** q68: one k-means (Lloyd) refinement step for the IVF codebook —
    * assign every vector to its nearest current centroid by cosine (the
    * 8 seed centroids and tie-break match Similarity.ivfAnn exactly),
    * then recompute each centroid component as the member mean. The
    * k-row codebook ships as literals (collected once on the driver —
    * bounded by k, like Similarity's LSH sign matrix), so assignment is
    * map-only; the recompute is one partial-aggregated shuffle of
    * (cell, dim) partials — at 100 TB this is the canonical
    * literal-codebook-assign / narrow-reduce iteration per Lloyd round.
    *
    * Component sums quantize to exact integers (floor(x * 1e6), the q60
    * trick) so the merge-order-sensitive double sum becomes a portable
    * exact long sum; the mean divides back out in double once. */
  /** Lloyd-iterated codebook — the PRODUCTION centroid path for
    * Similarity.semanticDedupOn / ivfAnnOn (the oracle queries keep the
    * deterministic first-k codebook so DuckDB reproduces assignments).
    * Seeds with the first k vectors, then runs `iters` rounds of the
    * q68 kmeansStep shape: map-only literal-codebook assignment (k
    * codegen'd dots + struct argmax per row, min-id tie-break), ONE
    * partial-agged (cell, dim) shuffle, and a k×d-bounded collect per
    * round. Component sums ride the floor(x·1e6) long lattice, so the
    * iteration is shuffle-order-deterministic end to end; an emptied
    * cell keeps its previous centroid (the standard Lloyd guard).
    *
    * Scale shape: per round the corpus is scanned once map-only and
    * reduced to k×d rows — the canonical distributed Lloyd; k and d are
    * codebook constants, so driver state is O(k·d) regardless of corpus
    * size. */
  private[graft] def lloydCentroids(spark: SparkSession, dir: String,
      k: Int, iters: Int): Array[(Long, Array[Double], Double)] = {
    import spark.implicits._
    lloydCentroidsVecs(Tables.rebalance(spark, dir, "embeddings",
      Tables.embeddings(spark, dir), $"vec_id"), k, iters)
  }

  /** Lloyd refinement over ANY `(vec_id, embedding)` collection — the
    * [[graft.api.Embeddings]] auto-k path. Seeds are the k lowest
    * vec_ids (TakeOrdered — equals the oracle's `vec_id < k` on dense
    * ids, well-defined on sparse ones). */
  private[graft] def lloydCentroidsVecs(vecs: DataFrame,
      k: Int, iters: Int): Array[(Long, Array[Double], Double)] = {
    import vecs.sparkSession.implicits._
    val emb = transform($"embedding", x => x.cast("double"))
    val e = Ckpt(vecs
      .select($"vec_id", emb.as("emb"),
        VectorOps.l2norm($"embedding").as("nrm")), eager = false)
    var cents: Array[(Long, Array[Double], Double)] =
      e.orderBy($"vec_id".asc).limit(k).as[(Long, Array[Double], Double)]
        .collect().sortBy(_._1)
    for (_ <- 1 to iters) {
      val scoredCells = array(cents.map { case (id, cemb, cnrm) =>
        struct((VectorOps.dot($"emb", lit(cemb)) / ($"nrm" * cnrm)).as("c"),
          lit(-id).as("nid"))
      }: _*)
      val sums = e
        .select((-array_max(scoredCells).getField("nid")).as("cell"),
          posexplode($"emb").as(Seq("dim", "x")))
        .groupBy($"cell", $"dim")
        .agg(count(lit(1)).as("n"),
          sum(floor($"x" * 1e6).cast("long")).as("xq"))
        .collect() // k×d rows — codebook-bounded, never corpus-sized
      val byCell = sums.groupBy(_.getLong(0))
      cents = cents.map { case (id, old, oldNrm) =>
        byCell.get(id) match {
          case Some(rows) =>
            val arr = new Array[Double](old.length)
            rows.foreach { r =>
              arr(r.getInt(1)) = r.getLong(3).toDouble / 1e6 / r.getLong(2)
            }
            var acc = 0.0; var i = 0
            while (i < arr.length) { acc += arr(i) * arr(i); i += 1 }
            (id, arr, math.sqrt(acc))
          case None => (id, old, oldNrm)
        }
      }
    }
    // the refined codebook is driver-side; the materialized embedding
    // relation has no further reader
    Ckpt.release(e)
    cents
  }

  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = transform($"embedding", x => x.cast("double"))
    val e = Tables.embeddings(spark, dir).select($"vec_id", emb.as("emb"),
      VectorOps.l2norm($"embedding").as("nrm"))
    // the codebook is k=8 rows — collect it to the driver (bounded, the
    // same pattern as Similarity's LSH sign matrix) and ship the
    // centroids as literals, so the assignment is a genuinely map-only
    // projection: 8 codegen'd dot products per row, an array argmax, and
    // NO window / NO shuffle of the collection before the (cell, dim)
    // partial aggregation
    val cents: Array[(Long, Array[Double], Double)] =
      e.where($"vec_id" < 8)
        .select($"vec_id", $"emb", $"nrm")
        .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    // argmax by cosine with the min-cent_id tie-break of the oracle's
    // (ccos DESC, cent_id ASC) ranking: struct max compares cosine first,
    // then the NEGATED id (max(-id) == min(id))
    val scoredCells = array(cents.map { case (id, cemb, cnrm) =>
      struct((VectorOps.dot($"emb", lit(cemb)) / ($"nrm" * cnrm)).as("c"),
        lit(-id).as("nid"))
    }: _*)
    val assigned = e.select($"vec_id", $"emb",
      (-array_max(scoredCells).getField("nid")).as("cell"))
    assigned
      .select($"cell", posexplode($"emb").as(Seq("dim", "x")))
      .groupBy($"cell", $"dim")
      .agg(count(lit(1)).as("n_members"),
        sum(floor($"x" * 1e6).cast("long")).as("xq_sum"))
      .select($"cell", $"dim".cast("long").as("dim"), $"n_members",
        ($"xq_sum" / 1e6 / $"n_members").as("centroid"))
  }

  /** q98: product-quantization (PQ) encoding — the storage format of an
    * IVF-PQ vector index (the q38 coarse quantizer's residual stage): the
    * 64-dim vector splits into m = 8 subspaces of 8 dims; each sub-vector
    * maps to the nearest of 8 codebook entries (sub-vectors of the first
    * 8 collection vectors — deterministic, so the oracle reproduces them;
    * production swaps in per-subspace k-means codes without changing the
    * plan). 64 floats become 8 3-bit codes; asymmetric-distance search
    * then scans codes with per-subspace lookup tables instead of raw
    * vectors.
    *
    * Engine portability: the sub-distance is computed as
    * (‖x‖² − 2·x·c) + ‖c‖² — three fixed-order dot products (the native
    * codegen'd kernel on the subspace slice; a per-dimension (x−c)²
    * expansion was a ~2,500-node expression tree that blew the codegen
    * method limit and fell back to slow interpreted eval). Every term is
    * the same left-to-right IEEE sum on both engines, so the argmin
    * (min-code tie-break) needs no quantization; only the REPORTED
    * distance is offset-quantized (floor(x·1e6 + 1/3)). A codebook
    * sub-vector encodes to itself at exactly 0.0: its x·c and ‖c‖² are
    * the SAME left-to-right sum as ‖x‖², so the algebra cancels exactly.
    *
    * Scale shape: the codebook is m·8 literal sub-vectors (collected once,
    * k-bounded like kmeansStep); encoding is one map-only projection —
    * zero shuffles, output one row per (vector, subspace). */
  def pqEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = 8; val subDim = 8; val k = 8
    val e = Tables.rebalance(spark, dir, "embeddings",
        Tables.embeddings(spark, dir), $"vec_id")
      .select($"vec_id", $"embedding")
    val codebook: Array[(Long, Array[Double])] =
      e.where($"vec_id" < k).as[(Long, Array[Float])].collect().sortBy(_._1)
        .map { case (id, a) => (id, a.map(_.toDouble)) }
    // explode the 8 subspace slices FIRST, then score each (vector, sub)
    // row with ONE ‖x‖² dot + k codebook dots against nested-literal
    // sub-vectors — the flat per-sub form repeated the ‖x‖² subtree k·m
    // times (a ~2,500-node tree, codegen fell back to interpreted eval)
    val withSub = e.select($"vec_id",
      posexplode(array((0 until m).map(s =>
        slice($"embedding", s * subDim + 1, subDim)): _*)).as(Seq("sub", "sl")))
    val sxx = VectorOps.dot($"sl", $"sl")
    val best = array_min(array(codebook.map { case (id, cemb) =>
      val subs: Seq[Seq[Double]] =
        (0 until m).map(s => cemb.slice(s * subDim, s * subDim + subDim).toSeq)
      // ‖c_s‖² per subspace, summed left-to-right (the oracle's order)
      val sccs: Seq[Double] = subs.map(_.foldLeft(0.0)((a, x) => a + x * x))
      val dist = (sxx - lit(2.0) * VectorOps.dot($"sl", element_at(typedLit(subs), $"sub" + 1)))
        .+(element_at(typedLit(sccs), $"sub" + 1))
      struct(dist.as("dist"), lit(id).as("code"))
    }: _*))
    withSub.select($"vec_id", $"sub".cast("long").as("sub"),
        best.getField("code").as("code"),
        floor(best.getField("dist") * 1e6 + lit(1.0 / 3)).cast("long").as("dist_q"))
  }

  /** q99: leading-component projection — the whitening/PCA step that
    * CONSUMES q92's Gram matrix: K = 4 power-iteration steps on the PSD
    * second-moment matrix, renormalized to a 1e6 integer grid between
    * steps, then every vector projects onto the resulting direction. The
    * dimensionality-reduction front door of an embedding pipeline (OPQ
    * rotations, PCA-before-IVF, energy compaction diagnostics); each
    * step provably increases the direction's Rayleigh quotient, and the
    * convergence RATE is the data's spectral gap — a production run
    * picks K accordingly (the synthetic corpus is near-isotropic, so K
    * here demonstrates the mechanism, which is what the spec gates).
    *
    * Engine portability: integer-exact end to end — the Gram is q92's
    * offset-quantized longs, each iteration is Σ G_ij·w_j in exact
    * integers (≤ 10¹⁷ at sf0.1, inside BIGINT; the 1e6 renorm runs in
    * 128-bit), the grid renorm truncates toward zero (BigInt `/`; the
    * oracle emulates trunc with a sign CASE around `//` floor division),
    * and the projection Σ floor(xᵢ·1e6)·wᵢ is a sum of longs, order-free
    * under shuffle.
    *
    * Scale shape: the Gram collect is d(d+1)/2 rows — bounded by the
    * DIMENSION, never the collection (the codebook-collect pattern of
    * kmeansStep/pqEncode); the iteration is O(K·d²) driver math; the
    * projection is one map-only pass with the direction as a literal.
    * At 100 TB only the Gram aggregation (already partial-agged, q92)
    * touches the data. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gramRows = embedGram(spark, dir)
      .select($"i", $"j", $"gram_q").as[(Long, Long, Long)].collect()
    val d = gramRows.iterator.map(_._2).max.toInt + 1
    val g = Array.ofDim[Long](d, d)
    gramRows.foreach { case (i, j, v) => g(i.toInt)(j.toInt) = v; g(j.toInt)(i.toInt) = v }
    // w_0 = ones on the 1e6 grid; K renormalized integer power steps
    var w: Array[BigInt] = Array.fill(d)(BigInt(1000000))
    (0 until 4).foreach { _ =>
      val v = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((a, j) => a + BigInt(g(i)(j)) * w(j)))
      val mx = v.map(_.abs).max
      require(mx.signum > 0, "degenerate Gram matrix: zero second moment")
      w = v.map(x => (x * 1000000) / mx) // BigInt / truncates toward zero
    }
    val wLit: Seq[Long] = w.map(_.toLong).toSeq
    Tables.rebalance(spark, dir, "embeddings",
        Tables.embeddings(spark, dir), $"vec_id")
      .select($"vec_id",
        aggregate(
          zip_with($"embedding", typedLit(wLit),
            (x, wi) => floor(x.cast("double") * 1e6).cast("long") * wi),
          lit(0L), (acc, p) => acc + p).as("proj_q"))
  }

  /** q92: the d×d Gram matrix XᵀX over the embedding collection — the
    * second-moment statistics an embedding pipeline computes before
    * whitening / PCA (which in turn trains the IVF coarse quantizer and
    * the OPQ rotation for q38/q67). Upper triangle only (the matrix is
    * symmetric): d(d+1)/2 = 2080 cells at d = 64.
    *
    * Scale shape: the per-row fan-out is d²/2 (a bounded explode), and
    * map-side partial aggregation collapses every partition to at most
    * 2080 rows before the one tiny shuffle — at 100 TB the reduce input
    * is |partitions|·2080 rows, independent of the collection size.
    * Each product is offset-quantized to a LONG before summing
    * (identical IEEE doubles on both engines, and sum-of-longs is
    * shuffle-order-free); at collections past ~10¹² rows the partial
    * sums should route through decimal(38,0) instead of BIGINT. */
  def embedGram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.rebalance(spark, dir, "embeddings",
      Tables.embeddings(spark, dir), $"vec_id")
    e.select($"vec_id", transform($"embedding", x => x.cast("double")).as("emb"))
      .select($"emb", posexplode($"emb").as(Seq("i", "vi")))
      .select($"i", $"vi", posexplode($"emb").as(Seq("j", "vj")))
      .where($"j" >= $"i")
      .select($"i".cast("long").as("i"), $"j".cast("long").as("j"),
        floor($"vi" * $"vj" * 1e6 + lit(1.0 / 3)).cast("long").as("pq"))
      .groupBy($"i", $"j")
      .agg(count(lit(1)).as("n"), sum($"pq").as("gram_q"))
  }

  /** q107: cluster-salient terms — label embedding clusters with the
    * vocabulary that distinguishes them (topic naming for corpus maps /
    * data-mixture dashboards). The first cross-MODALITY operator:
    * embedding-space structure (q68's literal-codebook cosine
    * assignment, same centroids and tie-break) joined back to the text
    * it embeds (doc_id = vec_id), then per cluster the top-3 tokens by
    * tf/df salience (q78's engine-exact rational: ordered by the
    * int/int division double, tie-broken by token).
    *
    * Scale shape: assignment is map-only (8 codegen'd dot products per
    * row, codebook as literals); the docs join hashes on doc_id; tf and
    * df are partial-agged; the ranking window partitions by cell over a
    * vocab-bounded relation (never the corpus). */
  def clusterTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = transform($"embedding", x => x.cast("double"))
    val e = Tables.embeddings(spark, dir).select($"vec_id", emb.as("emb"),
      VectorOps.l2norm($"embedding").as("nrm"))
    val cents: Array[(Long, Array[Double], Double)] =
      e.where($"vec_id" < 8)
        .select($"vec_id", $"emb", $"nrm")
        .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    val scoredCells = array(cents.map { case (id, cemb, cnrm) =>
      struct((VectorOps.dot($"emb", lit(cemb)) / ($"nrm" * cnrm)).as("c"),
        lit(-id).as("nid"))
    }: _*)
    val assigned = e.select($"vec_id",
      (-array_max(scoredCells).getField("nid")).as("cell"))
    val docs = Tables.documents(spark, dir)
    val tf = docs.join(assigned, $"doc_id" === $"vec_id")
      .select($"cell", explode(TextOps.toks($"text")).as("tok"))
      .groupBy($"cell", $"tok").agg(count(lit(1)).as("tf"))
    val df = docs
      .select($"doc_id", explode(TextOps.toks($"text")).as("tok"))
      .distinct()
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"cell")
      .orderBy(($"tf".cast("double") / $"df").desc, $"tok".asc)
    tf.join(df, "tok")
      .withColumn("rk", row_number().over(w))
      .where($"rk" <= 3)
      .select($"cell", $"rk".cast("long").as("rk"), $"tok", $"tf", $"df")
  }

  /** q224: per-dimension variance census — the embedding-collapse /
    * anisotropy audit: a dimension whose variance has died carries no
    * information (rank collapse, the classic failure of contrastive
    * embedding training), and a few dominant dimensions are the
    * anisotropy that ruins raw-cosine retrieval. Flags every dimension
    * whose population variance is under 5% of the leading dimension's.
    * The q92 Gram matrix is this audit's off-diagonal sibling; this is
    * the cheap per-dim pass a pipeline runs every ingest.
    *
    * Exactness: components on the 10⁶ grid; Σx and Σx² routed through
    * decimal(38,0) (the q60 discipline — exact at any corpus size, no
    * silent long overflow), cast once to correctly-rounded doubles for
    * the one-pass variance (Σx² − (Σx)²/n)/n, floor-quantized to a long.
    * The 5% flag is a pure long comparison against the broadcast max.
    *
    * Scale shape: one corpus scan partial-aggs to exactly d rows; the
    * max is a 1-row broadcast over those d rows. Map-only otherwise. */
  def dimVariance(spark: SparkSession, dir: String): DataFrame =
    dimVarianceOn(Tables.embeddings(spark, dir))

  /** Testable core over any `(vec_id, embedding)` relation. */
  private[graft] def dimVarianceOn(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    import org.apache.spark.sql.types.DecimalType
    val perDim = vecs
      .select(posexplode(transform($"embedding",
        x => floor(x.cast("double") * 1e6 + lit(1.0 / 3)).cast("long")))
        .as(Seq("i", "xq")))
      .groupBy($"i".cast("long").as("i"))
      .agg(count(lit(1)).as("n"),
        sum($"xq".cast(DecimalType(38, 0))).cast("double").as("sx"),
        // square in decimal, not long: xq*xq in LONG overflows for
        // |component| > ~3034 on the 1e6 grid; the oracle's HUGEINT
        // product is exact, so the cast must happen BEFORE the multiply
        sum($"xq".cast(DecimalType(38, 0)) * $"xq").cast("double")
          .as("sxx"))
      .select($"i", $"n",
        floor($"sx" / $"n" + lit(1.0 / 3)).cast("long").as("mean_micro"),
        floor(($"sxx" - $"sx" * $"sx" / $"n") / $"n" + lit(1.0 / 3))
          .cast("long").as("var_micro2"))
    val maxVar = perDim.agg(max($"var_micro2").as("max_var"))
    perDim.crossJoin(broadcast(maxVar))
      .select($"i", $"n", $"mean_micro", $"var_micro2",
        when($"var_micro2" * 20L < $"max_var", 1L).otherwise(0L)
          .as("dead"))
  }

  /** q239: diagonal-Mahalanobis embedding outliers — the top-20 vectors
    * by Σ_d (x_d − μ_d)²/σ²_d, the per-VECTOR audit built on q224's
    * per-DIMENSION stats: a corrupted embedding (wrong model version,
    * truncated float buffer, all-zeros) sits many pooled z-units out
    * and poisons every centroid (q223) and ANN list (q29) it touches.
    * Diagonal covariance is the deliberate scale choice — the full
    * Mahalanobis inverse is a d×d solve the audit doesn't need.
    *
    * Exactness: (xq − μ)² is an exact long on the micro grid (≤4e12);
    * each dimension's ONE double division by σ² floors to a milli long
    * BEFORE the per-vector sum (q87's associativity dodge — longs add
    * order-free, doubles don't), so the reduce is exact whatever the
    * partitioning. Zero-variance dims contribute 0 (a constant
    * dimension carries no outlier signal, and dividing by it would
    * blow up on the first rounding wobble).
    *
    * Scale shape: the d-row stats relation is a broadcast join onto the
    * posexploded vectors (map-side); the per-vector reduce partial-aggs
    * on vec_id; the top-20 is TakeOrderedAndProject — per-partition
    * heaps, no global sort. */
  def zOutliers(spark: SparkSession, dir: String): DataFrame =
    zOutliersOn(Tables.embeddings(spark, dir), topN = 20)

  /** Testable core over any `(vec_id, embedding)` relation. */
  private[graft] def zOutliersOn(vecs: DataFrame, topN: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val stats = dimVarianceOn(vecs)
      .select($"i", $"mean_micro", $"var_micro2")
    val scored = vecs
      .select($"vec_id", posexplode(transform($"embedding",
        x => floor(x.cast("double") * 1e6 + lit(1.0 / 3)).cast("long")))
        .as(Seq("i", "xq")))
      .withColumn("i", $"i".cast("long"))
      .join(broadcast(stats), "i")
      .withColumn("term_milli",
        when($"var_micro2" > 0L,
          floor((($"xq" - $"mean_micro") * ($"xq" - $"mean_micro"))
            .cast("double") * 1000d / $"var_micro2".cast("double"))
            .cast("long"))
          .otherwise(0L))
      .groupBy($"vec_id")
      .agg(sum($"term_milli").as("score_milli"))
    // distributed top-N (TakeOrdered) first; the rank window then sorts
    // topN rows — bounded by construction, so it carries Win.bounded
    scored.orderBy($"score_milli".desc, $"vec_id".asc).limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(graft.functions.Win.bounded)
          .orderBy($"score_milli".desc, $"vec_id".asc)).cast("long"))
      .select($"rank", $"vec_id", $"score_milli")
  }

  /** q249: participation ratio — the effective-rank summary of q224's
    * per-dimension variance census: PR = (Σ_d v_d)² / Σ_d v_d² ∈ [1, d]
    * (Gao et al.'s neural-dimensionality measure; the diagonal
    * approximation of erank, deliberate for the same reason q239 stays
    * diagonal — no d×d eigensolve in a per-ingest audit). PR ≈ d means
    * isotropic embeddings; PR ≪ d is the rank collapse q224 flags
    * per-dimension, here compressed to the one number a drift dashboard
    * tracks, alongside the top-dimension variance share (the anisotropy
    * that ruins raw-cosine retrieval).
    *
    * Scale shape: q224's one-scan d-row census, then a single aggregate
    * over d rows — sums in decimal(38,0) (v_d is micro²-scale ~1e12, so
    * Σv² brushes 1e27), two double divisions floored with the +1/3
    * offset. Output: 1 row. */
  def participationRatio(spark: SparkSession, dir: String): DataFrame =
    participationRatioOn(Tables.embeddings(spark, dir))

  /** Testable core over any `(vec_id, embedding)` relation. */
  private[graft] def participationRatioOn(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    dimVarianceOn(vecs)
      .agg(count(lit(1)).as("n_dims"),
        sum($"dead").as("n_dead"),
        sum($"var_micro2".cast(dec)).as("svd"),
        sum($"var_micro2".cast(dec) * $"var_micro2").as("svvd"),
        max($"var_micro2").as("max_var"))
      .select($"n_dims", $"n_dead",
        $"svd".cast("long").as("sum_var"),
        when($"svvd" > 0L,
          floor(($"svd" * $"svd").cast("double") * 1000d
            / $"svvd".cast("double") + lit(1.0 / 3)).cast("long"))
          .otherwise(0L).as("pr_milli"),
        when($"svd" > 0L,
          floor($"max_var".cast("double") * 1e6
            / $"svd".cast("double") + lit(1.0 / 3)).cast("long"))
          .otherwise(0L).as("top_share_ppm"))
  }

  /** q264: int8-quantization rank fidelity — does q67's int8 encoding
    * PRESERVE THE RANKING the float vectors induce? For each of 10
    * query vectors (vec_id < 10) against a fixed 50-candidate panel
    * (10 <= vec_id < 60), every candidate pair is scored concordant /
    * discordant / tied between the exact float cosine and the cosine of
    * the dequantized int8 reconstruction (lo + code·scale, q67's exact
    * grid) — Kendall's tau per query. This is the acceptance test a
    * quantized index must pass before serving: a compressor can have
    * tiny per-element error (q67's err_max) yet still reorder
    * neighbors, and it's the ORDER an ANN index returns.
    *
    * Exactness: both cosines ride the engines' shared left-to-right
    * dot/norm fold and are 1e6-quantized per (query, candidate) BEFORE
    * the pair comparison, so concordance is exact integer sign algebra;
    * tau's numerator can be negative, so the division runs on the
    * +1000·n_pairs-shifted nonnegative form (where Spark's trunc-div
    * and DuckDB's floor-div agree) and shifts back — the q263 recipe.
    *
    * Scale shape: constant-bounded — 10×50 scored rows, 10×C(50,2) =
    * 12,250 pair rows, independent of collection size; both scans are
    * id-pruned. */
  def quantFidelity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = fidelityScored(spark, dir)
    val p = scored.as("x").join(scored.as("y"),
        col("x.query_id") === col("y.query_id")
          && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.query_id").as("query_id"),
        (col("x.eq") - col("y.eq")).as("de"),
        (col("x.aq") - col("y.aq")).as("da"))
    p.groupBy($"query_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"de" * $"da" > 0L, 1L).otherwise(0L)).as("n_conc"),
        sum(when($"de" * $"da" < 0L, 1L).otherwise(0L)).as("n_disc"),
        sum(when($"de" === 0L || $"da" === 0L, 1L).otherwise(0L)).as("n_tie"))
      .select($"query_id", $"n_pairs", $"n_conc", $"n_disc", $"n_tie",
        // shift by +1000·n_pairs so the dividend is nonnegative:
        // trunc-div (Spark) == floor-div (DuckDB) on nonnegatives
        (expr("(((n_conc - n_disc) + 1000 * n_pairs) * 1000) div n_pairs")
          - 1000000L).as("tau_milli"))
  }

  /** The shared (query, candidate) scoring relation of q264/q276: exact
    * float cosine and dequantized-int8 cosine, both 1e6-quantized. */
  private[graft] def fidelityScored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .where($"vec_id" < 60)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("emb"))
      .select($"vec_id", $"emb",
        array_min($"emb").as("lo"), array_max($"emb").as("hi"))
      .select($"vec_id", $"emb", $"lo",
        (($"hi" - $"lo") / 255.0).as("scale"))
    val codes = transform($"emb", x =>
      when($"scale" === 0.0, lit(0L))
        .otherwise(least(lit(255L), floor((x - $"lo") / $"scale").cast("long"))))
    val recon = e.select($"vec_id", $"emb",
        transform(codes, q => $"lo" + q * $"scale").as("rec"))
      .select($"vec_id", $"emb", $"rec",
        VectorOps.l2norm($"emb").as("enrm"),
        VectorOps.l2norm($"rec").as("rnrm"))
    val q = recon.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"emb".as("qemb"), $"rec".as("qrec"),
        $"enrm".as("qenrm"), $"rnrm".as("qrnrm"))
    val c = recon.where($"vec_id" >= 10)
    c.join(broadcast(q), c("vec_id") =!= q("query_id"))
      .select($"query_id", $"vec_id",
        floor((VectorOps.dot($"qemb", $"emb") / ($"qenrm" * $"enrm"))
          * 1e6 + lit(1.0 / 3)).cast("long").as("eq"),
        floor((VectorOps.dot($"qrec", $"rec") / ($"qrnrm" * $"rnrm"))
          * 1e6 + lit(1.0 / 3)).cast("long").as("aq"))
  }

  /** q276: top-10 rank stability under int8 quantization — the
    * retrieval-facing complement of q264's Kendall tau: per query, how
    * many of the float-cosine top-10 candidates survive in the
    * dequantized-int8 top-10 (set overlap + Jaccard). Tau penalizes
    * every transposition equally; an ANN SERVING check only cares
    * whether the returned set changes — this is the number an index
    * rollout gate reads.
    *
    * Exactness: both rankings order the shared 1e6-quantized scores
    * with vec_id tie-break — exact integer comparisons; the overlap
    * and Jaccard are pure counts.
    *
    * Scale shape: two rank windows over the constant 10×50 scored
    * relation (per-query partitions of 50 rows), one full outer join
    * of two ≤100-row sets. O(1) after the id-pruned scans. */
  def rankStability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val scored = fidelityScored(spark, dir)
    val we = Window.partitionBy($"query_id").orderBy($"eq".desc, $"vec_id".asc)
    val wa = Window.partitionBy($"query_id").orderBy($"aq".desc, $"vec_id".asc)
    val te = scored.withColumn("rk", row_number().over(we))
      .where($"rk" <= 10).select($"query_id", $"vec_id", lit(1L).as("in_e"))
    val ta = scored.withColumn("rk", row_number().over(wa))
      .where($"rk" <= 10).select($"query_id", $"vec_id", lit(1L).as("in_a"))
    te.join(ta, Seq("query_id", "vec_id"), "full")
      .groupBy($"query_id")
      .agg(sum(when($"in_e".isNotNull && $"in_a".isNotNull, 1L)
          .otherwise(0L)).as("n_both"),
        // union from the ACTUAL set sizes (|A|+|B|−|A∩B|), not the
        // 20−n_both constant: with <10 scored candidates per query
        // both top-10 sets shrink and the constant overstates the union
        sum(when($"in_e".isNotNull, 1L).otherwise(0L)).as("n_e"),
        sum(when($"in_a".isNotNull, 1L).otherwise(0L)).as("n_a"))
      .select($"query_id", $"n_both",
        expr("(n_both * 1000000) div (n_e + n_a - n_both)")
          .as("jaccard_ppm"))
  }

  /** q265: PQ reconstruction distortion per subspace — the codebook
    * acceptance table that CONSUMES q98's encoding: per subspace, the
    * mean and max quantized sub-distance ‖x_s − c_s‖² and the share of
    * exactly-zero encodings (codebook members encode to themselves —
    * q98's cancellation argument makes 0 exact). A subspace whose mean
    * distortion is an outlier needs more codebook bits (or an OPQ
    * rotation to re-balance variance, q99's direction); this table is
    * how that call is made.
    *
    * Scale shape: rides q98's map-only encode (zero shuffles) plus ONE
    * partial-agged groupBy bounded at m = 8 rows. The long sum of
    * dist_q is exact under any merge order. */
  /** q297: PQ codebook usage census per subspace — the bit-efficiency
    * audit that completes q265's distortion table: per subspace, how
    * many of the k codes are LIVE, the usage entropy (in e4 nats —
    * ln k = full utilization of the code budget), and the share of the
    * hottest code. A subspace whose mass collapses onto one code
    * carries ~0 bits (dead budget — re-train or rotate, the OPQ
    * signal); distortion (q265) can look fine while utilization says
    * the codebook wastes its budget on empty cells.
    *
    * Exactness: the entropy is q293's c·lnq(c/n) exact-long-sum
    * discipline on the (sub, code) histogram; shares are trunc-divs.
    *
    * Scale shape: rides the map-only q98 encode + one agg bounded at
    * m·k = 64 rows. */
  def codeUsage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = pqEncode(spark, dir)
      .groupBy($"sub", $"code").agg(count(lit(1)).as("k"))
    val n = cnt.groupBy($"sub").agg(sum($"k").as("n"))
    cnt.join(n, Seq("sub"))
      .select($"sub", $"n", $"k",
        ($"k" * floor(log($"k".cast("double") / $"n".cast("double"))
          * 10000 + lit(1.0 / 3)).cast("long")).as("t"))
      .groupBy($"sub", $"n")
      .agg(count(lit(1)).as("n_codes_used"), sum($"t").as("s"),
        max($"k").as("top_k"))
      .select($"sub", $"n_codes_used",
        expr("(-s) div n").as("usage_ent_e4"),
        expr("(top_k * 1000000) div n").as("top_code_share_ppm"))
  }

  /** q300: parametric OPQ by variance-balanced dimension PERMUTATION —
    * the rotation-training step the q297/q265 audits call for, in the
    * cheapest orthogonal family (a permutation matrix IS a rotation up
    * to sign): rank dimensions by their exact second moment (q92's Gram
    * diagonal discipline), snake-draft them into the m subspaces (rank
    * block b gives each subspace one dim, alternating direction — the
    * classic balanced allocation of parametric OPQ, Ge, He, Ke & Sun,
    * CVPR 2013, §4's eigenvalue-allocation idea with moments standing in
    * for eigenvalues), re-encode in the permuted space with the same
    * first-8 codebook rule, and report BOTH layouts' q297 usage entropy
    * and q265 distortion per subspace — the before/after table that says
    * whether the rotation bought back dead code budget.
    *
    * Engine portability: moments are exact long sums of
    * floor(x²·1e6 + 1/3) (q92's grid); the rank/snake assignment is
    * integer; the permuted encode reuses q98's fixed-order float
    * discipline on the gathered sub-vectors (gather order = snake
    * position, identical in the oracle via list(x ORDER BY pos));
    * entropy/distortion ride q297/q265's exact-long paths verbatim.
    *
    * Scale shape: one map-side partial-agged moment pass (d rows out),
    * a d-bounded driver sort (the q99 discipline: driver math is bounded
    * by DIMENSION, never collection), then q98's map-only encode twice
    * and two m-bounded aggs. Zero unbounded shuffles. */
  def opqPermute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    opqPermuteVecs(Tables.rebalance(spark, dir, "embeddings",
      Tables.embeddings(spark, dir), $"vec_id")
      .select($"vec_id", $"embedding"))
  }

  private[graft] def opqPermuteVecs(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val m = 8; val subDim = 8; val k = 8
    // four consumers (moment collect, codebook collect, both encode
    // variants) and the relation carries the rebalance shuffle —
    // truncate once
    val e = Ckpt(vecs.select($"vec_id", $"embedding"), eager = false)
    // per-dim second moments on q92's exact grid (its Gram diagonal)
    val moments: Array[(Int, Long)] = e
      .select(posexplode(transform($"embedding", x => x.cast("double")))
        .as(Seq("i", "x")))
      .select($"i", floor($"x" * $"x" * 1e6 + lit(1.0 / 3)).cast("long").as("mq"))
      .groupBy($"i").agg(sum($"mq").as("mom"))
      .as[(Int, Long)].collect()
    val d = moments.map(_._1).max + 1
    require(d == m * subDim, s"opqPermute expects d=${m * subDim}, got $d")
    // rank by (moment desc, dim asc); snake-draft rank r: position
    // pos = r/m, subspace = pos even ? r%m : m-1-r%m
    val ranked: Array[Int] = moments.sortBy { case (i, mm) => (-mm, i) }.map(_._1)
    val perm: Array[Array[Int]] = {
      val a = Array.fill(m, subDim)(-1)
      for ((dim, r) <- ranked.zipWithIndex) {
        val pos = r / m; val within = r % m
        val sub = if (pos % 2 == 0) within else m - 1 - within
        a(sub)(pos) = dim
      }
      a
    }
    def encoded(sl: Int => Column, cb: Array[(Long, Array[Double])],
        subsOf: Array[Double] => Seq[Seq[Double]]): DataFrame = {
      val withSub = e.select($"vec_id",
        posexplode(array((0 until m).map(sl): _*)).as(Seq("sub", "sl")))
      val sxx = VectorOps.dot($"sl", $"sl")
      val best = array_min(array(cb.map { case (id, cemb) =>
        val subs = subsOf(cemb)
        val sccs: Seq[Double] = subs.map(_.foldLeft(0.0)((a, x) => a + x * x))
        val dist = (sxx - lit(2.0) * VectorOps.dot($"sl",
          element_at(typedLit(subs), $"sub" + 1)))
          .+(element_at(typedLit(sccs), $"sub" + 1))
        struct(dist.as("dist"), lit(id).as("code"))
      }: _*))
      withSub.select($"vec_id", $"sub".cast("long").as("sub"),
        best.getField("code").as("code"),
        floor(best.getField("dist") * 1e6 + lit(1.0 / 3)).cast("long").as("dist_q"))
    }
    val codebook: Array[(Long, Array[Double])] =
      e.where($"vec_id" < k).as[(Long, Array[Float])].collect().sortBy(_._1)
        .map { case (id, a) => (id, a.map(_.toDouble)) }
    // identity layout: q98's contiguous slices
    val base = encoded(
      s => slice($"embedding", s * subDim + 1, subDim),
      codebook,
      cemb => (0 until m).map(s => cemb.slice(s * subDim, s * subDim + subDim).toSeq))
    // OPQ layout: snake-permuted gathers (same float discipline — the
    // gathered array is float elements in pos order, dot runs on it
    // exactly as on a contiguous slice)
    val opq = encoded(
      s => array(perm(s).map(dd => $"embedding"(dd)): _*),
      codebook,
      cemb => (0 until m).map(s => perm(s).toSeq.map(cemb(_))))
    def stats(enc: DataFrame, tag: String): DataFrame = {
      val cnt = enc.groupBy($"sub", $"code").agg(count(lit(1)).as("k"))
      val n = cnt.groupBy($"sub").agg(sum($"k").as("n"))
      val ent = cnt.join(n, Seq("sub"))
        .select($"sub", $"n", $"k",
          ($"k" * floor(log($"k".cast("double") / $"n".cast("double"))
            * 10000 + lit(1.0 / 3)).cast("long")).as("t"))
        .groupBy($"sub", $"n")
        .agg(count(lit(1)).as("n_codes_used"), sum($"t").as("s"))
        .select($"sub", $"n_codes_used", expr("(-s) div n").as("usage_ent_e4"))
      val dist = enc.groupBy($"sub")
        .agg(count(lit(1)).as("n_vecs"), sum($"dist_q").as("sum_dist"))
        .select($"sub", $"n_vecs", expr("sum_dist div n_vecs").as("mean_dist_q"))
      ent.join(dist, Seq("sub")).select(lit(tag).as("variant"), $"sub",
        $"n_vecs", $"n_codes_used", $"usage_ent_e4", $"mean_dist_q")
    }
    stats(base, "base").unionByName(stats(opq, "opq"))
  }

  def pqDistortion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pqEncode(spark, dir)
      .groupBy($"sub")
      .agg(count(lit(1)).as("n_vecs"),
        sum($"dist_q").as("sum_dist"),
        max($"dist_q").as("max_dist_q"),
        sum(when($"dist_q" === 0L, 1L).otherwise(0L)).as("n_zero"))
      .select($"sub", $"n_vecs",
        // dist_q >= 0 up to the +1/3 offset (a cancellation can land at
        // -1 only if the float dist dips below -1/3, impossible for a
        // true squared distance) — the sum is nonnegative, div is safe
        expr("sum_dist div n_vecs").as("mean_dist_q"),
        $"max_dist_q",
        expr("(n_zero * 1000000) div n_vecs").as("zero_ppm"))
  }

  /** q308: residual quantization (RQ) — the additive-codebook
    * alternative to q98's product quantization (Chen, Guan & Wang 2010;
    * the RQ/LSQ family behind modern additive quantizers): stage 1
    * snaps the FULL 64-dim vector to its nearest coarse center, stage 2
    * quantizes the residual against a second codebook, and the
    * reconstruction is the SUM c₁ + c₂ — unlike PQ, every stage sees
    * the whole vector, so correlated dimensions cost one code, not m.
    * Emitted per vector: both codes and the stage-1 vs stage-2 squared
    * error (d2 ≤ d1 wherever code₂ ≠ degenerate; the spec gates the
    * mean drop). q297's usage-entropy audit applies to stage-2 codes
    * unchanged.
    *
    * Codebooks follow the q98/q68 fixed-seed discipline: stage 1 =
    * vectors 0..7, stage 2 = the residuals of vectors 8..15 under their
    * own stage-1 assignment — a bounded 16-row driver collect (the
    * codebook-collect pattern), with the driver-side fold written in
    * the same ascending left-fold double chain as the oracle's
    * list_reduce, so both engines derive bit-identical codebooks.
    *
    * Scale shape: map-only — one scan, 16 nested-literal distance
    * evaluations per row inside whole-stage codegen, no shuffle at all
    * (the output is per-vector). At 100 TB this is the encode pass a
    * vector store runs once per ingest batch. */
  /** q321: k-means‖ oversampling initialization (Bahmani et al. 2012,
    * "Scalable k-means++") — the DISTRIBUTED seeding the Lloyd family
    * (q68, q38, q319) assumes someone already did: instead of k
    * sequential k-means++ draws (k full passes), 3 oversampling rounds
    * each sample ~ℓ = 8 candidates in parallel with probability
    * ℓ·d²(x)/φ, then the candidate set is weighted by how many points
    * it attracts (the input to the final cheap clustering step). The
    * canonical at-scale answer to "k-means++ is inherently serial".
    *
    * Determinism: the Bernoulli draw is a content-hash
    * (md5("kp<round>:<vec_id>") % 10⁶, the q47 sampling discipline)
    * compared against ℓ·dq·10⁶ < h·φq entirely in integers — dq is the
    * floor-quantized min-L2² to the current centers, φq = Σdq an exact
    * long, and the product comparison routes through decimal(38,0)
    * (h·φq can reach ~10²⁰). Both engines walk the identical candidate
    * chain; already-selected centers have dq = 0 and can never re-draw.
    *
    * Scale shape: each round is one scan (min-distance map over a
    * broadcast center literal + a 1-row φ agg + an expected-ℓ-row
    * candidate collect); the weight pass is one more scan with a
    * partial-agged groupBy bounded by the candidate count. Candidates
    * ~ 1 + 3ℓ stay driver-sized by design (the paper's point). */
  def kmeansParInit(spark: SparkSession, dir: String): DataFrame =
    kmeansParInitOn(Tables.rebalance(spark, dir, "embeddings",
      Tables.embeddings(spark, dir),
      org.apache.spark.sql.functions.col("vec_id")))

  private[graft] def kmeansParInitOn(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val ell = 8L
    val e = vecs.select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("emb"))
    def d2(c: Seq[Double]): Column =
      // codegen loop, bit-identical operation order to the interpreted
      // aggregate(zip_with(...)) lambda it replaced (SqDistExpr scaladoc)
      VectorOps.sqdist($"emb", typedLit(c))
    def dqCol(cents: Seq[(Long, Seq[Double])]): Column =
      floor(array_min(array(cents.map { case (_, c) => d2(c) }: _*))
        * 1e6 + lit(1.0 / 3)).cast("long")
    var centers: Seq[(Long, Seq[Double], Long)] =
      e.where($"vec_id" === 0L).as[(Long, Seq[Double])].collect()
        .map { case (id, v) => (id, v, 0L) }.toSeq
    for (r <- 1 to 3) {
      val dq = dqCol(centers.map { case (id, v, _) => (id, v) })
      val phi = e.agg(sum(dq)).collect()(0).getLong(0)
      val h = conv(substring(md5(concat(lit(s"kp$r:"),
        $"vec_id".cast("string"))), 1, 8), 16, 10).cast("long") % 1000000L
      val picked = e
        .where(h.cast("decimal(38,0)") * lit(phi)
          < lit(ell) * dq.cast("decimal(38,0)") * lit(1000000L))
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      centers = centers ++ picked.map { case (id, v) => (id, v, r.toLong) }
    }
    // weight pass: every point votes for its nearest candidate
    // (min (L2², id) via the struct-argmax idiom)
    val cid = -array_max(array(centers.map { case (id, v, _) =>
      struct((-d2(v)).as("c"), lit(-id).as("nid"))
    }: _*)).getField("nid")
    val weights = e.select(cid.as("cand_id"))
      .groupBy($"cand_id").agg(count(lit(1)).as("weight"))
    val cands = centers.map { case (id, _, r) => (id, r) }
      .toDF("cand_id", "round_added")
    cands.join(weights, Seq("cand_id"), "left")
      .select($"cand_id", $"round_added",
        coalesce($"weight", lit(0L)).as("weight"))
  }

  def rqEncode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rqEncodeOn(Tables.rebalance(spark, dir, "embeddings",
      Tables.embeddings(spark, dir), $"vec_id"))
  }

  /** Testable core over any `(vec_id, embedding)` relation. */
  private[graft] def rqEncodeOn(vecs: DataFrame): DataFrame = {
    import vecs.sparkSession.implicits._
    val k = 8
    val e = vecs.select($"vec_id", $"embedding")
    def dotD(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    val head: Array[(Long, IndexedSeq[Double])] =
      e.where($"vec_id" < 2L * k).as[(Long, Array[Float])].collect()
        .sortBy(_._1).map { case (id, a) =>
          (id, a.map(_.toDouble).toIndexedSeq) }
    val cb1: Seq[(Long, IndexedSeq[Double])] =
      head.filter(_._1 < k).toSeq
    // stage-2 codebook: residuals of vecs 8..15 under their own stage-1
    // assignment, same (dist asc, code asc) tie rule as the column path
    val cb2: Seq[(Long, IndexedSeq[Double])] =
      head.filter(t => t._1 >= k && t._1 < 2L * k).toSeq.map { case (id, x) =>
        val sxx = dotD(x, x)
        val bestCode = cb1.map { case (c, ce) =>
          (sxx - 2.0 * dotD(x, ce) + dotD(ce, ce), c)
        }.reduceLeft { (p, q) =>
          if (q._1 < p._1 || (q._1 == p._1 && q._2 < p._2)) q else p
        }._2
        val ce = cb1.find(_._1 == bestCode).get._2
        (id - k, x.indices.map(i => x(i) - ce(i)))
      }
    def nearest(vec: Column, cb: Seq[(Long, IndexedSeq[Double])]): Column = {
      val sxx = VectorOps.dot(vec, vec)
      array_min(array(cb.map { case (id, ce) =>
        val scc = dotD(ce, ce)
        struct(
          (sxx - lit(2.0) * VectorOps.dot(vec, typedLit(ce.toSeq))
            + lit(scc)).as("dist"),
          lit(id).as("code"))
      }: _*))
    }
    val cb1Lit = typedLit(cb1.map(_._2.toSeq))
    val s1 = e.withColumn("b1", nearest($"embedding", cb1))
      .select($"vec_id", $"b1.code".as("code1"), $"b1.dist".as("dist1"),
        zip_with($"embedding",
          element_at(cb1Lit, ($"b1.code" + 1L).cast("int")),
          (a, b) => a - b).as("r"))
    s1.withColumn("b2", nearest($"r", cb2))
      .select($"vec_id", $"code1", $"b2.code".as("code2"),
        floor($"dist1" * 1e6 + lit(1.0 / 3)).cast("long").as("d1_q"),
        floor($"b2.dist" * 1e6 + lit(1.0 / 3)).cast("long").as("d2_q"))
  }
}
