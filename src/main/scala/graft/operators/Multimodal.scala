package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition through the typed Dataset API.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake decoder (documented as such): it derives "frame"
  * geometry and a checksum from the raw bytes. The Spark-side shape is the
  * real thing being exercised — binary column ingest, case-class Encoders,
  * `mapPartitions` batching (one decoder init per partition, the same
  * shape a JNI/FFmpeg decoder needs), and a relational schema out the
  * other side. Swap `decodeStub` for a real codec and nothing else
  * changes.
  *
  * At 100 TB: media bytes stay columnar parquet binary, the decode is a
  * map-only stage with no shuffle, and metadata lands in a narrow table;
  * partition sizing is governed by files.maxPartitionBytes, not row
  * counts.
  */
object Multimodal {

  case class Blob(doc_id: Long, bytes: Array[Byte])
  case class BlobMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
      checksum32: Long)

  /** STUB decoder — stands in for an image/audio codec (none in this
    * container). Deterministic arithmetic on the bytes so the DuckDB
    * oracle reproduces it: fake width from the byte length, fake checksum
    * from the first 32 bytes (unsigned). */
  private def decodeStub(b: Blob): BlobMeta = {
    val n = b.bytes.length.toLong
    val width = (n % 64) + 1
    val height = n / width
    val checksum = b.bytes.iterator.take(32).map(x => (x & 0xff).toLong).sum
    BlobMeta(b.doc_id, n, width, height, checksum)
  }

  /** Binary ingest + per-partition decode: documents' text bytes stand in
    * for media payloads. One decoder instance per partition via
    * mapPartitions — the batch shape a real codec wants. */
  def blobMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[Blob] = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("bytes"))
      .as[Blob]
    blobs.mapPartitions { it =>
      // per-partition init point for a real decoder (JNI handle, model, …)
      it.map(decodeStub)
    }.toDF()
  }

  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long, frame_sum: Long)

  /** Frame sampling: treat the payload as fixed 64-byte frames and keep
    * every 2nd (a video keyframe/stride sample). STUB "decode": frame
    * metadata is deterministic arithmetic on the raw bytes so the oracle
    * reproduces it. flatMap per blob — a row multiplier that stays map-only
    * (no shuffle), exactly how a real frame extractor runs at scale. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[Blob] = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("bytes"))
      .as[Blob]
    blobs.flatMap { b =>
      val nFrames = (b.bytes.length + 63) / 64
      (0 until nFrames).iterator
        .filter(_ % 2 == 0)
        .map { f =>
          val start = f * 64
          val end = math.min(start + 64, b.bytes.length)
          var sum = 0L
          var i = start
          while (i < end) { sum += b.bytes(i) & 0xff; i += 1 }
          Frame(b.doc_id, f.toLong, (end - start).toLong, sum)
        }
    }.toDF()
  }

  case class Resized(doc_id: Long, n_in: Long, n_out: Long, out_sum: Long)

  /** q59: resize/downsample — keep every 4th byte (the stride-subsample
    * stand-in for image resampling; a real kernel swaps the stride loop
    * for bilinear weights). mapPartitions batch shape like the other
    * decode stages; map-only, no shuffle. Output metadata is
    * deterministic arithmetic the oracle reproduces. */
  def blobResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[Blob] = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("bytes"))
      .as[Blob]
    blobs.mapPartitions { it =>
      it.map { b =>
        var i = 0; var sum = 0L; var n = 0L
        while (i < b.bytes.length) { sum += b.bytes(i) & 0xff; n += 1; i += 4 }
        Resized(b.doc_id, b.bytes.length.toLong, n, sum)
      }
    }.toDF()
  }

  case class Features(doc_id: Long, f0: Long, f1: Long, f2: Long, f3: Long,
      f4: Long, f5: Long, f6: Long, f7: Long)

  /** Feature extraction: an 8-bin byte histogram-by-position-class
    * (byte value summed into bin = position mod 8) — the STUB stand-in for
    * an embedding/feature model over decoded media. Per-partition batching
    * via mapPartitions (one model instance per partition), map-only. */
  def blobFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[Blob] = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("bytes"))
      .as[Blob]
    blobs.mapPartitions { it =>
      it.map { b =>
        val bins = new Array[Long](8)
        var i = 0
        while (i < b.bytes.length) { bins(i % 8) += b.bytes(i) & 0xff; i += 1 }
        Features(b.doc_id, bins(0), bins(1), bins(2), bins(3),
          bins(4), bins(5), bins(6), bins(7))
      }
    }.toDF()
  }

  /** q201: perceptual-hash near-dup over the blob column — the aHash
    * image-dedup recipe (split the media into a fixed grid, 1 bit per
    * cell: is the cell brighter than average?) applied to the 1-D byte
    * stand-in: 64 equal chunks, bit_i = "high-character density of
    * chunk i is at least ½" (exact integer cross-multiply, no float),
    * signature = 64-bit word. Candidates block on any of 4 SIXTEEN-bit
    * bands (a hamming-≤3 pair must agree exactly on ≥1 band —
    * pigeonhole): perceptual bits are content-correlated, NOT
    * hash-uniform, so 8-bit bands would admit a quasi-quadratic
    * collision background (the q37 lesson — its 2-bit sign bands were
    * re-banded for exactly this reason); 2¹⁶ band values keep the
    * background linear. The operator is DEFINED as banded-candidates-
    * then-verify: recall is exhaustive for hamming ≤ 3 (pigeonhole
    * over 4 bands) and opportunistic up to the reported ≤ 12 cut (the
    * standard aHash match band). With a real image codec the chunk
    * statistic becomes
    * mean luma of an 8×8 grid cell and NOTHING else changes — the
    * signature algebra, banding, and verify are the real pipeline.
    *
    * Scale shape: signatures are a map-only projection; the pair join
    * is band-blocked equality (never all-pairs); bands come from
    * shift+mask so the sign bit of the 64-bit word never meets a
    * div/mod. */
  def blobPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // signature as two 32-bit halves — sig_lo bits 0-31, sig_hi bits
    // 32-63 — so neither engine ever shifts into a sign bit
    def half(base: Int): org.apache.spark.sql.Column =
      (0 until 32).map { b =>
        val i = base + b
        val chunk = expr(s"substring(text, (length(text) * $i) div 64 + 1, " +
          s"(length(text) * ${i + 1}) div 64 - (length(text) * $i) div 64)")
        val clen = length(chunk)
        val hi = clen - length(translate(chunk, "nopqrstuvwxyz", ""))
        when(hi * 2 >= clen && clen > 0, lit(1L << b)).otherwise(0L)
      }.reduce(_ + _)
    // materialize the narrow signature relation once — the 4 band
    // branches would otherwise each re-run the 64-chunk projection
    // (measured 52s CPU of the 107s total before this checkpoint)
    val sigs = Ckpt(graft.operators.TextOps.docsParallel(spark, dir)
      .where(length($"text") >= 64)
      .select($"doc_id", half(0).as("sig_lo"), half(32).as("sig_hi")),
      eager = false)
    val banded = Seq("sig_lo" -> 0, "sig_lo" -> 16, "sig_hi" -> 0,
      "sig_hi" -> 16).zipWithIndex.map { case ((c, sh), _) =>
      val withBand = sigs.withColumn("band",
        expr(s"shiftright($c, $sh) & 65535"))
      withBand.as("a").join(withBand.as("b"),
          $"a.band" === $"b.band" && $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
          $"a.sig_lo".as("lo_a"), $"a.sig_hi".as("hi_a"),
          $"b.sig_lo".as("lo_b"), $"b.sig_hi".as("hi_b"))
    }.reduce(_ unionByName _)
    banded.distinct()
      .withColumn("hamming",
        expr("bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)").cast("long"))
      .where($"hamming" <= 12)
      .select($"doc_a", $"doc_b", $"lo_a", $"hi_a", $"lo_b", $"hi_b",
        $"hamming")
  }

  /** q283: perceptual-hash radius sweep — q245's tuning table for the
    * BLOB modality: cumulative near-dup pair count and distinct-blob
    * coverage at hamming radius 0..3 over the q201 aHash relation, from
    * ONE banded pass. Soundness: 4 bands of 16 bits mean a pair
    * differing in <= 3 bits can break at most 3 bands, so every pair
    * with hamming <= 3 still agrees on >= 1 band and IS a candidate —
    * the census is exact, not a sample (the q245 argument at q201's
    * geometry). This is how the image-dedup hamming threshold gets
    * picked: what each radius step admits, and how many more blobs it
    * touches.
    *
    * Scale shape: rides q201 (band-equality joins, never all-pairs);
    * the census is a <= 4-row aggregation plus a bounded distinct-doc
    * count per radius. */
  def phashRadius(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = graft.operators.Ckpt(
      blobPhash(spark, dir)
        .where($"hamming" <= 3L)
        .select($"doc_a", $"doc_b", $"hamming"), eager = false)
    val radii = spark.range(4).select($"id".as("radius"))
    val byR = radii.join(pairs, $"hamming" <= $"radius", "left")
    val census = byR.groupBy($"radius").agg(count($"doc_a").as("n_pairs"))
    val covered = byR.where($"doc_a".isNotNull)
      .select($"radius", explode(array($"doc_a", $"doc_b")).as("d"))
      .groupBy($"radius").agg(countDistinct($"d").as("n_docs"))
    census.join(covered, Seq("radius"), "left")
      .select($"radius", $"n_pairs",
        coalesce($"n_docs", lit(0L)).as("n_docs"))
  }
  /** q293: byte-histogram entropy per blob — the corrupt/encrypted/
    * compressed-content detector a media-ingest pipeline runs before
    * wasting decoder time: natural text sits far below the 8-bit
    * ceiling (ln 256 ≈ 5.545), already-compressed or encrypted bytes
    * pin to it, and truncated/zero-padded blobs crater toward 0. Runs
    * on the repo's ASCII blob stand-in (the q39/q40 convention: these
    * documents are single-byte text, so char frequencies ARE byte
    * frequencies).
    *
    * Engine portability: H = −Σ(c/n)·ln(c/n) decomposes into exact
    * long sums of c·lnq(c/n) with the per-TERM 1e4 offset quantization
    * (the q96/q182 ln discipline); ent_e4 is one trunc-div of
    * nonnegatives.
    *
    * Scale shape: one char explode (linear in bytes), one
    * (doc, byte) partial agg, per-doc reduction. At 100 TB with real
    * binary columns the same plan runs over a mapPartitions byte
    * histogram (the blobFeatures shape) — the relational tail is
    * unchanged. */
  def blobEntropy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cnt = Tables.documents(spark, dir)
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy($"doc_id", $"c").agg(count(lit(1)).as("k"))
    val n = cnt.groupBy($"doc_id").agg(sum($"k").as("n"))
    cnt.join(n, Seq("doc_id"))
      .select($"doc_id", $"n",
        ($"k" * floor(log($"k".cast("double") / $"n".cast("double"))
          * 10000 + lit(1.0 / 3)).cast("long")).as("t"))
      .groupBy($"doc_id", $"n")
      .agg(sum($"t").as("s"))
      .select($"doc_id", $"n".as("n_bytes"),
        expr("(-s) div n").as("ent_e4"))
  }
}
