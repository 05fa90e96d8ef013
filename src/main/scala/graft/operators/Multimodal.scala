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
}
