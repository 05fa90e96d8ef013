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
}
