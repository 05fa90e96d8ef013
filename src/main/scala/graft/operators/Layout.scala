package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Physical-layout planning operators — the write-path side of 100 TB
  * efficiency. Partition pruning (sources.Io) and bucketing
  * (sources.Bucketing) are read-path structures; z-ordering is the
  * complementary WRITE-path structure: co-locate rows that multi-
  * dimensional filters select together, so min/max row-group stats prune
  * files on EITHER dimension (the Delta/Iceberg OPTIMIZE ZORDER idea,
  * from public literature on space-filling curves).
  */
object Layout {

  /** Bit-interleave two 8-bit dimensions into a 16-bit Morton (z-order)
    * key — pure integer arithmetic, so any engine lands on the same key. */
  private[graft] def morton8(d1: Column, d2: Column): Column =
    (0 until 8).map { i =>
      ((shiftright(d1, i) % 2) * (1L << (2 * i + 1))) +
        ((shiftright(d2, i) % 2) * (1L << (2 * i)))
    }.reduce(_ + _).cast("long")

  /** q104: z-order layout keys for the documents table over the two
    * dimensions curation queries actually filter on — length band
    * (n_chars/4, capped to 8 bits) and language (hash-bucketed to 8
    * bits). `file_id = zkey div 1024` is the 64-file range assignment a
    * writer would use: after `repartitionByRange(file_id)`, a filter on
    * EITHER lang or a length band touches O(sqrt(files)) of them
    * instead of all — that's the whole point of the curve.
    *
    * Scale shape: the key is a map-only projection (16 integer terms,
    * inside whole-stage codegen); the write-path repartitionByRange it
    * feeds is one range shuffle with sampled bounds. Nothing here ever
    * aggregates or joins. */
  def zorderKeys(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dLen = least(expr("n_chars div 4"), lit(255L)).cast("long")
    val dLang = (Sampling.hash32("zlang", $"lang") % 256).cast("long")
    Tables.documents(spark, dir)
      .select($"doc_id", dLen.as("d_len"), dLang.as("d_lang"))
      .withColumn("zkey", morton8($"d_len", $"d_lang"))
      .withColumn("file_id", expr("zkey div 1024"))
  }
}
