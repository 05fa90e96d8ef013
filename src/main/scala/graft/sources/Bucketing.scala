package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §7.6 scale notes).
  *
  * Writing both sides of a hot join bucketed AND sorted by the join key
  * lets Spark plan a sort-merge join with NO exchange and NO sort on
  * either side — the shuffle is paid once at write time, then every
  * subsequent join/aggregation on that key is map-side. At 100 TB this is
  * the difference between re-shuffling the fact table per query and
  * never shuffling it; the bucket count is the write-time knob that must
  * match (or divide) across co-bucketed tables.
  *
  * (The reference's analogue is its per-shot tree layout — data arrives
  * pre-partitioned by shot, `fdf/factory.py:378-394`; bucketing is how a
  * Spark warehouse makes that layout explicit to the planner.)
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`, replacing
    * any previous registration of `table`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Write `df` PARTITIONED by `partCol` (directory-level pruning: a
    * probe filtering on partCol scans only matching directories) AND
    * bucketed+sorted by `key` within each partition (key joins/aggs are
    * merge-ready without a per-query exchange on this side). The layout
    * for probe-then-join artifacts — e.g. the IVF-PQ codes table: cell
    * partitions bound probe bytes to nprobe/k of the table, vec_id
    * buckets keep the candidate join co-located. */
  def writePartitionedBucketed(df: DataFrame, table: String, path: String,
      partCol: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
