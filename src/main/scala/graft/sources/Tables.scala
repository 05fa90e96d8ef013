package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed star-schema catalog over the driver-generated test data
  * (TESTDATA.md). Mirrors the reference's source surface: the logbook /
  * signal scans of FDF (`fdf/factory.py:169-202,537-542` in the reference)
  * become plain columnar parquet scans here — Catalyst handles predicate
  * pushdown, column pruning and partition pruning that the reference
  * hand-rolled into SQL strings.
  *
  * At 100 TB these tables would be partitioned (e.g. by date / shot) and
  * the loaders below would pick up partition directories transparently;
  * nothing in the query layer assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet footer schema per path, inferred once per JVM: every
    * `load` call otherwise re-reads a footer on the DRIVER to infer the
    * same schema (10-40 ms per table reference, paid by every query of
    * a bench/verify run). Metadata-only and layout-immutable by the
    * [[narrowScan]] cache's same assumption (read-only testdata /
    * write-once warehouse); the DATA path is untouched — scans,
    * pushdown and row results are identical. */
  private val schemas =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val sch = schemas.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** True iff the parquet source at `dir/name` scans with fewer splits
    * than the cluster has cores. A single-row-group file (like the test
    * driver's one-file-per-table layout) decodes as ONE task no matter how
    * it is byte-split, so any CPU-dense map-side work behind it — expand,
    * decimal partial aggregation, regex scoring, window group-limits —
    * serializes on one core. Cached per path — the probe plans a bare
    * scan once per session (no job runs); the cache assumes source
    * layouts are immutable within a session (true for the read-only
    * testdata and any write-once warehouse layout). */
  private val splitCounts = scala.collection.concurrent.TrieMap.empty[String, Int]
  private def narrowScan(spark: SparkSession, dir: String, name: String): Boolean = {
    val path = s"$dir/$name.parquet"
    val n = splitCounts.getOrElseUpdate(path, load(spark, dir, name).rdd.getNumPartitions)
    n < spark.sparkContext.defaultParallelism
  }

  /** Spread `df` (typically a pruned/filtered projection of `dir/name`)
    * across all cores when — and only when — the underlying scan is
    * narrower than the cluster: hash-partitioned on `by` when given
    * (pick a high-cardinality key, or the downstream shuffle key so the
    * exchange also satisfies that distribution), round-robin otherwise.
    * On any real at-scale layout (many files / many row groups) the scan
    * is already wide and this is a no-op, so cluster plans are unchanged;
    * on a narrow layout it converts "decode + compute on one core" into
    * "decode + small exchange, compute on all cores". */
  def rebalance(spark: SparkSession, dir: String, name: String,
      df: DataFrame, by: org.apache.spark.sql.Column*): DataFrame =
    if (!narrowScan(spark, dir, name)) df
    else if (by.isEmpty) df.repartition(spark.sparkContext.defaultParallelism)
    else df.repartition(spark.sparkContext.defaultParallelism, by: _*)

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** The events table's `ts` column has shipped in two physical layouts
    * across testdata generations: parquet TIMESTAMP(NANOS) (which the
    * vectorized reader rejects — read as long via the legacy conf, then
    * rebuild a microsecond TIMESTAMP) and plain TIMESTAMP(MICROS)
    * (inferred as TIMESTAMP_NTZ since Spark infers NTZ for
    * isAdjustedToUTC=false). Normalize BOTH to a session-UTC
    * `TimestampType` column so every downstream operator sees one shape;
    * the NTZ→TZ cast reinterprets the naive wall-clock as UTC, exactly
    * how the DuckDB oracle's naive TIMESTAMP epoch math treats it.
    *
    * The nanosAsLong conf is session-global and must stay set while the
    * plan executes (it is captured at physical planning, not here), so it
    * cannot be set/restored around this call. Our own entry points
    * (Bench/Verify/tests) set it at session construction; for sessions we
    * don't build (the driver's smoke session) we set it here — silently,
    * since on a MICROS layout it is simply inert. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** Shared ts normalization for the batch and stream event readers. */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as epoch-nanos long
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => // TIMESTAMP(MICROS), naive — wall clock is UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
