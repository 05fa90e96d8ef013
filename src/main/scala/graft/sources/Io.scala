package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond the canonical parquet tables, plus the
  * partitioned-directory layout that turns shot predicates into directory
  * pruning.
  *
  * The reference's storage boundary is one MDSplus tree per shot
  * (`fdf/factory.py:169-202`) — `writePartitioned(df, path, "shot")` is
  * that layout in a Spark warehouse: a `WHERE shot = n` never lists, let
  * alone reads, any other shot's files (`PartitionFilters` in the scan).
  * CSV/JSON exist for interchange at the edges (logbook exports, event
  * dumps); ORC as the alternate columnar store. All readers take explicit
  * schemas — schema inference is an extra full pass at 100 TB.
  */
object Io {

  /** Hive-style partitioned parquet: one directory per distinct value of
    * `cols`; equality/IN predicates on them prune at file-listing time. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Resolve a signal's storage under a warehouse root. The PREFERRED
    * layout is the shot-partitioned directory `<root>/<qualified_name>/`
    * (hive dirs `shot=N/…` — the Spark form of the reference's one-tree-
    * per-shot granularity, `fdf/factory.py:169-202`): a `shot = n`
    * predicate then prunes at file-LISTING time, which is what the hot
    * path needs at 100 TB — row-group stats on a flat file still list and
    * open every file. Falls back to the flat single-file
    * `<root>/<qualified_name>.parquet` when no directory exists. */
  def signalPath(dataDir: String, qualifiedName: String): String = {
    val base = s"$dataDir/${qualifiedName.replace('.', '_')}"
    if (new java.io.File(base).isDirectory) base else s"$base.parquet"
  }

  /** Write a signal table in the preferred shot-partitioned layout at the
    * path `signalPath` resolves first. */
  def writeSignal(df: DataFrame, dataDir: String, qualifiedName: String): Unit =
    writePartitioned(df, s"$dataDir/${qualifiedName.replace('.', '_')}", "shot")

  /** Inferred parquet schema per path, cached for the JVM lifetime —
    * the Tables.load footer-inference cache, shared with the signal
    * read path (same layout-immutability assumption: read-only testdata
    * / write-once signal directories). Metadata only; scans, pruning
    * and results are unchanged. */
  private val schemas =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val sch = schemas.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
