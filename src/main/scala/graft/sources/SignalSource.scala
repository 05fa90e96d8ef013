package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{FieldReference, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 signal source (SURVEY §2.1 S1 — the reference's MDSplus
  * scan, `fdf/factory.py:169-202`, re-expressed as a Spark connector).
  * The reference fetches one signal trace per (tree, node) over TCP; this
  * source generates deterministic traces server-side and demonstrates the
  * two contracts a real remote-tree connector needs at 100 TB:
  *
  *  - `SupportsPushDownFilters` on `shot`/`channel`: the scan plans one
  *    input partition per (shot, channel) and pushed predicates PRUNE
  *    PARTITIONS — the connector never materializes unrequested traces,
  *    exactly like the reference's per-signal lazy fetch, but parallel.
  *  - `SupportsPushDownRequiredColumns`: readers emit only projected
  *    columns (a time-only or value-only scan does not compute the rest).
  *  - `SupportsPushDownAggregates` (partial) on COUNT(*) / MIN(time) /
  *    MAX(time) grouped by shot/channel: each partition answers from
  *    trace METADATA (point count, dt) without generating a single
  *    sample — the "server computes the summary" shape that turns a
  *    100 TB trace-count query into one row per trace over the wire.
  *    Spark merges the per-partition partials (sum of counts, min of
  *    mins), so grouping sets that span partitions stay correct.
  *
  * Trace model (deterministic, unit-testable): value(shot, ch, i) =
  * sin(2π·f·i·dt) scaled by channel, f = 5 + (shot mod 7), plus a linear
  * drift. Options: shots="lo:hi", channels=n, points=n, dt=seconds.
  */
class SignalSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SignalSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SignalTable(new CaseInsensitiveStringMap(properties))
}

object SignalSource {
  val schema: StructType = StructType(Seq(
    StructField("shot", IntegerType, nullable = false),
    StructField("channel", IntegerType, nullable = false),
    StructField("time", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  def value(shot: Int, channel: Int, i: Int, dt: Double): Double = {
    val f = 5.0 + (shot % 7)
    val t = i * dt
    channel * math.sin(2.0 * math.Pi * f * t) + 0.01 * i
  }
}

class SignalTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_signals"
  override def schema(): StructType = SignalSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(o)
    new SignalScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

class SignalScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var requiredSchema: StructType = SignalSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[PushedSignalAgg] = None
  private var pushedLimit: Option[Int] = None

  /** LIMIT n caps every partition's emitted rows at n (the global limit
    * still applies post-scan; this stops each trace read after n samples
    * instead of materializing the full trace). */
  override def pushLimit(limit: Int): Boolean = {
    if (pushedAgg.isEmpty) pushedLimit = Some(limit)
    pushedLimit.isDefined
  }

  override def pruneColumns(s: StructType): Unit =
    if (pushedAgg.isEmpty) requiredSchema = s

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
      case _ => None
    }

  /** Accept COUNT(*) / MIN(time) / MAX(time) / MIN|MAX(shot|channel)
    * grouped by any subset of (shot, channel): every accepted aggregate is
    * answerable from trace metadata alone. Partial pushdown only — groups
    * can span input partitions, Spark merges. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val groups = agg.groupByExpressions.toSeq.map(refName)
    if (groups.exists(g => !g.exists(Set("shot", "channel")))) return false
    val aggs: Seq[Option[PushedAggCol]] = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(CountStarCol)
      case m: Min => refName(m.column).collect {
        case "time" => MinTimeCol
        case "shot" => MinKeyCol("shot")
        case "channel" => MinKeyCol("channel") }
      case m: Max => refName(m.column).collect {
        case "time" => MaxTimeCol
        case "shot" => MaxKeyCol("shot")
        case "channel" => MaxKeyCol("channel") }
      case _ => None
    }
    if (aggs.exists(_.isEmpty)) return false
    val p = PushedSignalAgg(groups.map(_.get), aggs.map(_.get))
    pushedAgg = Some(p)
    requiredSchema = p.schema
    true
  }

  // accept shot/channel predicates (they prune partitions); everything
  // else stays in Spark's post-scan Filter
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo(a, _) => a == "shot" || a == "channel"
      case In(a, _) => a == "shot" || a == "channel"
      case GreaterThan(a, _) => a == "shot" || a == "channel"
      case GreaterThanOrEqual(a, _) => a == "shot" || a == "channel"
      case LessThan(a, _) => a == "shot" || a == "channel"
      case LessThanOrEqual(a, _) => a == "shot" || a == "channel"
      case _ => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SignalScan(options, requiredSchema, pushed, pushedAgg, pushedLimit)
}

/** One accepted pushed aggregate column. */
sealed trait PushedAggCol { def field: StructField }
case object CountStarCol extends PushedAggCol {
  val field = StructField("agg_count", LongType, nullable = false) }
case object MinTimeCol extends PushedAggCol {
  val field = StructField("agg_min_time", DoubleType, nullable = false) }
case object MaxTimeCol extends PushedAggCol {
  val field = StructField("agg_max_time", DoubleType, nullable = false) }
case class MinKeyCol(key: String) extends PushedAggCol {
  val field = StructField(s"agg_min_$key", IntegerType, nullable = false) }
case class MaxKeyCol(key: String) extends PushedAggCol {
  val field = StructField(s"agg_max_$key", IntegerType, nullable = false) }

case class PushedSignalAgg(groupCols: Seq[String], aggCols: Seq[PushedAggCol]) {
  def schema: StructType = StructType(
    groupCols.map(g => SignalSource.schema(g)) ++ aggCols.map(_.field))
}

case class SignalInputPartition(shot: Int, channel: Int, points: Int,
    dt: Double) extends InputPartition

class SignalScan(options: CaseInsensitiveStringMap,
    requiredSchema: StructType, pushed: Array[Filter],
    pushedAgg: Option[PushedSignalAgg] = None,
    pushedLimit: Option[Int] = None)
    extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_signals PushedFilters: ${pushed.mkString("[", ", ", "]")}" +
      pushedAgg.fold("")(a => s", PushedAggregation: groupBy=${a.groupCols
        .mkString(",")} aggs=${a.aggCols.map(_.field.name).mkString(",")}")

  private def keep(col: String, v: Int): Boolean = pushed.forall {
    case EqualTo(a, x) if a == col => x.asInstanceOf[Number].intValue == v
    case In(a, xs) if a == col => xs.exists(_.asInstanceOf[Number].intValue == v)
    case GreaterThan(a, x) if a == col => v > x.asInstanceOf[Number].intValue
    case GreaterThanOrEqual(a, x) if a == col => v >= x.asInstanceOf[Number].intValue
    case LessThan(a, x) if a == col => v < x.asInstanceOf[Number].intValue
    case LessThanOrEqual(a, x) if a == col => v <= x.asInstanceOf[Number].intValue
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val Array(lo, hi) = options.getOrDefault("shots", "141000:141004").split(":").map(_.toInt)
    val channels = options.getOrDefault("channels", "4").toInt
    val points = options.getOrDefault("points", "1000").toInt
    val dt = options.getOrDefault("dt", "0.001").toDouble
    // one partition per (shot, channel): pushed filters prune HERE, so an
    // unselected trace is never generated/fetched; a pushed LIMIT caps the
    // per-trace sample count at the source
    val cap = pushedLimit.fold(points)(math.min(points, _))
    (for {
      shot <- lo to hi if keep("shot", shot)
      ch <- 1 to channels if keep("channel", ch)
    } yield SignalInputPartition(shot, ch, cap, dt): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    pushedAgg match {
      case Some(a) => new SignalAggReaderFactory(a)
      case None => new SignalReaderFactory(requiredSchema)
    }
}

/** Aggregate-pushdown reader: one pre-aggregated row per (shot, channel)
  * partition, computed from trace metadata — no samples generated. */
class SignalAggReaderFactory(agg: PushedSignalAgg)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SignalInputPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        def key(k: String): Int = if (k == "shot") sp.shot else sp.channel
        val groups: Seq[Any] = agg.groupCols.map(key)
        val aggs: Seq[Any] = agg.aggCols.map {
          case CountStarCol => sp.points.toLong
          case MinTimeCol => 0.0
          case MaxTimeCol => (sp.points - 1) * sp.dt
          case MinKeyCol(k) => key(k)
          case MaxKeyCol(k) => key(k)
        }
        InternalRow.fromSeq((groups ++ aggs).toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

class SignalReaderFactory(requiredSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SignalInputPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      // projection: emit only required columns, in requested order
      private val emit: Array[Int => Any] = requiredSchema.fields.map { f =>
        f.name match {
          case "shot"    => (_: Int) => sp.shot
          case "channel" => (_: Int) => sp.channel
          case "time"    => (i: Int) => i * sp.dt
          case "value"   => (i: Int) => SignalSource.value(sp.shot, sp.channel, i, sp.dt)
        }
      }
      override def next(): Boolean = { i += 1; i < sp.points }
      override def get(): InternalRow =
        InternalRow.fromSeq(emit.map(_(i)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
