package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{Metadata, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 `TableCatalog` over the XML signal catalog — the SQL
  * address path the reference exposes through its attribute-chain factory
  * (`nstx.mpts.te`, `fdf/factory.py:654-686`), re-expressed so plain SQL
  * resolves signals by their catalog-qualified name:
  *
  * {{{
  * spark.conf:
  *   spark.sql.catalog.graft         = graft.catalog.GraftTableCatalog
  *   spark.sql.catalog.graft.xml     = /path/to/machine.xml   (file or dir)
  *   spark.sql.catalog.graft.dataDir = /path/to/warehouse
  * sql:
  *   SELECT time, value FROM graft.mpts.te WHERE shot = 141000
  * }}}
  *
  * A signal `mpts.te` becomes table `te` in namespace `mpts` (container
  * nesting = namespace nesting); its data is the long-format parquet at
  * `dataDir/mpts_te.parquet` — the same layout `api.Machine` reads. The
  * returned table is Spark's own DSv2 `ParquetTable`, so EVERYTHING the
  * native scan does comes for free at any scale: filter pushdown to row
  * groups, column pruning, and — when the layout is hive-partitioned by
  * shot — partition PRUNING on shot predicates (PlanShapeSpec pins that
  * plan shape). The catalog itself only resolves names; it holds no data
  * path state beyond the warehouse root.
  *
  * Options:
  *  - `xml`          (required) catalog XML file, or a directory whose
  *                   *.xml files are merged (a module tree like the
  *                   reference's `fdf/modules/`)
  *  - `dataDir`      (required) warehouse root holding one parquet
  *                   file/dir per signal, named `<qualified>_<name>`
  *  - `stripPrefix`  optional qualified-name prefix to drop (e.g. a
  *                   synthetic root container), so `root.mpts.te` is
  *                   addressed as `mpts.te`
  *  - `template.K=v1,v2` instantiates `[K]` template containers per run
  *                   (the EFIT pattern), one branch per value
  */
class GraftTableCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var dataDir: String = _
  private var cat: SignalCatalog = _

  override def name(): String = catalogName

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dataDir = Option(options.get("dataDir")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name: dataDir option is required"))
    val xml = Option(options.get("xml")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name: xml option is required"))
    val templates: Map[String, Seq[String]] = options.asScala.toMap.collect {
      case (k, v) if k.startsWith("template.") =>
        k.stripPrefix("template.") -> v.split(",").map(_.trim).toSeq
    }
    val f = new java.io.File(xml)
    val merged =
      if (f.isDirectory)
        // listFiles returns null on I/O error / permission failure — that
        // must be a clear config error, not an NPE mid-initialize
        Option(f.listFiles((_, n) => n.endsWith(".xml"))).getOrElse(
            throw new IllegalArgumentException(
              s"catalog $name: cannot list xml dir $xml")).sortBy(_.getName)
          .map(x => SignalCatalog.fromFile(x.getPath, templates))
          .reduceOption(_ ++ _)
          .getOrElse(SignalCatalog(Nil))
      else SignalCatalog.fromFile(xml, templates)
    val prefix = Option(options.get("stripPrefix")).map(p =>
      if (p.endsWith(".")) p else p + ".")
    cat = prefix.fold(merged)(p =>
      SignalCatalog(merged.signals.map(s =>
        s.copy(qualifiedName = s.qualifiedName.stripPrefix(p)))))
  }

  private def qualified(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    // DIRECT children only (Spark's per-level enumeration convention —
    // nested containers surface through listNamespaces, not here)
    val direct = cat.signals.map(_.qualifiedName.split('.'))
      .filter(parts => parts.init.toSeq == namespace.toSeq)
    if (direct.isEmpty && namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    direct.map(parts => Identifier.of(parts.init, parts.last)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    cat.get(qualified(ident)).isDefined

  override def loadTable(ident: Identifier): Table = {
    val qn = qualified(ident)
    val meta = cat.get(qn).getOrElse(throw new NoSuchTableException(ident))
    // same layout resolution as api.Machine: shot-partitioned directory
    // preferred (directory pruning), flat file fallback
    val path = graft.sources.Io.signalPath(dataDir, qn)
    // column TYPES and presence come from the files (the XML declares axis
    // NAMES; value_err is per-layout) — but the XML-declared units/title
    // metadata must ride along, so an FDF user's `DESCRIBE graft.chers.ti`
    // carries 'keV' the way the API path's StructField metadata does
    // (reference parse_units, factory.py:1002-1009). Infer the file schema
    // once, then re-attach declared per-column metadata by name.
    val inferred = ParquetTable(qn, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(path), None, classOf[ParquetFileFormat])
    val declared = meta.schema
    val merged = StructType(inferred.schema.fields.map { f =>
      declared.fields.find(_.name == f.name)
        .filter(_.metadata != Metadata.empty)
        .map { d =>
          // DESCRIBE renders only the comment — surface "title [units]"
          // there so plain SQL users see what the API path's StructField
          // metadata carries
          val label = Seq(
            if (d.metadata.contains("title")) Some(d.metadata.getString("title")) else None,
            if (d.metadata.contains("units")) Some(s"[${d.metadata.getString("units")}]") else None
          ).flatten.mkString(" ")
          val withMeta = f.copy(metadata = d.metadata)
          if (label.nonEmpty) withMeta.withComment(label) else withMeta
        }
        .getOrElse(f)
    })
    ParquetTable(qn, SparkSession.active, CaseInsensitiveStringMap.empty(),
      Seq(path), Some(merged), classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")

  // ---- namespaces: every qualified-name prefix is a namespace ----
  // computed once per initialize (the catalog is immutable after load);
  // every SQL resolution touches this, some twice
  private lazy val allNamespaces: Seq[Seq[String]] =
    cat.signals.flatMap { s =>
      val parts = s.qualifiedName.split('.').init
      (1 to parts.length).map(parts.take(_).toSeq)
    }.distinct

  override def listNamespaces(): Array[Array[String]] =
    allNamespaces.filter(_.length == 1).map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    allNamespaces.filter(ns =>
      ns.length == namespace.length + 1 && ns.startsWith(namespace.toSeq))
      .map(_.toArray).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    allNamespaces.contains(namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only (XML-declared)")
}
