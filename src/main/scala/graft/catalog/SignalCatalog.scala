package graft.catalog

import scala.xml.{Elem, Node, XML}

import org.apache.spark.sql.types._

/** Metadata-driven signal catalog (SURVEY §1.3-1.4): the engine's
  * replacement for the reference's runtime-synthesized container tree
  * (`/root/reference/fdf/factory.py:654-791`). XML files declare a
  * container hierarchy of signals/axes/nodes; this parser resolves the
  * same inheritance semantics into flat, immutable `SignalMeta` rows that
  * drive schemas, ingest normalization, and the SignalFrame API:
  *
  *  - tree defaults from the enclosing container, overridable per element
  *    (reference `factory.py:1055-1059`)
  *  - path prefixes join container path + element node
  *    (`factory.py:1030-1052`)
  *  - units inherit from the container when absent (`factory.py:1002-1009`)
  *  - time-first canonical axis order, recording the transpose permutation
  *    to apply at ingest (`factory.py:970-987,194-195`)
  *  - channel range fan-out `range="1,16[,pad]"` -> ch01..ch16 with
  *    explicit or ceil(log10) zero-padding (`factory.py:935-966`)
  *  - `[template]` string substitution instantiating one container per
  *    discovered run (`modules/equilibria/_preprocess.py:19-42`)
  *  - per-signal error node (`factory.py:1012-1024`) and `dim_of`
  *    time-base indirection (`factory.py:188-189`)
  *
  * Unlike the reference, each signal keeps its own axis bindings — the
  * filterscope per-signal-time-base *intent* (SURVEY §1.5), which the long
  * data format makes free.
  */
final case class AxisMeta(name: String, path: String, units: Option[String])

final case class SignalMeta(
    qualifiedName: String,
    diagnostic: String,
    tree: String,
    path: String,
    units: Option[String],
    declaredAxes: Seq[String],
    axes: Seq[String], // canonical: time first
    transpose: Option[Seq[Int]], // permutation declared -> canonical, if any
    axisMeta: Seq[AxisMeta],
    errorPath: Option[String],
    dimOf: Option[Int],
    title: Option[String] = None, // display title (reference factory.py:925,952-954)
    desc: Option[String] = None) {
  /** Long-format schema for this signal's table: (shot, time-first axes…,
    * value[, value_err]) with units/title/desc carried as column
    * metadata — the reference's per-signal display metadata
    * (`factory.py:925,1002-1009`) in its Spark-native home. */
  def schema: StructType = {
    def fieldMeta(u: Option[String], t: Option[String] = None,
        d: Option[String] = None): Metadata = {
      val b = new MetadataBuilder()
      u.foreach(b.putString("units", _))
      t.foreach(b.putString("title", _))
      d.foreach(b.putString("desc", _))
      b.build()
    }
    val axisFields = axes.map { a =>
      val am = axisMeta.find(_.name == a)
      StructField(a, DoubleType, nullable = false, fieldMeta(am.flatMap(_.units)))
    }
    StructType(
      (StructField("shot", IntegerType, nullable = false) +:
        axisFields :+
        StructField("value", DoubleType, nullable = false,
          fieldMeta(units, title, desc)) :+
        StructField("value_err", DoubleType, nullable = true))
        .filter(f => f.name != "value_err" || errorPath.isDefined))
  }
}

final case class SignalCatalog(signals: Seq[SignalMeta]) {
  private lazy val byName = signals.map(s => s.qualifiedName -> s).toMap
  def signal(qualifiedName: String): SignalMeta = byName(qualifiedName)
  def get(qualifiedName: String): Option[SignalMeta] = byName.get(qualifiedName)
  def diagnostics: Seq[String] = signals.map(_.diagnostic).distinct
  def forDiagnostic(d: String): Seq[SignalMeta] = signals.filter(_.diagnostic == d)
  def ++(other: SignalCatalog): SignalCatalog = SignalCatalog(signals ++ other.signals)
}

object SignalCatalog {

  /** Parse one diagnostic XML; `templates` instantiates `[name]`
    * placeholders once per value (empty seq = no templating applied). */
  def fromXml(xml: Elem, templates: Map[String, Seq[String]] = Map.empty): SignalCatalog = {
    val expansions: Seq[String => String] =
      templates.toSeq.sortBy(_._1) match {
        case Seq() => Seq(identity[String] _)
        case kvs =>
          kvs.foldLeft(Seq(identity[String] _)) { case (acc, (key, values)) =>
            for (f <- acc; v <- values) yield (s: String) => f(s).replace(s"[$key]", v)
          }
      }
    SignalCatalog(expansions.flatMap(sub => parseContainer(xml, Context.root(sub))))
  }

  def fromFile(path: String, templates: Map[String, Seq[String]] = Map.empty): SignalCatalog =
    fromXml(XML.loadFile(path), templates)

  private case class Context(
      sub: String => String,
      namePrefix: String,
      diagnostic: String,
      tree: String,
      path: String,
      units: Option[String],
      axes: Map[String, AxisMeta])

  private object Context {
    def root(sub: String => String): Context =
      Context(sub, "", "", "", "", None, Map.empty)
  }

  private def attr(n: Node, a: String): Option[String] =
    n.attribute(a).map(_.text).filter(_.nonEmpty)

  /** First present of several attribute spellings — accepts both this
    * engine's dialect (tree/path/node) and the reference's MDSplus one
    * (mdstree/mdspath/mdsnode, `factory.py:1030-1060`), so the catalog
    * loads the reference's own module XML unchanged. */
  private def attrA(n: Node, names: String*): Option[String] =
    names.iterator.flatMap(attr(n, _)).nextOption()

  /** Join a container path and an element node: absolute nodes (leading
    * backslash) replace the prefix; a leading dot concatenates verbatim;
    * otherwise dot-join like the reference's `'.'.join([mdspath, node])`
    * (`factory.py:1047`). */
  private def joinPath(prefix: String, node: String): String =
    if (node.startsWith("\\") || prefix.isEmpty) node
    else if (node.isEmpty) prefix
    else if (node.startsWith(".")) prefix + node
    else prefix + "." + node

  private def parseContainer(e: Node, parent: Context): Seq[SignalMeta] = {
    val name = parent.sub(attr(e, "name").getOrElse(""))
    val qualified =
      if (parent.namePrefix.isEmpty) name else s"${parent.namePrefix}.$name"
    val ctx0 = parent.copy(
      namePrefix = qualified,
      diagnostic = if (parent.diagnostic.isEmpty) name else parent.diagnostic,
      tree = parent.sub(attrA(e, "tree", "mdstree").getOrElse(parent.tree)),
      path = joinPath(parent.path, parent.sub(attrA(e, "path", "mdspath").getOrElse(""))),
      units = attr(e, "units").orElse(parent.units))
    // DOCUMENT ORDER: an axis declaration shadows the previous same-named
    // axis for the signals that FOLLOW it (each signal binds the axes
    // visible at its position — the per-signal-time-base intent of the
    // reference's filterscopes, SURVEY §1.5, which its parser loses by
    // binding every signal to the last-parsed axis)
    val (_, out) = e.child.foldLeft((ctx0, Vector.empty[SignalMeta])) {
      case ((c, acc), child) => child.label match {
        case "axis" =>
          val an = attr(child, "name").get
          val c2 = c.copy(axes = c.axes + (an -> AxisMeta(
            an,
            joinPath(c.path, c.sub(attrA(child, "node", "mdsnode").getOrElse(""))),
            attr(child, "units").orElse(c.units))))
          (c2, acc)
        case "signal" => (c, acc ++ parseSignal(child, c))
        case "container" => (c, acc ++ parseContainer(child, c))
        case _ => (c, acc)
      }
    }
    out
  }

  private def parseSignal(s: Node, ctx: Context): Seq[SignalMeta] = {
    val baseName = ctx.sub(attr(s, "name").get)
    val node = ctx.sub(attrA(s, "node", "mdsnode").getOrElse(""))
    val declaredAxes = attr(s, "axes").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    // canonical order: time first, remaining axes in declared order
    val canonical =
      if (declaredAxes.contains("time"))
        "time" +: declaredAxes.filterNot(_ == "time")
      else declaredAxes
    val transpose =
      if (canonical == declaredAxes) None
      else Some(canonical.map(declaredAxes.indexOf(_)))
    val units = attr(s, "units").orElse(ctx.units)
    val err = attr(s, "error").map(er => joinPath(ctx.path, ctx.sub(er)))
    val dimOf = attr(s, "dim_of").map(_.toInt)
    val axisMeta = canonical.flatMap(ctx.axes.get)
    val title = attr(s, "title").map(ctx.sub)
    val desc = attr(s, "desc").map(ctx.sub)

    def meta(name: String, nodeStr: String, t: Option[String] = title): SignalMeta =
      SignalMeta(
        qualifiedName = s"${ctx.namePrefix}.$name",
        diagnostic = ctx.diagnostic,
        tree = ctx.tree,
        path = joinPath(ctx.path, nodeStr),
        units = units,
        declaredAxes = declaredAxes,
        axes = canonical,
        transpose = transpose,
        axisMeta = axisMeta,
        errorPath = err,
        dimOf = dimOf,
        title = t,
        desc = desc)

    attr(s, "range") match {
      case None => Seq(meta(baseName, node))
      case Some(r) =>
        // reference semantics (`factory.py:936-950`): 1 field = 0 until v;
        // 2 fields = inclusive; 3rd field = explicit zero-pad digits,
        // default ceil(log10(endExclusive - 1))
        val parts = r.split(",").map(_.trim)
        val (start, endExcl) =
          if (parts.length == 1) (0, parts(0).toInt)
          else (parts(0).toInt, parts(1).toInt + 1)
        val pad =
          if (parts.length > 2) parts(2).toInt
          else math.ceil(math.log10((endExcl - 1).toDouble)).toInt
        (start until endExcl).map { ch =>
          val chs = s"%0${pad}d".format(ch)
          // title carries the channel index too — the reference formats
          // `title.format(str(index).zfill(digits))` (factory.py:952-954)
          meta(baseName.replace("{}", chs) match {
            case n if n == baseName => s"$baseName$chs" // no placeholder: suffix
            case n => n
          }, node.replace("{}", chs), title.map(_.replace("{}", chs)))
        }
    }
  }
}
