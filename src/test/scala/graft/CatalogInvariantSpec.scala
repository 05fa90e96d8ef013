package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row

import graft.api.SignalFrame
import graft.catalog.{SignalCatalog, SignalMeta}

/** The engine twin of the reference's whole-surface plot invariant
  * (`/root/reference/tests/tests.py:95-112` walks every container
  * attribute and asserts every signal has a callable `plot`): here,
  * EVERY signal declared by EVERY reference module XML must drive the
  * full read path end-to-end — catalog parse → long-format schema →
  * axis slice → bounded `collectTrace` (the plot-sink boundary, SURVEY
  * S11) — on synthetic data shaped exactly by its declared schema. A
  * catalog row this test can't push through slice→collect would be a
  * signal a user could list but not plot, the exact regression the
  * reference test exists to catch. */
class CatalogInvariantSpec extends SparkSpec {

  private val refModules = "/root/reference/fdf/modules"
  // every module XML the reference ships (equilibria.xml declares only
  // containers — it parses to an empty catalog and contributes 0);
  // efit.xml needs its [efit] run-template instantiated, same as the
  // reference factory does per-shot
  private val moduleXmls = Seq(
    "bes/bes.xml", "chers/chers.xml", "equilibria/equilibria.xml",
    "equilibria/efit.xml", "filterscopes/filterscopes.xml", "ip/ip.xml",
    "magnetics/magnetics.xml", "mpts/mpts.xml", "usxr/usxr.xml",
    "vloop/vloop.xml")
  private val templates = Map("efit" -> Seq("efit01", "lrdfit01"))

  // 2 shots × (4 time points × 3^(rank-1) spatial points), value a
  // deterministic function of the coordinates, value_err present iff
  // the declaration carries an error node
  private def synthetic(meta: SignalMeta) = {
    val timeGrid = Seq(0.0, 0.1, 0.2, 0.3)
    val otherGrid = Seq(0.0, 1.0, 2.0)
    def combos(axes: Seq[String]): Seq[Seq[Double]] = axes match {
      case Seq() => Seq(Seq.empty)
      case a +: rest =>
        val g = if (meta.axes.headOption.contains(a)) timeGrid else otherGrid
        for (v <- g; tail <- combos(rest)) yield v +: tail
    }
    val hasErr = meta.schema.fieldNames.contains("value_err")
    val rows: Seq[Row] = for {
      shot <- Seq(1, 2); ax <- combos(meta.axes)
    } yield Row.fromSeq(
      (shot +: ax :+ (ax.sum + shot)) ++ (if (hasErr) Seq(0.5) else Nil))
    spark.createDataFrame(rows.asJava, meta.schema)
  }

  test("every declared signal of every reference module XML drives slice -> collectTrace end-to-end") {
    var nSignals = 0
    val perModule = scala.collection.mutable.LinkedHashMap[String, Int]()
    for (x <- moduleXmls) {
      val cat = SignalCatalog.fromFile(s"$refModules/$x", templates)
      perModule(x) = cat.signals.length
      for (meta <- cat.signals) {
        nSignals += 1
        val sf = SignalFrame(meta, synthetic(meta))
        val trace =
          if (meta.axes.isEmpty) sf.collectTrace()
          else sf.slice(meta.axes.head, 0.05, 0.35).collectTrace()
        val expected =
          if (meta.axes.isEmpty) 2
          else 2 * 3 * math.pow(3, meta.axes.size - 1).toInt
        assert(trace.length === expected,
          s"${meta.qualifiedName} (axes=${meta.axes}) sliced trace size")
        // the trace is plot-ready: value present, axes ordered, and the
        // declared display metadata survived into the collected schema
        assert(trace.head.schema.fieldNames.contains("value"),
          meta.qualifiedName)
        meta.units.foreach { u =>
          assert(trace.head.schema("value").metadata.getString("units") === u,
            s"${meta.qualifiedName} units metadata")
        }
        if (meta.axes.nonEmpty) {
          val ts = trace.map(_.getAs[Double](meta.axes.head))
          assert(ts.sameElements(ts.sorted), s"${meta.qualifiedName} order")
        }
      }
    }
    // the reference surface: BES fans out 32+ channels, USXR 48, etc. —
    // a parser regression that silently drops fan-out or a module would
    // show up as a count collapse here
    assert(nSignals >= 100, s"per-module signal counts: $perModule")
    assert(perModule("bes/bes.xml") >= 32)
    assert(perModule("usxr/usxr.xml") >= 48)
    assert(perModule("equilibria/efit.xml") >= 6)
  }
}
