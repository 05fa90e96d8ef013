package graft

import scala.xml.XML

import org.apache.spark.sql.types.DoubleType

import graft.catalog.SignalCatalog

/** Catalog semantics: the XML inheritance/fan-out/canonicalization rules
  * of SURVEY §1.3-1.4, checked against a fixture exercising every rule. */
class CatalogSpec extends SparkSpec {

  private val fixture = XML.loadString(
    """<container name="mpts" tree="activespec" path="\TOP.MPTS" units="s">
      |  <axis name="time" node=".TS_TIMES" units="s"/>
      |  <axis name="radius" node=".RADII" units="m"/>
      |  <signal name="te" node=".TE" units="keV" axes="radius, time" error=".TE_ERR"/>
      |  <signal name="ne" node=".NE" axes="time" dim_of="0"/>
      |  <signal name="ch" node=".CH{}" range="1, 16" axes="time"/>
      |  <signal name="pad" node=".P{}" range="1, 3, 3" axes="time"/>
      |  <container name="spline" path=".SPLINE" tree="splinetree">
      |    <axis name="time" node=".SP_TIMES"/>
      |    <signal name="te" node=".TE_SPL" axes="time"/>
      |  </container>
      |</container>""".stripMargin)

  private lazy val cat = SignalCatalog.fromXml(fixture)

  test("units inherit from container when absent, override when present") {
    assert(cat.signal("mpts.te").units === Some("keV"))
    assert(cat.signal("mpts.ne").units === Some("s")) // inherited
  }

  test("tree defaults from container and is overridable per subcontainer") {
    assert(cat.signal("mpts.te").tree === "activespec")
    assert(cat.signal("mpts.spline.te").tree === "splinetree")
  }

  test("paths join container prefix + node; nested containers accumulate") {
    assert(cat.signal("mpts.te").path === "\\TOP.MPTS.TE")
    assert(cat.signal("mpts.spline.te").path === "\\TOP.MPTS.SPLINE.TE_SPL")
    assert(cat.signal("mpts.te").errorPath === Some("\\TOP.MPTS.TE_ERR"))
  }

  test("time-first canonical order records the transpose permutation") {
    val te = cat.signal("mpts.te")
    assert(te.declaredAxes === Seq("radius", "time"))
    assert(te.axes === Seq("time", "radius"))
    assert(te.transpose === Some(Seq(1, 0)))
    assert(cat.signal("mpts.ne").transpose === None)
  }

  test("channel ranges fan out with auto and explicit zero-padding") {
    val chans = cat.signals.filter(_.qualifiedName.startsWith("mpts.ch"))
    assert(chans.size === 16)
    assert(chans.head.qualifiedName === "mpts.ch01") // ceil(log10(17)) = 2
    assert(chans.last.qualifiedName === "mpts.ch16")
    assert(chans.head.path === "\\TOP.MPTS.CH01")
    val padded = cat.signals.filter(_.qualifiedName.startsWith("mpts.pad"))
    assert(padded.map(_.qualifiedName) === Seq("mpts.pad001", "mpts.pad002", "mpts.pad003"))
  }

  test("axis redeclaration in a subcontainer shadows the outer axis") {
    val spl = cat.signal("mpts.spline.te")
    assert(spl.axisMeta.find(_.name == "time").get.path === "\\TOP.MPTS.SPLINE.SP_TIMES")
    val te = cat.signal("mpts.te")
    assert(te.axisMeta.find(_.name == "time").get.path === "\\TOP.MPTS.TS_TIMES")
  }

  test("dim_of indirection is recorded") {
    assert(cat.signal("mpts.ne").dimOf === Some(0))
    assert(cat.signal("mpts.te").dimOf === None)
  }

  test("template placeholders instantiate one catalog branch per run") {
    val tpl = XML.loadString(
      """<container name="[efit]" tree="[efit]" path="\TOP">
        |  <axis name="time" node=".GTIMES"/>
        |  <signal name="psirz" node=".PSIRZ" axes="time, r, z"/>
        |</container>""".stripMargin)
    val c = SignalCatalog.fromXml(tpl, Map("efit" -> Seq("efit01", "efit02")))
    assert(c.signals.map(_.qualifiedName).sorted === Seq("efit01.psirz", "efit02.psirz"))
    assert(c.signal("efit02.psirz").tree === "efit02")
    assert(c.signal("efit01.psirz").axes === Seq("time", "r", "z"))
  }

  test("schema carries units metadata and error column only when declared") {
    val s = cat.signal("mpts.te").schema
    assert(s.fieldNames.toSeq === Seq("shot", "time", "radius", "value", "value_err"))
    assert(s("value").metadata.getString("units") === "keV")
    assert(s("time").metadata.getString("units") === "s")
    assert(s("value").dataType === DoubleType)
    val noErr = cat.signal("mpts.ne").schema
    assert(!noErr.fieldNames.contains("value_err"))
  }

  // ---- fidelity: the catalog loads the REFERENCE'S OWN module XML ----
  // (mdstree/mdsnode/mdspath dialect, reference range semantics). Facts
  // below are the SURVEY §1.4/§6 citations, checked against the real files.

  private val refModules = "/root/reference/fdf/modules"
  private def loadable(m: String) = s"$refModules/$m/$m.xml"

  test("reference bes.xml: 32 zero-padded channels on one shared time base") {
    val c = SignalCatalog.fromFile(loadable("bes"))
    val chans = c.signals
    assert(chans.length === 32)
    assert(chans.head.qualifiedName === "bes.ch01")
    assert(chans.last.qualifiedName === "bes.ch32")
    assert(chans.head.tree === "activesp_raw")
    assert(chans.head.path === "\\TOP.BES.RAWDATA:BE_DT32_01:INPUT_01")
    assert(chans.forall(_.units === Some("V")))
  }

  test("reference usxr.xml: 3 arrays x 16 channels, 1-field range counts from 0") {
    val c = SignalCatalog.fromFile(loadable("usxr"))
    assert(c.signals.length === 48)
    val v0 = c.signal("usxr.vtop.vtop00")
    assert(v0.path === "\\usxr_vtop_00.raw")
    assert(c.get("usxr.hup.hup15").nonEmpty)
    assert(c.get("usxr.hup.hup16").isEmpty)
    // titles parse and channel-format like the reference's
    // title.format(str(index).zfill(digits)) (factory.py:952-954)
    assert(v0.title === Some("Vertical Top Channel 00"))
    assert(v0.units === Some("DN"))
  }

  test("reference magnetics.xml: tree override per subcontainer, pad-1 range") {
    val c = SignalCatalog.fromFile(loadable("magnetics"))
    assert(c.signal("magnetics.highf").tree === "ops_pc")
    assert(c.signal("magnetics.filtered.lowf_oddn").tree === "operations")
    assert(c.signal("magnetics.highn.highn_1").path === "\\bdot_l1dmivvhn1_raw")
    assert(c.signal("magnetics.highn.highn_16").path === "\\bdot_l1dmivvhn16_raw")
    assert(c.signals.length === 1 + 4 + 16)
  }

  test("reference mpts.xml: path join, error nodes, time-major transpose") {
    val c = SignalCatalog.fromFile(loadable("mpts"))
    val te = c.signal("mpts.te")
    assert(te.tree === "activespec")
    assert(te.path === "\\top.mpts.output_data.best.fit_te")
    assert(te.errorPath === Some("\\top.mpts.output_data.best.fit_te_err"))
    assert(te.declaredAxes === Seq("radius", "time"))
    assert(te.axes === Seq("time", "radius"))
    assert(te.transpose === Some(Seq(1, 0)))
    // spline subcontainer: shadowed radius axis, inherited time axis
    val spl = c.signal("mpts.spline.te")
    assert(spl.path === "\\top.mpts.output_data.best.spline_te")
    assert(spl.axisMeta.find(_.name == "radius").get.path
      === "\\top.mpts.output_data.best.spline_radii")
    assert(spl.axisMeta.find(_.name == "time").get.path
      === "\\top.mpts.output_data.best.ts_times")
  }

  test("reference filterscopes.xml: each signal binds ITS OWN time base (the intent)") {
    val c = SignalCatalog.fromFile(loadable("filterscopes"))
    assert(c.signals.length === 5)
    def timePath(sig: String) =
      c.signal(s"filterscopes.$sig").axisMeta.find(_.name == "time").get.path
    assert(timePath("bayg_dalpha_eies") === "dim_of(\\bayg_dalpha_eies)")
    assert(timePath("bayi_opipe_dalpha") === "dim_of(\\bayi_opipe_dalpha)")
    assert(timePath("bayi_dalpha_eies") === "dim_of(\\bayi_dalpha_eies)")
  }

  test("reference ip.xml: dim_of time-base indirection and ms units") {
    val c = SignalCatalog.fromFile(loadable("ip"))
    val t = c.signal("ip.time")
    assert(t.dimOf === Some(0))
    assert(t.path === "\\top.wf.ip")
    assert(t.units === Some("ms"))
    val d = c.signal("ip.data")
    assert(d.units === Some("kA"))
    assert(d.axes === Seq("time"))
  }

  test("reference efit.xml: [efit] template instantiates one branch per run") {
    val c = SignalCatalog.fromFile(s"$refModules/equilibria/efit.xml",
      Map("efit" -> Seq("efit01", "lrdfit01")))
    assert(c.signals.length === 6)
    val q = c.signal("efit01.qpsi")
    assert(q.axes === Seq("time", "psin"))
    assert(q.transpose === None)
    val p = c.signal("lrdfit01.psirz")
    assert(p.axes === Seq("time", "R", "z")) // already time-major, rank 3
  }

  test("reference efit.xml psirz: 3-axis declaration drives the rank-3 contour path end-to-end") {
    // the q76 semantics (slice two spatial axes, per-time sub-block max)
    // expressed through the GENERIC SignalFrame verbs on a table whose
    // schema comes straight from the reference's 3-axis declaration
    // (equilibria/efit.xml:10: axes = 'time, R, z')
    import org.apache.spark.sql.functions._
    val meta = SignalCatalog.fromFile(s"$refModules/equilibria/efit.xml",
      Map("efit" -> Seq("efit01"))).signal("efit01.psirz")
    assert(meta.schema.fieldNames.take(5).toSeq === Seq("shot", "time", "R", "z", "value"))
    import spark.implicits._
    val rows = for {
      ti <- 0 until 4; ri <- 0 until 5; zi <- 0 until 5
    } yield (141000, ti / 10.0, 0.2 + ri * 0.3, -0.6 + zi * 0.3,
      // peak at (ri=2, zi=2), drifting up with time
      10.0 * ti - (ri - 2) * (ri - 2) - (zi - 2) * (zi - 2))
    val df = rows.toDF("shot", "time", "R", "z", "value")
    val sub = graft.api.SignalFrame(meta, df)
      .slice("R", 0.5, 1.1)    // ri in {1, 2, 3}
      .slice("z", -0.3, 0.3)   // zi in {1, 2, 3}
    // axis coherence at rank 3: every surviving row is inside BOTH slices
    assert(sub.df.where(!$"R".between(0.5, 1.1) || !$"z".between(-0.3, 0.3)).count() === 0)
    val perTime = sub.df.groupBy($"time").agg(max($"value").as("m"), count(lit(1)).as("n"))
      .as[(Double, Double, Long)].collect().sortBy(_._1)
    assert(perTime.map(_._1).toSeq === Seq(0.0, 0.1, 0.2, 0.3))
    assert(perTime.forall(_._3 === 9)) // 3x3 sub-block per time slice
    // the sub-block max is the undisturbed peak value 10*ti at (2,2)
    perTime.zipWithIndex.foreach { case ((_, m, _), ti) => assert(m === 10.0 * ti) }
  }
}
