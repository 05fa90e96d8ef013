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
}
