package graft

import graft.catalog.SignalCatalog

/** The reference's own structural test invariants
  * (/root/reference/fdf/tests/tests.py:36-131), ported per SURVEY §5 and
  * run over EVERY real module XML the reference ships — including ip,
  * vloop, and equilibria, which the reference's suite hard-codes as
  * exclusions (tests.py:46,66,102,121 — its dim_of/template paths were
  * known-flaky; ours are not exempt):
  *  - every container yields at least one signal (tests.py:36-57);
  *  - every signal's axes resolve — each canonical axis name is backed
  *    by axis metadata or declared via dim_of indirection
  *    (tests.py:59-93);
  *  - every signal has a time axis, and canonical order puts it first
  *    (tests.py:114-131 `hasTime`);
  *  - the long-format table schema is well-formed: shot + axes + value
  *    (+error only when declared), unique column names.
  */
class CatalogInvariantSpec extends SparkSpec {

  private val refModules = "/root/reference/fdf/modules"
  private val catalogs: Seq[(String, SignalCatalog)] = Seq(
    "bes" -> SignalCatalog.fromFile(s"$refModules/bes/bes.xml"),
    "chers" -> SignalCatalog.fromFile(s"$refModules/chers/chers.xml"),
    "efit" -> SignalCatalog.fromFile(s"$refModules/equilibria/efit.xml",
      Map("efit" -> Seq("efit01", "efit02", "lrdfit01"))),
    "filterscopes" -> SignalCatalog.fromFile(s"$refModules/filterscopes/filterscopes.xml"),
    "ip" -> SignalCatalog.fromFile(s"$refModules/ip/ip.xml"),
    "magnetics" -> SignalCatalog.fromFile(s"$refModules/magnetics/magnetics.xml"),
    "mpts" -> SignalCatalog.fromFile(s"$refModules/mpts/mpts.xml"),
    "usxr" -> SignalCatalog.fromFile(s"$refModules/usxr/usxr.xml"),
    "vloop" -> SignalCatalog.fromFile(s"$refModules/vloop/vloop.xml"))

  test("every reference module yields at least one signal") {
    catalogs.foreach { case (m, c) =>
      assert(c.signals.nonEmpty, s"$m: empty catalog")
    }
    // equilibria.xml is methods-only BY DESIGN: its signals arrive via
    // the runtime [efit] tree probe (factory.py:498-500), covered by the
    // "efit" entry above. The invariant here: the parser tolerates a
    // method-only container and yields an empty (not erroring) catalog.
    val eq = SignalCatalog.fromFile(s"$refModules/equilibria/equilibria.xml")
    assert(eq.signals.isEmpty)
  }

  test("every signal's axes resolve to axis metadata or dim_of") {
    catalogs.foreach { case (m, c) =>
      c.signals.foreach { s =>
        s.axes.foreach { a =>
          // an axis resolves through an <axis> declaration, through the
          // signal's own dim_of, or through a SIBLING SIGNAL of the axis
          // name carrying dim_of (ip.xml: data's time base is the `time`
          // signal bound to dim_of(0) of the ip node)
          val resolved = s.axisMeta.exists(_.name == a) ||
            s.dimOf.isDefined ||
            c.signals.exists(x =>
              x.qualifiedName.endsWith(s".$a") && x.dimOf.isDefined)
          assert(resolved, s"$m ${s.qualifiedName}: axis '$a' unresolved")
        }
      }
    }
  }

  test("every signal has a time axis and canonical order puts it first") {
    catalogs.foreach { case (m, c) =>
      c.signals.foreach { s =>
        // time-base signals themselves (dim_of indirection targets like
        // ip.time) ARE the time axis — the invariant applies to data
        // signals, i.e. those declaring any axes at all
        if (s.axes.nonEmpty) {
          assert(s.axes.head == "time",
            s"$m ${s.qualifiedName}: canonical axes ${s.axes} not time-first")
        }
      }
    }
  }

  test("every signal's long-format schema is well-formed") {
    catalogs.foreach { case (m, c) =>
      c.signals.foreach { s =>
        val schema = s.schema
        val names = schema.fieldNames.toSeq
        assert(names.distinct.size == names.size,
          s"$m ${s.qualifiedName}: duplicate columns in $names")
        assert(names.head == "shot" && names.contains("value"),
          s"$m ${s.qualifiedName}: schema $names")
        assert(names.contains("value_err") == s.errorPath.isDefined,
          s"$m ${s.qualifiedName}: error column mismatch")
      }
    }
  }
}
