package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The approximate twins SCALE.md names as the extreme-cardinality path
  * (HLL partials for distinct counts, t-digest partials for percentiles)
  * can't be oracle-gated cross-engine — sketch contents are engine-
  * specific — so this spec gates them INTERNALLY against the exact
  * operators: constant-size partials, bounded relative error. These are
  * the drop-in replacements for q23's Expand-distinct and q42's exact
  * sort-based percentiles when key cardinality outgrows memory.
  */
class ApproxTwinSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct (HLL) tracks exact distinct within 5%") {
    val r = Tables.lineitem(spark, sfDir).agg(
      countDistinct($"l_orderkey").as("exact"),
      approx_count_distinct($"l_orderkey", 0.02).as("approx")).head()
    val (e, a) = (r.getLong(0), r.getLong(1))
    assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
  }

  test("approx_count_distinct per group stays within 5% on every group") {
    val rows = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact"),
        approx_count_distinct($"l_orderkey", 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      assert(math.abs(a - e).toDouble / e < 0.05, s"${r(0)}: $a vs $e")
    }
  }

  test("approx_percentile tracks exact percentiles within 1% of range") {
    val r = Tables.lineitem(spark, sfDir).agg(
      expr("percentile(l_extendedprice, array(0.5, 0.95))").as("exact"),
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").as("approx"),
      (max($"l_extendedprice") - min($"l_extendedprice")).as("range")).head()
    val exact = r.getSeq[Double](0)
    val approx = r.getSeq[Double](1)
    val range = r.getDouble(2)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / range < 0.01, s"approx $a vs exact $e (range $range)")
    }
  }
}
