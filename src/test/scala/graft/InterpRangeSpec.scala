package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Interp, RangeJoin}

/** Unit semantics for the range-join and interpolation operators (the
  * DuckDB oracle covers them end-to-end via q44/q45; these pin the
  * operator-level contracts on crafted data). */
class InterpRangeSpec extends SparkSpec {

  test("range join matches a brute-force inequality join on crafted data") {
    import spark.implicits._
    val pts = Seq((1L, 0.5), (2L, 3.0), (3L, 7.99), (4L, 8.0), (5L, 12.0), (6L, -2.0))
      .toDF("pid", "p")
    val iv = Seq((10L, 0.0, 8.0), (20L, 7.5, 9.5), (30L, -3.0, -1.0), (40L, 100.0, 101.0))
      .toDF("iid", "lo", "hi")
    for (w <- Seq(0.7, 2.0, 10.0)) {
      val fast = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val brute = pts.join(iv, $"p" >= $"lo" && $"p" <= $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(fast === brute, s"width=$w")
    }
  }

  test("range join is duplicate-free when an interval spans many buckets") {
    import spark.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val iv = Seq((10L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", 1.0)
    assert(out.count() === 1L)
  }

  test("range join: inverted interval matches nothing (and does not explode)") {
    import spark.implicits._
    val pts = Seq((1L, 5.0)).toDF("pid", "p")
    val iv = Seq((10L, 1e9, 0.0), (20L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, iv, "p", "lo", "hi", 4.0)
    assert(out.select("iid").as[Long].collect().toSeq === Seq(20L))
  }

  test("null-valued samples are not interpolation brackets") {
    import spark.implicits._
    val samples = Seq((1L, 0L, Some(1.0)), (1L, 10L, None), (1L, 20L, Some(3.0)))
      .toDF("k", "t", "v")
    val probes = Seq((1L, 15L)).toDF("k", "t")
    val out = Interp.linear(samples, probes, "k", "t", "v")
      .as[(Long, Long, Double)].collect()
    // bracket over NON-NULL samples: 1.0 + (3.0-1.0)*15/20 = 2.5 (a naive
    // independent carry would mispair t0=10 with v0=1.0 and yield 2.0)
    assert(out.toSeq === Seq((1L, 15L, 2.5)))
  }

  test("linear interpolation brackets, hits samples exactly, drops out-of-range") {
    import spark.implicits._
    val samples = Seq((1L, 0L, 10.0), (1L, 10L, 20.0), (1L, 20L, 0.0),
      (2L, 5L, 5.0)).toDF("k", "t", "v")
    val probes = Seq((1L, 5L), (1L, 10L), (1L, 15L), (1L, 25L), (1L, -5L),
      (2L, 5L), (2L, 6L)).toDF("k", "t")
    val out = Interp.linear(samples, probes, "k", "t", "v")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set(
      (1L, 5L, 15.0),   // midpoint of 10..20
      (1L, 10L, 20.0),  // exact sample
      (1L, 15L, 10.0),  // midpoint of 20..0
      (2L, 5L, 5.0)))   // exact single sample
    // probes at t=25, t=-5 (outside range) and (2,6) (no next) are dropped
  }

  test("interpolation result count equals probes with both brackets (sf data)") {
    import spark.implicits._
    val out = Interp.gridInterp(spark, sfDir)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_millis($"ts").as("t_ms"))
    val bounds = ev.groupBy($"user_id")
      .agg(min($"t_ms").as("lo"), max($"t_ms").as("hi"))
    val expected = bounds.select($"user_id", explode(sequence(
        lit(1704067200000L), lit(1706745600000L), lit(21600000L))).as("t"),
        $"lo", $"hi")
      .where($"t" >= $"lo" && $"t" <= $"hi").count()
    assert(out.count() === expected)
  }
}
