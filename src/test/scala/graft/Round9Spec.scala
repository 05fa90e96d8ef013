package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Evaluate, Timeseries}

/** Model-level invariants for the round-9 operators (q178-q181) on top
  * of their DuckDB hash gates. */
class Round9Spec extends SparkSpec {

  test("q178 SNM pairs are window-local, verified, and ranks match a global window") {
    import spark.implicits._
    val rows = Dedup.sortedNeighborhood(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gap = r.getAs[Long]("gap")
      assert(gap >= 1L && gap <= 3L)
      val jac = r.getAs[Long]("jac_ppm")
      assert(jac >= 400000L && jac <= 1000000L)
      assert(r.getAs[Long]("doc_a") !== r.getAs[Long]("doc_b"))
    }
    // the two-phase segmented rank must equal the single global window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id",
        substring(regexp_replace(lower($"text"), " ", ""), 1, 24).as("snk"))
    val global = docs.withColumn("rn_g",
      row_number().over(Window.orderBy($"snk".asc, $"doc_id".asc)).cast("long"))
    val wSeg = Window.partitionBy($"seg").orderBy($"snk".asc, $"doc_id".asc)
    val wOff = Window.orderBy($"seg".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = docs.withColumn("seg", substring($"snk", 1, 1))
      .withColumn("rn_seg", row_number().over(wSeg).cast("long"))
    val offs = ranked.groupBy($"seg").agg(count(lit(1)).as("c"))
      .select($"seg", coalesce(sum($"c").over(wOff), lit(0L)).as("off"))
    val twoPhase = ranked.join(broadcast(offs), "seg")
      .select($"doc_id", ($"rn_seg" + $"off").as("rn"))
    val mismatches = global.join(twoPhase, "doc_id")
      .where($"rn_g" =!= $"rn").count()
    assert(mismatches === 0L)
  }

  test("q179 BH discoveries form a rank prefix with monotone p-values") {
    val rows = Evaluate.fdrDrift(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rk"))
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("p_ppb") <= b.getAs[Long]("p_ppb"))
        // once a rank is NOT a discovery, no later rank may be one
        assert(a.getAs[Long]("discovery") >= b.getAs[Long]("discovery"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("p_ppb") >= 0L
        && r.getAs[Long]("p_ppb") <= 1000000000L)
      assert(r.getAs[Long]("d_ppm") >= 0L && r.getAs[Long]("d_ppm") <= 1000000L)
    }
  }

  test("q180 EWMA scores exactly span-24 fewer hours than the grid and is exact on a constant series") {
    import spark.implicits._
    val grid = Timeseries.denseHourly(spark, sfDir)
    val span = grid.groupBy($"event_type")
      .agg((max($"h") - min($"h") + 1).as("n_hours"))
    val rows = Timeseries.ewmaForecast(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val spanMap = span.collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_hours")).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_scored") === spanMap(t) - 24L)
      assert(r.getAs[Long]("mae_milli") ===
        r.getAs[Long]("sum_abs_err") / r.getAs[Long]("n_scored"))
    }
    // constant series x=7: truncated EWMA = 7*(1 - 2^-24); floor(f*1000)
    // = 6999 exactly, for every scored hour — the dyadic-exactness claim
    val f = (1 to 24).toDF("k")
      .agg(sum(pow(lit(0.5), $"k") * lit(7.0))).head().getDouble(0)
    assert(f === 7.0 * (1 - math.pow(2.0, -24)))
    assert(math.floor(f * 1000).toLong === 6999L)
  }

  test("q181 ACF rows: 6 lags per type, n strictly decreasing, |r| <= 1") {
    val rows = Timeseries.acfHourly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("lag_k"))
      assert(sorted.map(_.getAs[Long]("lag_k")).toSeq === (1L to 6L).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("n") === b.getAs[Long]("n") + 1L)
        case _ =>
      }
      sorted.foreach { r =>
        assert(math.abs(r.getAs[Long]("r_ppm")) <= 1000000L)
      }
    }
  }
}
