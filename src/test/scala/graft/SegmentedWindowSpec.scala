package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Timeseries

/** The segmented q118/q119 plans (two-phase prefix scan; bucketed window
  * with halo rows) must be BIT-IDENTICAL to the naive global per-type
  * window they replaced. The sf corpora never produce 1-row segments or
  * empty-day gaps, so these properties drive exactly those shapes:
  * random sparse series where segments hold 0-3 rows and whole days
  * vanish — the cases where naive seg±1 halo routing silently loses
  * true window neighbors. */
class SegmentedWindowSpec extends SparkSpec {

  private def series(rows: Seq[(String, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_type", "event_id", "tms", "vq")
  }

  /** Global-window hampel — the reference implementation the segmented
    * plan must reproduce. */
  private def hampelBrute(v: DataFrame): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"tms", $"event_id")
      .rowsBetween(-2, 2)
    val mid1 = ((size($"a") + 1) / 2).cast("int")
    val mid2 = (size($"a") / 2 + 1).cast("int")
    v.withColumn("a", array_sort(collect_list($"vq").over(w)))
      .withColumn("med2", element_at($"a", mid1) + element_at($"a", mid2))
      .withColumn("b", array_sort(transform($"a", x => abs(x * 2 - $"med2"))))
      .withColumn("mad4", element_at($"b", mid1) + element_at($"b", mid2))
      .withColumn("is_spike",
        when(abs($"vq" * 2 - $"med2") * 2 > $"mad4" * 3, 1L).otherwise(0L))
      .withColumn("clean2",
        when($"is_spike" === 1, $"med2").otherwise($"vq" * 2))
      .select($"event_type", $"event_id", $"tms", $"vq",
        $"med2", $"mad4", $"is_spike", $"clean2")
  }

  private def cusumBrute(v: DataFrame): DataFrame = {
    import spark.implicits._
    val stats = v.groupBy($"event_type")
      .agg(sum($"vq").as("s"), count(lit(1)).as("n"))
    val ord = Window.partitionBy($"event_type").orderBy($"tms", $"event_id")
    val cum = v.join(broadcast(stats), "event_type")
      .withColumn("cusum",
        $"n" * sum($"vq").over(ord.rowsBetween(Window.unboundedPreceding, 0))
          - row_number().over(ord).cast("long") * $"s")
    val best = Window.partitionBy($"event_type")
      .orderBy(abs($"cusum").desc, $"event_id")
    cum.withColumn("rk", row_number().over(best))
      .where($"rk" === 1)
      .select($"event_type", $"event_id".as("cp_event_id"),
        $"tms".as("cp_tms"), abs($"cusum").as("max_abs_cusum"), $"n")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  // sparse series: tms drawn so segments (segMs=100) hold 0-3 rows and
  // many segments are empty; two interleaved types
  private val seriesGen: Gen[Seq[(String, Long, Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      ty <- Gen.oneOf("a", "b")
      t <- Gen.choose(0L, 2000L)
      v <- Gen.choose(-50L, 50L)
    } yield (ty, t, v))
  } yield rows.zipWithIndex.map { case ((ty, t, v), i) => (ty, i.toLong, t, v) }

  test("segmented hampel == global-window hampel on sparse gapped series") {
    for (round <- 0 until 25) {
      val rows = seriesGen.pureApply(Gen.Parameters.default, Seed(42L + round))
      val v = series(rows)
      assert(canon(Timeseries.hampelOn(v, segMs = 100L)) ===
        canon(hampelBrute(v)), s"round $round: $rows")
    }
  }

  test("segmented cusum == global-window cusum on sparse gapped series") {
    for (round <- 0 until 25) {
      val rows = seriesGen.pureApply(Gen.Parameters.default, Seed(7L + round))
      val v = series(rows)
      assert(canon(Timeseries.cusumOn(v, segMs = 100L)) ===
        canon(cusumBrute(v)), s"round $round: $rows")
    }
  }

  test("1-row segments route halo two hops (the seg±1 failure case)") {
    // type x: rows in segments 0, 5 (1 row), 9 — with segMs=100 the
    // nearest predecessors of the seg-9 row are in segs 5 AND 0
    val v = series(Seq(
      ("x", 1L, 10L, 100L), ("x", 2L, 20L, -7L),
      ("x", 3L, 550L, 3L),
      ("x", 4L, 990L, 900L), ("x", 5L, 995L, -2L)))
    assert(canon(Timeseries.hampelOn(v, segMs = 100L)) ===
      canon(hampelBrute(v)))
  }
}
