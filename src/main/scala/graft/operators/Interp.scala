package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Linear interpolation of an irregular per-key time series onto probe
  * timestamps — the resampling counterpart of the reference's value-based
  * slicing (`sig(time=t)` nearest-sample, `fdf/fdf_signal.py:283-302`):
  * instead of snapping to the nearest sample, blend the two bracketing
  * samples.
  *
  * Implementation is the scalable single-sort pattern, not a join: union
  * samples and probes, one window sort per key, and carry the last/next
  * sample across probe rows with `last(..., ignoreNulls)` over forward and
  * reverse orderings. One shuffle (by key), two in-partition sorts, zero
  * join fan-out — at 100 TB this is shuffle-bound on exactly the data +
  * probe volume, with no as-of join's per-probe candidate set.
  *
  * A probe exactly on a sample returns that sample's value; probes outside
  * the sampled range (no bracketing pair) are dropped.
  */
object Interp {

  /** @param samples (key, t, v) rows — duplicate (key, t) must be
    *                pre-deduplicated by the caller for determinism
    * @param probes  (key, t) rows
    * @return (key, t, v) with v linearly interpolated */
  def linear(samples: DataFrame, probes: DataFrame,
      key: String, t: String, v: String): DataFrame = {
    val all = samples.select(col(key), col(t).as("__t"), col(v).as("__v"),
        lit(0).as("__m"))
      .unionByName(probes.select(col(key), col(t).as("__t"),
        lit(null).cast("double").as("__v"), lit(1).as("__m")))
    // null-valued samples are not interpolation brackets; carrying (t, v)
    // as ONE struct (not two independent carries) keeps the pair aligned
    // when such rows are skipped
    val isBracket = col("__m") === 0 && col("__v").isNotNull
    // at one timestamp, sample rows sort before probe rows in BOTH window
    // directions (__m asc is direction-independent), so a probe sitting
    // exactly on a sample sees it as its prev AND next bracket
    // (t1 == t0 -> exact sample value)
    val wPrev = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(key))
      .orderBy(col("__t").desc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def carry(w: WindowSpec) =
      last(when(isBracket, struct(col("__t"), col("__v"))),
        ignoreNulls = true).over(w)
    all
      .withColumn("__p", carry(wPrev))
      .withColumn("__n", carry(wNext))
      .withColumn("__t0", col("__p.__t")).withColumn("__v0", col("__p.__v"))
      .withColumn("__t1", col("__n.__t")).withColumn("__v1", col("__n.__v"))
      .where(col("__m") === 1 &&
        col("__t0").isNotNull && col("__t1").isNotNull)
      .select(col(key), col("__t").as(t),
        when(col("__t1") === col("__t0"), col("__v0"))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
            (col("__t") - col("__t0")).cast("double") /
            (col("__t1") - col("__t0")).cast("double"))
          .as(v))
  }

  /** Forward-fill (LOCF — last observation carried forward) onto probe
    * timestamps: each probe takes the latest sample at-or-before it; a
    * probe with no prior sample is dropped. The gap-fill half of `linear`
    * (same union + single window-carry pattern: one shuffle by key, one
    * in-partition sort, no join fan-out), plus a staleness column — how
    * far the carried value is behind the probe — which downstream
    * freshness filters cut on.
    *
    * @param samples (key, t, v) rows, (key, t) unique
    * @param probes  (key, t) rows
    * @return (key, t, v, staleness = t - t_sample) */
  def locf(samples: DataFrame, probes: DataFrame,
      key: String, t: String, v: String): DataFrame = {
    val all = samples.select(col(key), col(t).as("__t"), col(v).as("__v"),
        lit(0).as("__m"))
      .unionByName(probes.select(col(key), col(t).as("__t"),
        lit(null).cast("double").as("__v"), lit(1).as("__m")))
    val isSample = col("__m") === 0 && col("__v").isNotNull
    // samples sort before probes at equal timestamps (__m asc), so a
    // probe exactly on a sample carries that sample with staleness 0
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("__p",
        last(when(isSample, struct(col("__t"), col("__v"))), ignoreNulls = true).over(w))
      .where(col("__m") === 1 && col("__p").isNotNull)
      .select(col(key), col("__t").as(t),
        col("__p.__v").as(v),
        (col("__t") - col("__p.__t")).as("staleness"))
  }

  /** q63: every user's event series forward-filled onto the same 6-hour
    * January 2024 grid q45 interpolates onto — grid points before a
    * user's first event are dropped, all others carry the latest earlier
    * value and report its staleness in ms. */
  def gridLocf(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.Tables
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_millis($"ts").as("t_ms"), $"value")
      .groupBy($"user_id", $"t_ms").agg(min($"value").as("value_ff"))
    val probes = ev.select($"user_id").distinct()
      .select($"user_id", explode(sequence(
        lit(1704067200000L), lit(1706745600000L), lit(21600000L))).as("t_ms"))
    locf(ev, probes, "user_id", "t_ms", "value_ff")
  }

  /** q45: every user's event series resampled onto a fixed 6-hour grid
    * over January 2024 (epoch-ms). Events are deduplicated to one sample
    * per (user, ms) first — interpolation between duplicate timestamps is
    * undefined. */
  def gridInterp(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.Tables
    val ev = Tables.events(spark, dir)
      .select($"user_id", unix_millis($"ts").as("t_ms"), $"value")
      .groupBy($"user_id", $"t_ms").agg(min($"value").as("value_interp"))
    val probes = ev.select($"user_id").distinct()
      .select($"user_id", explode(sequence(
        lit(1704067200000L), lit(1706745600000L), lit(21600000L))).as("t_ms"))
    linear(ev, probes, "user_id", "t_ms", "value_interp")
  }
}
