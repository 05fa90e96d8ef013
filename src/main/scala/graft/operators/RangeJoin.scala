package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to interval rows with
  * `lo <= p <= hi` and no equality key.
  *
  * Spark's built-in planning for a pure inequality join is a nested-loop
  * (broadcast or cartesian) — quadratic work at scale. Bucketing makes it
  * an equi-join: intervals are exploded to every fixed-width bucket they
  * overlap, points map to exactly one bucket, and the join runs as a hash
  * join on the bucket id with the exact predicate re-checked after. Work
  * is linear in points + intervals x (span/width); `width` trades interval
  * replication (small width) against per-bucket candidate fan-in (large
  * width) — pick it near the typical interval span.
  *
  * At 100 TB both sides shuffle/broadcast only by bucket id, AQE handles
  * hot buckets via skew-join split, and a small interval side broadcasts.
  * (The reference has no range join; this generalizes its value-based
  * axis slicing, `fdf/fdf_signal.py:283-302`, to data-driven bounds.)
  */
object RangeJoin {

  /** `points(pCol)` in `[intervals(loCol), intervals(hiCol)]`, both
    * inclusive. Column names must be disjoint across the two inputs. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pCol: String, loCol: String, hiCol: String, width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    // guard inverted/null intervals: sequence(a, b) with a > b generates a
    // DESCENDING sequence (a single malformed row would explode into
    // |a-b| candidate buckets that can never match); a null sequence
    // explodes to zero rows, matching the cheap no-match of the plain
    // inequality join
    val iv = intervals.withColumn("__bucket",
      explode(when(col(loCol) <= col(hiCol),
        sequence(floor(col(loCol) / width).cast("long"),
          floor(col(hiCol) / width).cast("long")))))
    points.withColumn("__bucket", floor(col(pCol) / width).cast("long"))
      .join(iv, "__bucket")
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** q44: lineitem unit prices range-joined into ±2 price bands around
    * each part's retail price, aggregated per part. The interval side is
    * small → Spark broadcasts the exploded buckets; the point side never
    * shuffles. NO rebalance on the point side: measured both ways at
    * sf0.1 (round 4, 6 warm runs each), the extra exchange is a ~8%
    * REGRESSION (0.89 s vs 0.82 s steady-state) — the per-row work behind
    * the broadcast probe (one divide, one floor, hash probe, partial agg)
    * is too cheap to amortize shuffling the 600k-row projection, unlike
    * the regex/Expand pipelines where rebalance wins. */
  def priceBandAgg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.sources.Tables
    val pts = Tables.lineitem(spark, dir).select($"l_orderkey",
        ($"l_extendedprice" / $"l_quantity").as("unit_price"), $"l_quantity")
    val iv = Tables.part(spark, dir).select($"p_partkey",
      ($"p_retailprice" - 2).as("lo"), ($"p_retailprice" + 2).as("hi"))
    pointInInterval(pts, iv, "unit_price", "lo", "hi", width = 4.0)
      .groupBy($"p_partkey")
      .agg(count(lit(1)).as("n_matches"), sum($"l_quantity").as("sum_qty"))
  }

  /** Interval×interval OVERLAP join — the two-sided generalization of
    * [[pointInInterval]]: match `(a.lo, a.hi)` to `(b.lo, b.hi)` rows
    * with `a.lo <= b.hi AND b.lo <= a.hi` (inclusive overlap) and no
    * equality key. Spark plans the raw inequality pair as a nested
    * loop; here BOTH sides explode to the fixed-width buckets they
    * cover and the join runs as a hash join on the bucket id. Each
    * overlapping pair shares every bucket in the overlap region, so it
    * is counted exactly ONCE at the first shared bucket — the bucket
    * of `greatest(a.lo, b.lo)`, a point both intervals cover — and the
    * exact predicate is re-checked after the hash probe.
    *
    * Work is linear in Σ(span/width) over both inputs; at 100 TB both
    * sides shuffle only by bucket id, AQE splits hot buckets, and a
    * small side broadcasts (episodes below). Inputs must have disjoint
    * column names. */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      width: Long): DataFrame = {
    require(width > 0, "bucket width must be positive")
    def buckets(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(when(col(lo) <= col(hi),
          sequence(floor(col(lo) / width).cast("long"),
            floor(col(hi) / width).cast("long")))))
    buckets(a, aLo, aHi).join(buckets(b, bLo, bHi), "__bucket")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi)
        && col("__bucket") ===
          floor(greatest(col(aLo), col(bLo)) / width).cast("long"))
      .drop("__bucket")
  }

  /** q307: burst-concurrency census — which user sessions (q22) were
    * live during each traffic-burst episode (q221), per episode: how
    * many sessions, how many distinct users, and the total/max session
    * time inside the burst. The interval-OVERLAP join the reference's
    * value-based slicing family has no analog for: both sides are
    * data-driven intervals (sessions are per-user gap-closures,
    * episodes are above-median hour islands), joined by
    * [[intervalOverlap]] with a 1-hour bucket — no nested loop at any
    * scale, and the tiny episode side broadcasts.
    *
    * Exactness: everything is epoch-ms long arithmetic; the overlap
    * duration `least(hi) − greatest(lo)` is an exact long (0 for a
    * point touch at the closed boundary). */
  def sessionEpisodeOverlap(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val sess = Relational.sessionize(spark, dir)
      .select($"user_id", $"session_id",
        $"session_start_ms".as("s_lo"), $"session_end_ms".as("s_hi"))
    val ep = Timeseries.burstEpisodes(spark, dir)
      .select($"event_type", $"start_h",
        ($"start_h" * 3600000L).as("e_lo"),
        (($"end_h" + 1L) * 3600000L - 1L).as("e_hi"))
    intervalOverlap(sess, ep, "s_lo", "s_hi", "e_lo", "e_hi",
        width = 3600000L)
      .withColumn("o", least($"s_hi", $"e_hi") - greatest($"s_lo", $"e_lo"))
      .groupBy($"event_type", $"start_h")
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct($"user_id").as("n_users"),
        sum($"o").as("total_overlap_ms"),
        max($"o").as("max_overlap_ms"))
  }
}
