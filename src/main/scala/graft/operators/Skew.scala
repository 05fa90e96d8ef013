package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Skew mitigation by key salting. AQE's skew-join split handles most
  * hot-key cases at runtime; these are the explicit forms for when the
  * skew is known up front (a handful of grouping values, a power-law join
  * key) or the engine below is not AQE-capable. Results are identical to
  * the unsalted plan — salting only changes the shuffle layout — which is
  * exactly what the q50/q51 oracles check.
  */
object Skew {

  /** Two-phase aggregation over hot grouping keys: phase 1 groups by
    * (keys, salt) so each hot key fans across `salts` reducers, phase 2
    * recombines. Only losslessly-recombinable aggregates are offered
    * (sum / count / min / max; count recombines by summing). Floating sums
    * recombine in a different order than a single-phase plan — route
    * through decimal if bit-exactness against a serial engine matters. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      sums: Seq[String] = Nil, withCount: Boolean = false,
      mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    // position-derived salt, NOT a row-content hash: the canonical skew
    // case is a hot key whose rows are duplicates, and content-hashed
    // duplicates would all land on one (key, salt) reducer again. The
    // salt is layout-only — any assignment yields identical results.
    val salt = pmod(monotonically_increasing_id(), lit(salts.toLong))
    val p1Aggs =
      sums.map(c => sum(col(c)).as(s"__sum_$c")) ++
      (if (withCount) Seq(count(lit(1)).as("__cnt")) else Nil) ++
      mins.map(c => min(col(c)).as(s"__min_$c")) ++
      maxs.map(c => max(col(c)).as(s"__max_$c"))
    val p2Aggs =
      sums.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
      (if (withCount) Seq(sum(col("__cnt")).as("n")) else Nil) ++
      mins.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
      maxs.map(c => max(col(s"__max_$c")).as(s"max_$c"))
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(p1Aggs.head, p1Aggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(p2Aggs.head, p2Aggs.tail: _*)
  }

  /** Salted equi-join for a skewed left key: left rows get a hash salt in
    * [0, salts), the right side is replicated once per salt value, and the
    * join runs on (key, salt) — a hot left key spreads over `salts`
    * reducers instead of one. Right-side columns must not collide with
    * left's. Replication costs |right| x salts, so size `salts` to the
    * skew, not the cluster. */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    require(salts > 0)
    // position-derived salt for the same duplicate-row reason as saltedAgg
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }

  /** q50: salted two-phase aggregation over the 3-value l_returnflag key
    * (the canonical few-hot-groups shape). Exact-recombining aggregates
    * only, so the result hash-matches a serial single-phase oracle. */
  def saltedAggQuery(spark: SparkSession, dir: String): DataFrame =
    saltedAgg(
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")),
      keys = Seq("l_returnflag"), salts = 16,
      sums = Seq("l_quantity"), withCount = true,
      mins = Seq("l_extendedprice"), maxs = Seq("l_extendedprice"))

  /** q51: salted join lineitem->supplier on the join key, then a per-
    * supplier rollup; result identical to the plain join. */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_suppkey", $"l_quantity")
    val sup = Tables.supplier(spark, dir).select($"s_suppkey", $"s_name")
    saltedJoin(li, sup, "l_suppkey", "s_suppkey", salts = 8)
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
  }

  /** q150: join-key skew audit — the diagnostic a pipeline runs BEFORE
    * deciding whether q50/q51 salting (or AQE skew split) is needed.
    * Per candidate join key of lineitem: distinct key count, total
    * rows, the hottest key's row count and corpus share in ppm, and the
    * key-distribution entropy (−Σ p·ln p, each term offset-quantized at
    * 1e6 — the q87 recipe) whose gap below ln(distinct) measures how
    * far from uniform the key is. top_share·|keys| ≫ 1e6 or entropy far
    * under ln(distinct) ⇒ salt before shuffling on that key.
    *
    * Scale shape: one partial-agged groupBy per key column (unioned
    * key-tagged so it stays ONE pass shape per column), then max/sum
    * reductions on the bounded (key-name, value) count relations. The
    * hottest-key pick is a max over counts — no sort of the key space. */
  def keySkewAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    // entropy needs the total first; the counts relation is re-derived
    // for the second pass (each is one scan+agg; at scale cache counts)
    def auditFull(keyCol: String): DataFrame = {
      val counts = li.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("c"))
      val tot = counts.agg(count(lit(1)).as("n_keys"), sum($"c").as("n_rows"),
        max(struct($"c", $"k")).as("top"))
      val ent = counts.crossJoin(broadcast(
          counts.agg(sum($"c").as("nr"))))
        .select(floor((($"c" / $"nr") * log($"nr" / $"c")) * 1000000
          + lit(1.0 / 3)).cast("long").as("term_q"))
        .agg(sum($"term_q").as("entropy_q"))
      tot.crossJoin(broadcast(ent))
        .select(lit(keyCol).as("key_col"), $"n_keys", $"n_rows",
          $"top.c".as("top_count"), $"top.k".as("top_key"),
          expr("(top.c * 1000000) div n_rows").as("top_share_ppm"),
          $"entropy_q")
    }
    Seq("l_orderkey", "l_partkey", "l_suppkey").map(auditFull)
      .reduce(_ unionByName _)
  }
}
