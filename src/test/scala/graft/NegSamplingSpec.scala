package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** q194 proposal-based negative sampling vs the retired exhaustive plan.
  *
  * The proposal variant draws s pseudo-random catalog positions per
  * customer instead of ranking the whole catalog; this spec pins the
  * relationship between the two: proposals only ever emit valid
  * non-owned suppliers, and as s grows past catalog coverage the
  * proposal output converges to the exhaustive cardinality (min(2,
  * non-owned) negatives for every customer) — the sense in which the
  * O(s)-per-user plan is the same sampler, minus the catalog scan.
  */
class NegSamplingSpec extends SparkSpec {

  test("proposal negatives are valid suppliers the customer never bought from") {
    import spark.implicits._
    val out = Sampling.negativeSampling(spark, sfDir)
    val suppliers = graft.sources.Tables.supplier(spark, sfDir)
      .select($"s_suppkey".as("neg_suppkey"))
    assert(out.join(suppliers, Seq("neg_suppkey"), "left_anti").count() === 0L,
      "emitted a suppkey that does not exist in the catalog")
    val inter = graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.orders(spark, sfDir),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("custkey"), $"l_suppkey".as("neg_suppkey"))
      .distinct()
    assert(out.join(inter, Seq("custkey", "neg_suppkey")).count() === 0L,
      "emitted a supplier the customer bought from")
  }

  test("at saturating s the proposal sampler reaches exhaustive cardinality per customer") {
    import spark.implicits._
    // sf0.001 has ~10 suppliers; 512 draws cover every position with
    // probability 1 - |catalog|·(1-1/|catalog|)^512 ~ 1 - 4e-23, so on
    // this FIXED corpus+hash the outcome is deterministic: every
    // customer finds min(2, #non-owned) negatives, exactly like the
    // exhaustive rank
    val s = spark.newSession()
    s.conf.set(Sampling.NegProposalsConf, "512")
    val prop = Sampling.negativeSampling(s, sfDir)
      .groupBy(col("custkey")).agg(count(lit(1)).as("n_prop"))
    val exh = Sampling.negativeSamplingExhaustive(s, sfDir)
      .groupBy(col("custkey")).agg(count(lit(1)).as("n_exh"))
    val joined = prop.join(exh, Seq("custkey"), "full_outer")
    assert(joined.where(col("n_prop").isNull || col("n_exh").isNull
        || col("n_prop") =!= col("n_exh")).count() === 0L,
      "proposal cardinality diverged from exhaustive at saturating s")
    // and n_pos agrees row-by-row between the two plans
    val nposP = Sampling.negativeSampling(s, sfDir)
      .select(col("custkey"), col("n_pos")).distinct()
    val nposE = Sampling.negativeSamplingExhaustive(s, sfDir)
      .select(col("custkey"), col("n_pos")).distinct()
    assert(nposP.exceptAll(nposP.intersect(nposE)).count() === 0L)
  }

  test("default s=16 emits at most 2 negatives per customer, deterministically") {
    import spark.implicits._
    val out = Sampling.negativeSampling(spark, sfDir)
    assert(out.groupBy($"custkey").count().where($"count" > 2).count() === 0L)
    assert(out.where($"rk" < 1 || $"rk" > 2).count() === 0L)
    val again = Sampling.negativeSampling(spark, sfDir)
    assert(out.exceptAll(again).count() === 0L && again.exceptAll(out).count() === 0L)
  }
}
