package graft

import org.apache.spark.sql.functions._

import graft.functions.Bloom

/** The bloom membership contract q83 rests on: might_contain has NO
  * false negatives (a dropped true match would corrupt the semi join)
  * and a usefully low false-positive rate (otherwise the prefilter prunes
  * nothing and the shuffle saving evaporates).
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val keys = spark.range(0, 1000).select($"id".as("k"))
    val bloom = Bloom.buildBloom(keys, "k", 10000L)
    val misses = keys.where(!Bloom.mightContain(bloom, $"k")).count()
    assert(misses == 0)
  }

  test("false-positive rate on disjoint keys stays near the design fpp") {
    val keys = spark.range(0, 1000).select($"id".as("k"))
    val bloom = Bloom.buildBloom(keys, "k", 10000L)
    val probes = spark.range(1000000, 1010000).select($"id".as("k"))
    val hits = probes.where(Bloom.mightContain(bloom, $"k")).count()
    // default fpp is 3%; 10x over-capacity pushes it far lower. 5% gives
    // headroom against hash coincidence without weakening the claim.
    assert(hits < 500, s"fpp too high: $hits/10000")
  }

  test("q83 bloom-prefiltered semi join result equals the plain semi join") {
    import graft.operators.Relational
    import graft.sources.Tables
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).where($"o_totalprice" > 150000.0)
        .select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"))
    val bloomed = Relational.bloomSemiJoin(spark, sfDir)
      .select($"l_returnflag", $"n_items")
    assert(bloomed.except(plain).isEmpty && plain.except(bloomed).isEmpty)
  }
}
