package graft

import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

/** Co-located join via bucketed tables: after a one-time bucketed+sorted
  * write of both join sides, the join must plan with no Exchange (and no
  * per-query Sort) — the write-once/join-many layout that removes the
  * fact-table shuffle at scale. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without any exchange") {
    val base = new java.io.File(sys.props("java.io.tmpdir"), "graft_bucketed")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity")),
      "li_bucketed", s"$base/lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_orderdate")),
      "ord_bucketed", s"$base/orders", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a merge join so the exchange-free claim is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.table(spark, "li_bucketed")
        .join(Bucketing.table(spark, "ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n === Tables.lineitem(spark, sfDir).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("groupBy on the bucket key of a bucketed table needs no exchange") {
    val base = new java.io.File(sys.props("java.io.tmpdir"), "graft_bucketed")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity")),
      "li_bucketed_agg", s"$base/lineitem_agg", "l_orderkey", 8)
    try {
      val agg = Bucketing.table(spark, "li_bucketed_agg")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      agg.count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
    }
  }
}
