package graft

import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoinExec, GraftPlans}
import graft.operators.AsOf
import graft.sources.Tables

/** The custom as-of merge-join operator (logical node + strategy + exec)
  * must agree with the compositional join+window form on real data, handle
  * ties deterministically, and actually plan through AsOfJoinExec. */
class AsOfPlanSpec extends SparkSpec {

  test("custom exec plans as AsOfJoinExec and matches join+window results") {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate")

    val merged = GraftPlans.asofMergeJoin(o, li,
      Seq("o_orderkey" -> "l_orderkey"), "o_orderdate", "l_shipdate",
      rightTie = Seq("l_linenumber"))
    merged.count() // materialize so AQE finalizes the physical plan
    val physical = merged.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(physical.collectFirst { case e: AsOfJoinExec => e }.nonEmpty,
      s"expected AsOfJoinExec in the physical plan:\n$physical")

    // window-based reference with the SAME tie-break (|diff|, on, tie)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderkey")
      .orderBy(abs(unix_timestamp($"l_shipdate") - unix_timestamp($"o_orderdate")).asc,
        $"l_shipdate".asc, $"l_linenumber".asc)
    val windowed = o.join(li, $"o_orderkey" === $"l_orderkey")
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"o_orderkey", $"l_linenumber", $"l_shipdate")

    val m = merged.select($"o_orderkey", $"l_linenumber", $"l_shipdate")
    assert(m.count() === windowed.count())
    assert(m.except(windowed).count() === 0)
    assert(windowed.except(m).count() === 0)
  }

  test("ties keep the earlier on-value then the tie-break column") {
    import spark.implicits._
    val probes = Seq((1, 10.0)).toDF("k", "t")
    // right: 8.0 and 12.0 are equidistant from 10.0 -> earlier (8.0) wins;
    // within 8.0, tie id 1 < 2 -> id 1 wins
    val quotes = Seq((1, 8.0, 2), (1, 8.0, 1), (1, 12.0, 0))
      .toDF("k", "rt", "id")
    val r = GraftPlans.asofMergeJoin(probes, quotes,
      Seq("k" -> "k"), "t", "rt", rightTie = Seq("id")).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("rt") === 8.0)
    assert(r.head.getAs[Int]("id") === 1)
  }

  test("left keys with no right group produce no rows (inner as-of)") {
    import spark.implicits._
    val probes = Seq((1, 1.0), (2, 2.0)).toDF("k", "t")
    val quotes = Seq((1, 5.0)).toDF("k", "rt")
    val r = GraftPlans.asofMergeJoin(probes, quotes, Seq("k" -> "k"), "t", "rt")
    assert(r.select("k").as[Int].collect().toSeq === Seq(1))
  }

  test("multiple left rows per key each pick their own nearest") {
    import spark.implicits._
    val probes = Seq((1, 1.0), (1, 9.0), (1, 5.1)).toDF("k", "t")
    val quotes = Seq((1, 0.0), (1, 5.0), (1, 10.0)).toDF("k", "rt")
    val r = GraftPlans.asofMergeJoin(probes, quotes, Seq("k" -> "k"), "t", "rt")
      .orderBy($"t").select($"rt").as[Double].collect().toSeq
    assert(r === Seq(0.0, 5.0, 10.0))
  }

  test("agrees with AsOf.nearest point-slice semantics on events") {
    import spark.implicits._
    // nearest event to a fixed ts per user via the generic helper,
    // versus the custom exec probing one row per user
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", unix_timestamp($"ts").cast("double").as("ts_s"),
        $"event_id")
    val probeTs = ev.agg(avg($"ts_s")).head().getDouble(0)
    // fresh-source probes: the join+window helper (unlike asofMergeJoin)
    // does not de-duplicate self-join lineage itself
    val users = ev.select($"user_id").distinct().as[Long].collect().toSeq
    val probes = users.toDF("user_id").withColumn("t", lit(probeTs))
    // compare the chosen timestamp, not event_id: among rows with equal
    // ts_s the helper's window has no further tie-break, so only the
    // (user, nearest-ts) pair is uniquely defined by both
    val merged = GraftPlans.asofMergeJoin(probes, ev,
      Seq("user_id" -> "user_id"), "t", "ts_s", rightTie = Seq("event_id"))
      .select($"user_id", $"ts_s")
    val helper = AsOf.asofJoin(probes, ev, "t", "ts_s", Seq("user_id"))
      .select(col("user_id"), col("ts_s"))
    assert(merged.except(helper).count() === 0)
    assert(helper.except(merged).count() === 0)
  }
}
