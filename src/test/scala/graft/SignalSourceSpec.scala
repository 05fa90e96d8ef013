package graft

import org.apache.spark.sql.functions._

import graft.sources.SignalSource

/** DataSourceV2 signal connector: values match the deterministic trace
  * model, shot/channel predicates prune input partitions (not just rows),
  * and column pruning reaches the reader. */
class SignalSourceSpec extends SparkSpec {

  private def read(opts: (String, String)*) = {
    val r = spark.read.format("graft.sources.SignalSource")
    opts.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  test("full scan: shots x channels x points, values match the model") {
    val df = read("shots" -> "100:101", "channels" -> "2", "points" -> "10",
      "dt" -> "0.5")
    assert(df.count() === 2 * 2 * 10)
    val r = df.where(col("shot") === 100 && col("channel") === 2)
      .orderBy("time").collect()
    assert(r.length === 10)
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Double]("time") === i * 0.5)
      assert(row.getAs[Double]("value") === SignalSource.value(100, 2, i, 0.5))
    }
  }

  test("shot equality predicate prunes partitions at plan time") {
    val df = read("shots" -> "1:50", "channels" -> "4", "points" -> "5")
      .where(col("shot") === 7)
    // pruning: 4 partitions (one per channel), not 200
    val parts = df.queryExecution.executedPlan.collectLeaves()
      .head.execute().getNumPartitions
    assert(parts === 4, s"expected 4 pruned partitions, got $parts")
    assert(df.count() === 4 * 5)
  }

  test("range + IN predicates prune; non-key predicates remain post-scan") {
    val df = read("shots" -> "1:10", "channels" -> "2", "points" -> "4")
      .where(col("shot") >= 8 && col("channel").isin(1) && col("value") >= -1e9)
    assert(df.select("shot").distinct().count() === 3)
    assert(df.count() === 3 * 4)
  }

  test("column pruning reaches the reader schema") {
    val df = read("points" -> "3").select("time")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq === Seq("time"))
  }

  test("count/min/max aggregates push into the scan and answer from metadata") {
    val df = read("shots" -> "100:102", "channels" -> "2", "points" -> "50",
        "dt" -> "0.1")
      .groupBy(col("shot"))
      .agg(count(lit(1)).as("n"), min(col("time")).as("t0"),
        max(col("time")).as("t1"))
    val rows = df.orderBy("shot").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === 2L * 50)      // 2 channels x 50 points
      assert(r.getAs[Double]("t0") === 0.0)
      assert(r.getAs[Double]("t1") === 49 * 0.1)
    }
    // the pushed aggregation is visible on the scan: it reads 1 row per
    // trace, not points x channels
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation"), plan)
  }

  test("aggregate pushdown composes with partition-pruning filters") {
    val df = read("shots" -> "1:50", "channels" -> "4", "points" -> "7")
      .where(col("shot") === 9)
      .groupBy(col("channel")).agg(count(lit(1)).as("n"))
    val rows = df.orderBy("channel").collect()
    assert(rows.map(_.getAs[Long]("n")).toSeq === Seq(7L, 7L, 7L, 7L))
  }

  test("limit pushes into the scan: per-trace sample cap at the source") {
    val df = read("shots" -> "100:101", "channels" -> "2", "points" -> "100000")
      .limit(5)
    assert(df.count() === 5)
    // the reader was capped: a full-trace scan would emit 400k rows; the
    // capped plan emits at most limit rows per (shot, channel) partition
    val leaf = df.queryExecution.executedPlan.collectLeaves().head
    val emitted = leaf.execute().count()
    assert(emitted <= 5L * 4, s"expected <=20 source rows, got $emitted")
  }

  test("unsupported aggregates (sum/avg of value) fall back to a row scan") {
    val df = read("shots" -> "100:100", "channels" -> "1", "points" -> "10",
        "dt" -> "0.5")
      .groupBy(col("shot")).agg(sum(col("value")).as("s"))
    val expected = (0 until 10).map(SignalSource.value(100, 1, _, 0.5)).sum
    assert(math.abs(df.head().getAs[Double]("s") - expected) < 1e-9)
    assert(!df.queryExecution.executedPlan.toString.contains("PushedAggregation"))
  }
}
