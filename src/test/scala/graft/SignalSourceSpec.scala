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
}
