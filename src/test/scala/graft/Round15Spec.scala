package graft

import org.apache.spark.sql.functions._

/** Round-15 optimization invariants: conf-gated plan shapes must not
  * change results, and the gated shapes must actually plan as claimed. */
class Round15Spec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("itemCf salted co-count reduce is bit-identical to the single-phase groupBy") {
    import spark.implicits._
    val inter = Tables_interactions()
    val single = graft.operators.Graph.itemCfCoCounts(inter, Some(1))
    val salted = graft.operators.Graph.itemCfCoCounts(inter, Some(8))
    assert(canon(single) === canon(salted))
    // the salted shape is genuinely two-phase: a __salt grouping appears
    // in its optimized plan, and never in the single-phase plan
    assert(salted.queryExecution.optimizedPlan.toString.contains("__salt"))
    assert(!single.queryExecution.optimizedPlan.toString.contains("__salt"))
  }

  private def Tables_interactions(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.sources.Tables.lineitem(spark, sfDir)
      .join(graft.sources.Tables.orders(spark, sfDir),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("custkey"), $"l_suppkey".as("suppkey"))
      .distinct()
  }

  test("ppjoin candidateShape conf flips the candidate join strategy without changing results") {
    val docs = graft.operators.TextOps.docsParallel(spark, sfDir)
    def run(shape: String): (Seq[String], String) = {
      spark.conf.set("spark.graft.ppjoin.candidateShape", shape)
      try {
        val df = graft.operators.Dedup.ngramJaccardOn(docs, 0.6)
        (canon(df), df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.ppjoin.candidateShape")
    }
    val (bRows, bPlan) = run("broadcast")
    val (sRows, sPlan) = run("shuffle_hash")
    assert(bRows === sRows)
    assert(bPlan.contains("BroadcastHashJoin"))
    assert(sPlan.contains("ShuffledHashJoin"))
  }
}
