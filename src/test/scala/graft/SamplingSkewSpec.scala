package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Skew}
import graft.sources.Tables

class SamplingSkewSpec extends SparkSpec {

  test("hash split is deterministic, exhaustive, and near the 80/10/10 target") {
    import spark.implicits._
    val a = Sampling.trainValTest(spark, sfDir).as[(Long, String)].collect().toMap
    val b = Sampling.trainValTest(spark, sfDir).as[(Long, String)].collect().toMap
    assert(a === b)
    val n = a.size.toDouble
    assert(n === Tables.documents(spark, sfDir).count().toDouble)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.1)
    assert(frac.keySet === Set("train", "val", "test"))
  }

  test("stratified sample is a deterministic subset with per-stratum rates ordered") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val s = Sampling.langStratified(spark, sfDir)
    assert(s.count() <= docs.count())
    // sampling is a filter: every sampled id exists in the corpus
    assert(s.join(docs, Seq("doc_id"), "left_anti").count() === 0)
    // determinism
    assert(s.agg(sum($"doc_id")).head.getLong(0) ===
      Sampling.langStratified(spark, sfDir).agg(sum($"doc_id")).head.getLong(0))
  }

  test("seq pack: offsets are cumulative per shard and packs are contiguous") {
    import spark.implicits._
    val p = Sampling.seqPack(spark, sfDir)
      .select($"shard", $"doc_id", $"start_tok", $"n_tokens", $"pack_id")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    p.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.foldLeft(0L) { case (expectedStart, (_, _, start, n, pack)) =>
        assert(start === expectedStart)
        assert(pack === start / 2048)
        start + n
      }
      // pack ids never decrease along the shard order
      assert(sorted.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("salted aggregation equals the direct groupBy") {
    import spark.implicits._
    val salted = Skew.saltedAggQuery(spark, sfDir)
      .orderBy($"l_returnflag").collect().toSeq
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("sum_l_quantity"), count(lit(1)).as("n"),
        min($"l_extendedprice").as("min_l_extendedprice"),
        max($"l_extendedprice").as("max_l_extendedprice"))
      .orderBy($"l_returnflag").collect().toSeq
    assert(salted === direct)
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val salted = Skew.saltedJoinQuery(spark, sfDir)
      .orderBy($"s_suppkey").collect().toSeq
    val li = Tables.lineitem(spark, sfDir).select($"l_suppkey", $"l_quantity")
    val plain = li.join(Tables.supplier(spark, sfDir).select($"s_suppkey", $"s_name"),
        li("l_suppkey") === col("s_suppkey"))
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_items"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"s_suppkey").collect().toSeq
    assert(salted === plain)
  }
}
