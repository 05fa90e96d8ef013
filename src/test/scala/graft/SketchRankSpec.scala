package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, TextAnalysis}

/** q102 CMS heavy hitters and q103 integer PageRank invariants. */
class SketchRankSpec extends SparkSpec {

  test("CMS estimates are one-sided: est >= true count, and the modal token is reported") {
    import spark.implicits._
    val out = TextAnalysis.cmsHeavyHitters(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) >= r.getLong(2)),
      "a count-min estimate can only overestimate")
    // the corpus' true most-frequent token must clear total/200
    val top = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").count().orderBy($"count".desc, $"tok".asc)
      .head().getString(0)
    assert(out.map(_.getString(0)).contains(top))
  }

  /** In-memory mirror of the integer PageRank recurrence. */
  private def model(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 5) {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = s.map { case (n, sum) => n -> (150000L + 85L * sum / 100L) }
    }
    r
  }

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.pageRankOn(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two-node component is a fixpoint at rank 1e6; path center outranks leaves") {
    val pairs = Seq(1L -> 2L, 3L -> 4L, 4L -> 5L)
    val got = run(pairs)
    assert(got(1L) == 1000000L && got(2L) == 1000000L)
    assert(got(4L) > got(3L) && got(4L) > got(5L))
    assert(got == model(pairs))
  }

  test("cluster terms: 3 ranks per populated cell, salience monotone within cell") {
    import spark.implicits._
    val out = graft.operators.Quantize.clusterTerms(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRk = rows.sortBy(_._2)
      assert(byRk.map(_._2).toSeq == (1L to byRk.length).toSeq)
      // tf/df salience non-increasing down the ranks
      val ratios = byRk.map(r => r._4.toDouble / r._5)
      assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b })
    }
  }

  test("vocab coverage: per-lang totals partition the corpus, ppm is the integer ratio") {
    import spark.implicits._
    val out = TextAnalysis.vocabCoverage(spark, sfDir).collect()
    val corpusToks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split($"text", " "))).count()
    assert(out.map(_.getLong(1)).sum == corpusToks)
    out.foreach { r =>
      val (n, oov, ppm) = (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(oov <= n)
      assert(ppm == oov * 1000000L / n)
    }
  }

  test("star graph: hub accumulates rank; spokes agree with the integer model") {
    val pairs = Seq(10L -> 1L, 10L -> 2L, 10L -> 3L, 10L -> 4L)
    val got = run(pairs)
    val exp = model(pairs)
    assert(got == exp)
    assert(got(10L) > got(1L))
    // spokes are symmetric
    assert(Seq(1L, 2L, 3L, 4L).map(got).distinct.size == 1)
  }
}
