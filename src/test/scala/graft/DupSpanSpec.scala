package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** q100 duplicate-substring spans and q101 priority sampling, on corpora
  * small enough that the expected answer is computable by hand or by an
  * in-memory model.
  */
class DupSpanSpec extends SparkSpec {

  private def spans(docs: Seq[(Long, String)], win: Int = 5)
      : Map[(Long, Long), (Long, Long, Long)] = {
    import spark.implicits._
    Dedup.dupSpansOn(docs.toDF("doc_id", "text"), win)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("a shared 5-token run yields one span per doc at the right offsets") {
    // doc 1: shared run at tokens 3..7; doc 2: same run at tokens 1..5
    val out = spans(Seq(
      1L -> "x1 x2 aa bb cc dd ee x3 x4",
      2L -> "aa bb cc dd ee y1 y2 y3 y4"))
    // one 5-token window each (positions 3 and 1), span = window extent
    assert(out == Map(
      (1L, 3L) -> (7L, 5L, 1L),
      (2L, 1L) -> (5L, 5L, 1L)))
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 7 shared tokens = 3 overlapping 5-windows -> ONE span of 7 tokens
    val shared = "aa bb cc dd ee ff gg"
    val out = spans(Seq(
      1L -> s"p1 p2 $shared q1",
      2L -> s"$shared r1 r2 r3"))
    assert(out((1L, 3L)) == (9L, 7L, 3L))
    assert(out((2L, 1L)) == (7L, 7L, 3L))
    assert(out.size == 2)
  }

  test("distant duplicated runs stay separate spans; unique text yields none") {
    // two shared runs separated by > 5 unique tokens in doc 1
    val out = spans(Seq(
      1L -> "aa bb cc dd ee u1 u2 u3 u4 u5 u6 vv ww xx yy zz",
      2L -> "aa bb cc dd ee k1 k2 k3 k4 k5 k6 vv ww xx yy zz",
      3L -> "totally unique words that appear nowhere else at all"))
    // doc 1: spans [1,5] and [12,16]; doc 3 contributes nothing
    assert(out((1L, 1L)) == (5L, 5L, 1L))
    assert(out((1L, 12L)) == (16L, 5L, 1L))
    assert(!out.keys.exists(_._1 == 3L))
  }

  test("a window repeated only WITHIN one doc is not a cross-doc duplicate") {
    val out = spans(Seq(
      1L -> "aa bb cc dd ee x1 x2 aa bb cc dd ee",
      2L -> "totally different words here that never repeat elsewhere ok"))
    assert(out.isEmpty)
  }

  test("priority sample: inclusion is the k smallest draw/weight ratios") {
    import spark.implicits._
    val got = Sampling.prioritySample(spark, sfDir)
    assert(got.count() == 100)
    // model the rule directly on the raw table
    val all = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"n_chars",
        Sampling.hash32("prio", $"doc_id").as("draw"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2).toDouble / r.getLong(1), r.getLong(2)))
    val expect = all.sortBy { case (id, p, _) => (p, id) }.take(100)
      .map(_._1).toSet
    val gotIds = got.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expect)
  }

  test("priority sample favors long documents at equal draws") {
    import spark.implicits._
    // the selected set's mean length should exceed the corpus mean
    val corpusMean = graft.sources.Tables.documents(spark, sfDir)
      .agg(avg($"n_chars")).head().getDouble(0)
    val sampleMean = Sampling.prioritySample(spark, sfDir)
      .agg(avg($"n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean)
  }
}
