package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Dedup

/** Property test for the two-phase segmented global rank (q178's sort
  * key, q257's salted-hash permutation): `Dedup.segmentedRank` must be
  * BIT-IDENTICAL to `row_number() OVER (ORDER BY key, doc_id)` — the
  * single-partition window it replaces — for arbitrary keys, including
  * duplicate keys (ties fall to doc_id), shared first characters
  * (segment skew: one segment taking most rows), empty-ish segments,
  * and keys of length 1 (segment == key). ScalaCheck generators with
  * fixed seeds, one Spark job per round (the AsOfPropertySpec idiom). */
class SegmentedRankPropertySpec extends SparkSpec {

  // keys drawn from a SMALL alphabet so first-char segments collide and
  // skew; occasional duplicates force the doc_id tie-break
  private val keyGen: Gen[String] = for {
    len <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', '0', '9'))
  } yield cs.mkString

  test("segmentedRank == row_number over the global (key, doc_id) order (8 seeded rounds)") {
    import spark.implicits._
    val gen = Gen.nonEmptyListOf(keyGen)
    for (round <- 0 until 8) {
      val keys = gen.pureApply(Gen.Parameters.default, Seed(7L + round))
      val rows = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
      val df = rows.toDF("doc_id", "gk").repartition(4)
      val got = Dedup.segmentedRank(df, "gk")
        .select($"doc_id", $"rn").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the model: the exact single-partition window the helper replaces
      val expect = df
        .withColumn("rn", row_number().over(
          Window.partitionBy(graft.functions.Win.bounded)
            .orderBy($"gk".asc, $"doc_id".asc)).cast("long"))
        .select($"doc_id", $"rn").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"round $round diverged (n=${rows.size})")
      // ranks are a permutation of 1..n — no gaps, no duplicates
      assert(got.values.toSeq.sorted === (1L to rows.size.toLong))
    }
  }
}
