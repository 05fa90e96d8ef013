package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Graph

/** q127 triangle counting: the broadcast/id-order strategy vs the
  * degree-ordered shuffled-adjacency strategy (`TriShuffleConf`).
  * Corner-credit counts are orientation-invariant, so the two must be
  * row-identical on any graph; the megahub fixture is the shape the
  * degree order exists for (the hub sorts LAST, so its forward list
  * stays small instead of being intersected once per incident edge).
  */
class TriangleSpec extends SparkSpec {

  private def shuffledSession: SparkSession = {
    val s = spark.newSession()
    s.conf.set(Graph.TriShuffleConf, "true")
    s
  }

  private def collectCounts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("supplier triangles: shuffled degree-ordered path matches the broadcast path") {
    val base = collectCounts(Graph.supplierTriangles(spark, sfDir))
    val shuf = collectCounts(Graph.supplierTriangles(shuffledSession, sfDir))
    assert(base.nonEmpty, "fixture produced no triangles")
    assert(shuf === base)
  }

  test("megahub star+ring: both paths agree with the closed form") {
    // hub 0 joined to every spoke 1..100; ring edges between adjacent
    // spokes. Triangles are exactly (0, i, i+1): hub count 99, interior
    // spokes 2, end spokes 1.
    val n = 100L
    def edges(s: SparkSession) = {
      import s.implicits._
      ((1L to n).map(i => (0L, i)) ++
        (1L until n).map(i => (i, i + 1))).toDF("u", "v")
    }
    val expected: Map[Long, Long] =
      (Map(0L -> (n - 1)) ++ (1L to n).map { i =>
        i -> (if (i == 1L || i == n) 1L else 2L)
      }).toMap
    val base = collectCounts(Graph.trianglesOn(edges(spark)))
    assert(base === expected)
    val s2 = shuffledSession
    val shuf = collectCounts(Graph.trianglesOn(edges(s2)))
    assert(shuf === expected)
  }

  test("random graphs: both paths equal the brute-force corner counts (6 seeded rounds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = for {
      n <- Gen.chooseNum(4, 18)
      density <- Gen.chooseNum(0.1, 0.7)
      edges <- Gen.someOf(for {
        u <- 0L until n.toLong; v <- (u + 1) until n.toLong
      } yield (u, v))
    } yield edges.toList.distinct
    for (round <- 0 until 6) {
      val edges = edgeGen.pureApply(Gen.Parameters.default, Seed(7L + round))
      // brute force: every node triple, count closed ones per corner
      val set = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val expected = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for {
        i <- nodes; j <- nodes if j > i; k <- nodes if k > j
        if set((i, j)) && set((i, k)) && set((j, k))
      } { expected(i) += 1; expected(j) += 1; expected(k) += 1 }
      def run(s: SparkSession): Map[Long, Long] = {
        import s.implicits._
        if (edges.isEmpty) Map.empty
        else collectCounts(Graph.trianglesOn(edges.toDF("u", "v")))
      }
      assert(run(spark) === expected.toMap, s"broadcast path, round $round")
      assert(run(shuffledSession) === expected.toMap, s"shuffled path, round $round")
    }
  }

  test("triangle-free chain yields no counts on either path") {
    def edges(s: SparkSession) = {
      import s.implicits._
      (1L until 20L).map(i => (i, i + 1)).toDF("u", "v")
    }
    assert(Graph.trianglesOn(edges(spark)).count() === 0L)
    assert(Graph.trianglesOn(edges(shuffledSession)).count() === 0L)
  }
}
