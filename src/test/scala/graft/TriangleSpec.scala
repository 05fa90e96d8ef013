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

  /** Exact wedge-weighted transitivity (closed wedges / Σ C(deg, 2)) —
    * the statistic q285's sampler estimates. NOTE this is NOT
    * q231's closure_ppm (distinct wedge ENDPOINT pairs): enumeration
    * here is the brute-force truth the sampler avoids at scale. */
  private def exactTransitivity(p: org.apache.spark.sql.DataFrame): (Long, Long) = {
    import p.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    val s = p.select($"doc_a".as("u"), $"doc_b".as("v"))
      .union(p.select($"doc_b".as("u"), $"doc_a".as("v")))
    val w = s.as("x").join(s.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("lo"), col("y.v").as("hi"))
    val cl = w.join(
      p.select($"doc_a".as("lo"), $"doc_b".as("hi"), lit(1L).as("closed")),
      Seq("lo", "hi"), "left")
    val r = cl.agg(count(lit(1)), sum(coalesce(col("closed"), lit(0L))))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("q285 wedge sampler: estimate within 4-sigma of the exact transitivity on testdata pairs") {
    import spark.implicits._
    val p = graft.operators.Ckpt(
      graft.operators.Dedup.simhashPairs(spark, sfDir)
        .select($"doc_a", $"doc_b"), eager = false)
    val (wedges, closed) = exactTransitivity(p)
    assert(wedges > 0)
    val pTrue = closed.toDouble / wedges
    val row = graft.operators.Dedup.wedgeSamplePairs(p, 2000L).collect()(0)
    assert(row.getAs[Long]("k_samples") === 2000L)
    assert(row.getAs[Long]("n_wedges") === wedges)
    val est = row.getAs[Long]("est_ppm").toDouble / 1e6
    val se = math.sqrt(pTrue * (1 - pTrue) / 2000.0)
    info(f"exact transitivity $pTrue%.4f, sampled $est%.4f (se $se%.4f)")
    assert(math.abs(est - pTrue) <= 4 * se + 1e-6,
      f"sampled $est%.4f outside 4 sigma of exact $pTrue%.4f")
  }

  test("q285 wedge sampler: tracks truth on the megahub where the degree cap diverges by design") {
    import spark.implicits._
    // wheel: hub 0 to every spoke 1..300 plus the spoke path — hub
    // degree 300 >> TransDegCap, so the capped audit measures ONLY the
    // spoke-centered wedges while most true wedges sit at the hub
    val n = 300L
    val p = ((1L to n).map(i => (0L, i)) ++
      (1L until n).map(i => (i, i + 1))).toDF("doc_a", "doc_b")
    val (wedges, closed) = exactTransitivity(p)
    // closed form: hub C(300,2) wedges with 299 ring closures; interior
    // spokes 3 wedges / 2 closed; end spokes 1 / 1
    assert(wedges === n * (n - 1) / 2 + (n - 2) * 3 + 2)
    assert(closed === (n - 1) + (n - 2) * 2 + 2)
    val pTrue = closed.toDouble / wedges
    val capped = graft.operators.Dedup
      .transitivityAuditPairs(p, Some(graft.operators.Dedup.TransDegCap))
      .collect()(0).getAs[Long]("closure_ppm").toDouble / 1e6
    val est = graft.operators.Dedup.wedgeSamplePairs(p, 2000L)
      .collect()(0).getAs[Long]("est_ppm").toDouble / 1e6
    val se = math.sqrt(pTrue * (1 - pTrue) / 2000.0)
    info(f"truth $pTrue%.4f, sampled $est%.4f, capped-exact $capped%.4f")
    assert(math.abs(est - pTrue) <= 4 * se + 1e-6,
      f"sampled $est%.4f outside 4 sigma of truth $pTrue%.4f")
    // the cap, by design, reads a different graph here
    assert(math.abs(capped - pTrue) > 10 * se,
      "megahub fixture no longer separates the capped audit from truth")
  }
}
