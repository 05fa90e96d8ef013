package graft

import graft.operators.{Curation, Sampling, Timeseries}

/** Model-level invariants and brute-force parity for q214 (interval
  * union), q215 (UniMax waterfill), q216 (l-diversity census) and q217
  * (pack-order bias), on top of their DuckDB hash gates. */
class IntervalMixtureSpec extends SparkSpec {

  test("q214 interval union: parity with a collected brute-force merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Timeseries.intervalUnion(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_islands"), r.getAs[Long]("covered_ms"),
          r.getAs[Long]("max_island_ms"))))
      .toMap
    // brute force: collect the raw intervals, merge per user in Scala
    val raw = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", unix_millis($"ts").as("s"),
        (unix_millis($"ts") + floor($"value" * 1000).cast("long") * 60)
          .as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      val islands = sorted.tail.foldLeft(List(sorted.head)) {
        case ((cs, ce) :: rest, (s, e)) =>
          if (s <= ce) (cs, math.max(ce, e)) :: rest
          else (s, e) :: (cs, ce) :: rest
        case (nil, iv) => iv :: nil
      }
      val lens = islands.map { case (s, e) => e - s }
      u -> ((islands.size.toLong, lens.sum, lens.max))
    }
    assert(got === expect)
  }

  test("q215 unimax: scalar waterfill parity, budget exhaustion, caps respected") {
    val rows = Sampling.unimaxAlloc(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_toks"),
        r.getAs[Long]("cap_toks"), r.getAs[Long]("saturated"),
        r.getAs[Long]("alloc_toks"), r.getAs[Long]("epochs_ppm")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val b = rows.map(_._2).sum
    // scalar re-derivation of the waterfill from (lang, cap) alone
    val byCap = rows.sortBy(r => (r._3, r._1))
    val n = byCap.size
    var rem = b
    var unsat = n
    val satSet = scala.collection.mutable.Set[String]()
    byCap.foreach { r =>
      if (r._3 * (unsat - 1) <= rem - r._3) {
        satSet += r._1; rem -= r._3; unsat -= 1
      }
    }
    val level = if (unsat > 0) rem / unsat else 0L
    rows.foreach { r =>
      val sat = satSet.contains(r._1)
      assert((r._4 == 1L) === sat, s"${r._1}: saturation flag mismatch")
      assert(r._5 === (if (sat) r._3 else level), s"${r._1}: alloc mismatch")
      assert(r._5 <= r._3, s"${r._1}: alloc exceeds cap")
      assert(r._6 === r._5 * 1000000L / r._2)
    }
    // the budget is exhausted up to integer-division remainder
    assert(b - rows.map(_._5).sum < n.toLong,
      "waterfill left more than the rounding remainder unallocated")
    // E = 1.2 epochs: nobody repeats beyond the cap
    assert(rows.forall(_._6 <= 1200000L))
  }

  test("q216 l-diversity: histogram partitions the class grid and the corpus") {
    import spark.implicits._
    val rows = Curation.lDiversity(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("l"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_records"), r.getAs[Long]("mass_ppm")))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 >= 1L && r._2 > 0L && r._3 >= r._2))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rows.map(_._3).sum === docs.count(),
      "l-histogram does not partition the corpus")
    // every class holds at least one and at most class_size distinct
    // sensitive values: l <= records/classes bound per bucket
    rows.foreach { case (l, nc, nr, _) =>
      assert(l * nc <= nr, s"l=$l bucket: $nc classes cannot hold $nr rows")
    }
    assert(rows.map(_._4).sum <= 1000000L)
  }

  test("q217 order bias: parity with a collected single-ordering census") {
    import spark.implicits._
    val got = Sampling.orderBias(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_s"), r.getAs[Long]("n_prev"),
          r.getAs[Long]("n_same"), r.getAs[Long]("same_ppm"),
          r.getAs[Long]("exp_ppm"))))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = docs.sortBy { case (id, _) => (md5hex("ob" + id), id) }
    val n = ordered.length.toLong
    val pairs = ordered.zip(ordered.tail)
    val bySrc = pairs.groupBy(_._1._2)
    val counts = docs.groupBy(_._2).map { case (s, d) => s -> d.length.toLong }
    val expect = bySrc.map { case (src, ps) =>
      val nPrev = ps.length.toLong
      val nSame = ps.count { case ((_, a), (_, b)) => a == b }.toLong
      val ns = counts(src)
      src -> ((ns, nPrev, nSame, nSame * 1000000L / nPrev,
        (ns - 1L) * 1000000L / (n - 1L)))
    }
    assert(got === expect)
    // the pair census covers every adjacent position exactly once
    assert(got.values.map(_._2).sum === n - 1L)
  }
}
