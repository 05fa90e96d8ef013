package graft

import graft.operators.{Quantize, Similarity}

/** In-memory model parity for the round-9 embedding-space audits: q223
  * (inter-label centroid geometry), q224 (per-dimension variance census)
  * and q225 (kNN label purity), on top of their DuckDB hash gates.
  * Models recompute from collected raw vectors with plain Scala
  * collections, independent of the operators' plans.
  */
class EmbedAuditSpec extends SparkSpec {

  private lazy val vecs: Array[(Long, Long, Array[Float])] = {
    import spark.implicits._
    graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label".cast("long"), $"embedding")
      .as[(Long, Long, Array[Float])].collect().sortBy(_._1)
  }

  private def q6(x: Float): Long =
    math.floor(x.toDouble * 1e6 + 1.0 / 3).toLong

  // strict left-to-right double accumulation, the VectorOps contract
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  test("q223 centroid shift: parity with per-label quantized-sum model") {
    val byLabel = vecs.groupBy(_._2)
    val d = vecs.head._3.length
    def centroid(rows: Array[(Long, Long, Array[Float])]): Array[Double] =
      Array.tabulate(d) { i =>
        rows.map(r => q6(r._3(i))).sum.toDouble / rows.length
      }
    val cents = byLabel.map { case (l, rows) =>
      l -> ((rows.length.toLong, centroid(rows)))
    }
    val labels = cents.keys.toSeq.sorted
    val expect = (for {
      a <- labels; b <- labels if a < b
    } yield {
      val (na, ca) = cents(a); val (nb, cb) = cents(b)
      val dist = (0 until d).map { i =>
        val dd = ca(i) - cb(i)
        math.floor(dd * dd + 1.0 / 3).toLong
      }.sum
      (a, b, na, nb) -> dist
    }).toMap
    val got = Similarity.centroidShift(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        -> r.getLong(4)).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q224 dim variance: parity + the 5%-of-max dead flag") {
    val d = vecs.head._3.length
    val n = vecs.length.toLong
    val stats = (0 until d).map { i =>
      val xs = vecs.map(r => q6(r._3(i)))
      val sx = xs.sum.toDouble
      val sxx = xs.map(x => x * x).sum.toDouble
      (i.toLong, n,
        math.floor(sx / n + 1.0 / 3).toLong,
        math.floor((sxx - sx * sx / n) / n + 1.0 / 3).toLong)
    }
    val maxVar = stats.map(_._4).max
    val expect = stats.map { case (i, nn, m, v) =>
      (i, nn, m, v, if (v * 20 < maxVar) 1L else 0L)
    }.toSet
    val got = Quantize.dimVariance(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expect)
    // every dimension reported exactly once
    assert(got.size === d)
  }

  test("q225 knn purity: parity with the q138 banded-candidate model") {
    val signs = (0 until 16).map { p =>
      (0 until 64).map { d0 =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$p:${d0 + 1}".getBytes("UTF-8"))
        if ((hex(0) & 0x80) != 0) 1.0f else -1.0f
      }.toArray
    }
    def bandBits(v: Array[Float]): Seq[(Int, Long)] =
      (0 until 4).map { b =>
        b -> (0 until 4).map { j =>
          if (dot(v, signs(4 * b + j)) > 0.0) 1L << j else 0L
        }.sum
      }
    val sigs = vecs.map { case (id, l, v) => (id, l, v, bandBits(v)) }
    // the operator's per-bucket B=64 candidate-target cap (q138's rule)
    def hubDraw(band: Int, bits: Long, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"hub:$band:$bits:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val inCap: Set[((Int, Long), Long)] = sigs
      .flatMap { case (id, _, _, bb) => bb.map(k => (k, id)) }
      .groupBy(_._1).toSeq.flatMap { case (k, xs) =>
        xs.map(_._2).sortBy(id => (hubDraw(k._1, k._2, id), id))
          .take(64).map(id => (k, id))
      }.toSet
    val cand = for {
      (qa, la, va, ba) <- sigs; (qb, lb, vb, bb) <- sigs
      if qa != qb && ba.exists(k => bb.contains(k) && inCap((k, qb)))
    } yield (qa, la, qb, lb, dot(va, vb) / (nrm(va) * nrm(vb)))
    val top3 = cand.groupBy(_._1).toSeq.flatMap { case (_, cs) =>
      cs.sortBy(c => (-c._5, c._3)).take(3)
    }
    val expect = top3.groupBy(_._2).map { case (l, rows) =>
      val agree = rows.count(r => r._4 == r._2).toLong
      val pairs = rows.length.toLong
      l -> ((rows.map(_._1).distinct.length.toLong, pairs, agree,
        agree * 1000000L / pairs))
    }
    val got = Similarity.knnLabelPurity(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got === expect)
    // purity must beat the random-agreement floor somewhere if labels
    // carry any signal; only sanity-check boundedness here
    got.values.foreach { case (_, pairs, agree, ppm) =>
      assert(agree <= pairs && ppm <= 1000000L)
    }
  }
}
