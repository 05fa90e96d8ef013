package graft

import org.apache.spark.sql.functions._

import graft.api.Embeddings

/** Fluent embedding surface: verbs delegate to the gated cores, so the
  * spec checks closed-form answers on handcrafted vectors plus the
  * composition contract (outliers -> minus -> reindex). */
class EmbeddingsSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(100.0f, -100.0f, 100.0f))) // the corrupted row
      .toDF("vec_id", "embedding")
  }

  test("outliers ranks the corrupted vector first; minus removes it") {
    val e = Embeddings(vecs)
    val out = e.outliers(1).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("vec_id") === 3L)
    val clean = e.minus(e.outliers(1))
    assert(clean.count() === 3)
    assert(!clean.collect().map(_.getAs[Long]("vec_id")).contains(3L))
  }

  test("topkFor returns neighbors in exact cosine order") {
    import spark.implicits._
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("query_id", "qemb")
    val got = Embeddings(vecs).topkFor(q, k = 3).collect()
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    // cos(v1)=0.8, cos(v3)=100/sqrt(3e4)~0.577, cos(v2)=0
    assert(got.toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("dimStats: zero-variance dimension is exactly dead") {
    import spark.implicits._
    val const = Seq((0L, Array(1.0f, 5.0f)), (1L, Array(3.0f, 5.0f)),
      (2L, Array(9.0f, 5.0f))).toDF("vec_id", "embedding")
    val stats = Embeddings(const).dimStats().collect()
      .map(r => r.getAs[Long]("i") -> r).toMap
    assert(stats(1L).getAs[Long]("var_micro2") === 0L)
    assert(stats(1L).getAs[Long]("dead") === 1L)
    assert(stats(0L).getAs[Long]("dead") === 0L)
  }

  test("quantized: a constant vector has scale 0, codes 0, zero error") {
    import spark.implicits._
    val const = Seq((7L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val r = Embeddings(const).quantized().collect().head
    assert(r.getAs[Long]("q_sum") === 0L)
    assert(r.getAs[Double]("err_max") === 0.0)
  }

  test("autoK: 8 floor, N/4096 growth, 65536 literal-codebook cap") {
    assert(Embeddings.autoK(0L) === 8)
    assert(Embeddings.autoK(32768L) === 8)
    assert(Embeddings.autoK(40960L) === 10)
    assert(Embeddings.autoK(100L * 1000 * 1000) === 24414)
    assert(Embeddings.autoK(10L * 1000 * 1000 * 1000) === 65536)
  }

  test("semdedup auto-k on a skewed collection: verdicts equal global brute-force greedy") {
    import spark.implicits._
    // two orthogonal direction families with SKEWED sizes (500 vs 12).
    // Every member of a family is a power-of-two scaling of its base
    // direction: cosine within a family is EXACTLY 1.0 (scale cancels,
    // all arithmetic on exact binary floats), across families exactly
    // 0.0 < 0.35. Cosine ties across centroids resolve by the min-id
    // tie-break, so each family lands in ONE cell no matter how the
    // auto-k codebook seeds/refines — which makes the within-cell
    // SemDeDup verdict provably equal to the GLOBAL brute-force greedy
    // rule (dup iff ANY earlier vector has cos >= 0.35), the strongest
    // oracle available for the auto-k path. Family-B members get ids
    // 6, 7 and the tail so the Lloyd seed window spans both families.
    val a = Array(1.0f, 0.0f, 0.5f, 0.0f)
    val b = Array(0.0f, 1.0f, 0.0f, 0.25f)
    def scaled(base: Array[Float], pow: Int) = base.map(x => x * (1 << pow))
    val bIds = Set(6L, 7L) ++ (500L until 510L)
    val rows = (0L until 512L).map { id =>
      val fam = if (bIds(id)) b else a
      (id, scaled(fam, (id % 5).toInt))
    }
    val vecs = rows.toDF("vec_id", "embedding").repartition(4)
    val got = Embeddings(vecs).semdedup(lloydIters = 1).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("kept"), r.getAs[Long]("n_earlier_dups"),
          r.getAs[Long]("max_cos_q")))).toMap
    assert(got.size === 512)
    // brute-force greedy over the full collection, no cells involved
    val ids = rows.map(_._1)
    ids.foreach { id =>
      val sameFam = ids.filter(o => o < id && bIds(o) == bIds(id))
      val (kept, nDups, maxCos) = got(id)
      assert(kept === sameFam.isEmpty, s"vec $id kept mismatch")
      assert(nDups === sameFam.size.toLong, s"vec $id dup count")
      if (sameFam.nonEmpty) assert(maxCos === 1000000L, s"vec $id cos")
    }
    // the cell structure really is the two families (one cell each)
    val cells = Embeddings(vecs).semdedup(lloydIters = 1)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells.filter(kv => bIds(kv._1)).values.toSet.size === 1)
    assert(cells.filterNot(kv => bIds(kv._1)).values.toSet.size === 1)
  }
}
