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
}
