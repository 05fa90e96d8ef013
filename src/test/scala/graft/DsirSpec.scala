package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** q209 DSIR selection — model-level invariants on top of the DuckDB
  * hash gate. */
class DsirSpec extends SparkSpec {

  test("q209 selects only raw-pool docs, ranked consistently, deterministically") {
    import spark.implicits._
    val out = Sampling.dsirSelect(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 50)
    // ranks are 1..n with the documented (w_q desc, doc_id asc) order
    val rks = out.map(_.getAs[Long]("rk")).sorted
    assert(rks.toSeq === (1L to out.length))
    val ordered = out.sortBy(_.getAs[Long]("rk"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        val (wa, wb) = (a.getAs[Long]("w_q"), b.getAs[Long]("w_q"))
        assert(wa > wb || (wa == wb
          && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ =>
    }
    // the target slice never selects itself
    val targets = spark.read.parquet(s"$sfDir/documents.parquet")
      .where($"source" === "src0").select($"doc_id")
      .as[Long].collect().toSet
    assert(out.forall(r => !targets(r.getAs[Long]("doc_id"))))
    // derandomized: re-evaluation is bit-identical
    val again = Sampling.dsirSelect(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }
}
