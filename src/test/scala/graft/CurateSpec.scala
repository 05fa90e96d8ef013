package graft

import org.apache.spark.sql.functions._

import graft.api.Curate

/** The fluent curation builder: verdicts compose into one scan with zero
  * joins, values match the standalone operators, and the only shuffle is
  * the opted-in dedup window. */
class CurateSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat and the dog sat in the house of it"),
      (2L, "the cat and the dog sat in the house of it"), // exact dup of 1
      (3L, "der schein ein schatten der einer"),
      (4L, "1 2 3 4 5 6 7 8 9"))
      .toDF("doc_id", "text")
  }

  test("N verdicts compose into one scan, zero joins, one projection") {
    docs.write.mode("overwrite").parquet("target/curate_docs")
    val out = Curate(spark.read.parquet("target/curate_docs"))
      .langId()
      .quality()
      .tokenCount()
      .verdict("has_digits", col("text").rlike("[0-9]"))
      .result()
    val plan = out.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
    // without exactDedup there is NO shuffle at all — pure map-side
    assert(!plan.contains("Exchange"), plan)
    assert(out.columns.toSeq ===
      Seq("doc_id", "predicted", "quality", "n_tokens", "has_digits"))
  }

  test("verdict values match the row semantics; dedup keeper + kept") {
    val out = Curate(docs)
      .langId()
      .tokenCount()
      .verdict("has_digits", col("text").rlike("[0-9]"))
      .exactDedup()
      .keepWhere(col("is_keeper") && !col("has_digits"))
      .result()
      .orderBy("doc_id")
      .collect()
    assert(out.map(_.getAs[String]("predicted")).toSeq ===
      Seq("en", "en", "de", "en")) // all-zero scores tie -> en precedence
    assert(out.map(_.getAs[Boolean]("is_keeper")).toSeq ===
      Seq(true, false, true, true)) // doc 2 loses to doc 1 on fingerprint
    assert(out.map(_.getAs[Boolean]("kept")).toSeq ===
      Seq(true, false, true, false)) // doc 4 dropped by has_digits
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq === Seq(11L, 11L, 6L, 9L))
  }

  test("custom fingerprint dedups on the caller's key") {
    val out = Curate(docs)
      .exactDedup(fingerprint = substring(col("text"), 1, 3))
      .result()
      .orderBy("doc_id")
      .collect()
    // docs 1, 2 share "the"; doc 3 "der"; doc 4 "1 2"
    assert(out.map(_.getAs[Boolean]("is_keeper")).toSeq ===
      Seq(true, false, true, true))
  }
}
