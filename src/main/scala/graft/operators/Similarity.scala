package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two paths: exact brute-force cosine top-k (the correctness baseline)
  * and signed-random-projection LSH bucketing (the 100 TB path: candidates
  * come from an equality join on an 8-bit bucket, so the scan side is
  * partitioned by bucket and only ~1/256 of vectors meet each query).
  *
  * Float discipline: vectors are cast float->double before any arithmetic
  * and dot products reduce strictly left-to-right (Catalyst `aggregate`),
  * matching the oracle's `list_reduce` element order, so scores are
  * bit-identical across engines. Outputs carry (query, rank, neighbor)
  * with cosine-then-id ordering so exact-duplicate vectors tie-break
  * deterministically.
  */
object Similarity {

  /** embedding as array<double>. */
  private def emb(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("emb"))
  }

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Exact cosine top-5 neighbors for query vectors (vec_id < 10) over the
    * whole collection. Brute force is the oracle-checkable baseline; the
    * query side is tiny so Spark broadcasts it and the big side streams —
    * no shuffle of the collection. */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).withColumn("nrm", norm($"emb"))
    val q = e.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"emb".as("qemb"), $"nrm".as("qnrm"))
    val scored = e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .withColumn("cos", dot($"qemb", $"emb") / ($"qnrm" * $"nrm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .where($"rank" <= 5)
      .select($"query_id", $"rank".cast("long").as("rank"), $"vec_id".as("neighbor_id"))
  }

  /** Signed-random-projection LSH ANN: 8 md5-derived hyperplanes give an
    * 8-bit bucket per vector; neighbors are searched only within the
    * query's bucket (equality join — at scale, a bucket-partitioned
    * co-located join), ranked by exact cosine, top-3. Recall trades off
    * against the 1/256 candidate reduction; multi-probe or more tables
    * would raise it without changing the plan shape. */
  def lshAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).withColumn("nrm", norm($"emb"))
    // plane p in 0..7; sign(p, d) for dimension d in 1..64 from the first
    // hex digit of md5("p:d") — identical in the oracle.
    val planes = spark.range(8).select($"id".cast("int").as("p"))
    val proj = e.crossJoin(broadcast(planes))
      .withColumn("proj", aggregate(
        transform($"emb", (x, i) =>
          x * when(substring(md5(concat($"p".cast("string"), lit(":"),
            (i + 1).cast("string"))), 1, 1) >= "8", 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x))
    val bucketed = proj.groupBy($"vec_id")
      .agg(sum(when($"proj" > 0, expr("shiftleft(CAST(1 AS BIGINT), p)")).otherwise(0L))
        .as("bucket"))
      .join(e, "vec_id")
    val q = bucketed.where($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"bucket".as("qbucket"),
        $"emb".as("qemb"), $"nrm".as("qnrm"))
    val scored = bucketed.join(broadcast(q),
        $"bucket" === $"qbucket" && $"vec_id" =!= $"query_id")
      .withColumn("cos", dot($"qemb", $"emb") / ($"qnrm" * $"nrm"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .where($"rank" <= 3)
      .select($"query_id", $"rank".cast("long").as("rank"), $"vec_id".as("neighbor_id"))
  }
}
