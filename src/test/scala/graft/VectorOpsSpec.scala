package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Similarity

/** Native dot/norm kernels: value correctness on float and double arrays,
  * agreement between the codegen and interpreted paths, and the LSH sign
  * matrix's md5 derivation (must match the DuckDB oracle's). */
class VectorOpsSpec extends SparkSpec {

  test("dot and norm on array<double> match a reference loop") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val Row(d: Double, n: Double) =
      df.select(VectorOps.dot($"a", $"b"), VectorOps.l2norm($"a")).head()
    assert(d === 32.0)
    assert(n === math.sqrt(14.0))
  }

  test("dot widens array<float> exactly like double casts") {
    import spark.implicits._
    val af = Array(1.5f, -2.25f, 0.125f)
    val bf = Array(3.0f, 4.5f, -8.0f)
    val expected = af.zip(bf).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val df = Seq((af, bf)).toDF("a", "b")
    val Row(d: Double) = df.select(VectorOps.dot($"a", $"b")).head()
    assert(d === expected)
  }

  test("codegen and interpreted evaluation agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val a = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val b = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val df = Seq((a, b)).toDF("a", "b")
    val viaCodegen = df.select(VectorOps.dot($"a", $"b")).head().getDouble(0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(VectorOps.dot($"a", $"b")).head().getDouble(0)
      assert(interp === viaCodegen)
    }
  }

  test("dot stops at the shorter array") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0))).toDF("a", "b")
    assert(df.select(VectorOps.dot($"a", $"b")).head().getDouble(0) === 10.0)
  }

  test("sign matrix matches md5 hex-digit rule") {
    // spot-check against an expression-level computation of the same rule
    import spark.implicits._
    val signs = Similarity.signMatrix(2, 4)
    val checks = for (p <- 0 until 2; d <- 1 to 4) yield (p, d)
    val df = checks.toDF("p", "d")
      .withColumn("sign",
        when(substring(md5(concat(col("p").cast("string"), lit(":"),
          col("d").cast("string"))), 1, 1) >= "8", 1.0).otherwise(-1.0))
    df.collect().foreach { r =>
      assert(signs(r.getInt(0))(r.getInt(1) - 1) === r.getDouble(2),
        s"sign mismatch at p=${r.getInt(0)} d=${r.getInt(1)}")
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
