package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Relational, Similarity}

/** q104 z-order keys, q105 MAD outliers, q106 margin mining. */
class LayoutRobustSpec extends SparkSpec {

  private def mortonModel(d1: Long, d2: Long): Long =
    (0 until 8).map { i =>
      (((d1 >> i) & 1L) << (2 * i + 1)) | (((d2 >> i) & 1L) << (2 * i))
    }.sum

  test("morton key matches the bit-interleave model and is injective on the 8-bit grid") {
    import spark.implicits._
    val pairs = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pairs.toDF("d1", "d2")
      .select($"d1", $"d2", Layout.morton8($"d1", $"d2").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) => assert(got((a, b)) == mortonModel(a, b)) }
    assert(got.values.toSeq.distinct.size == pairs.size)
  }

  test("zorder file assignment keeps a lang's docs in few files (locality)") {
    import spark.implicits._
    val out = Layout.zorderKeys(spark, sfDir)
      .join(graft.sources.Tables.documents(spark, sfDir).select($"doc_id", $"lang"), "doc_id")
    val filesPerLang = out.groupBy($"lang")
      .agg(countDistinct($"file_id").as("nf")).collect()
      .map(_.getLong(1))
    val totalFiles = out.select($"file_id").distinct().count()
    // each language's rows concentrate: no language touches all files
    assert(filesPerLang.forall(_ < totalFiles))
  }

  test("MAD outliers match an in-memory lower-median model") {
    import spark.implicits._
    val rows = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def lowerMedian(xs: Seq[(Long, Long)]): Long = {
      // (value, tiebreak id) ascending; element at rank (n+1)/2 (1-based)
      val sorted = xs.sortBy { case (v, id) => (v, id) }
      sorted(((sorted.size + 1) / 2) - 1)._1
    }
    val byLang = rows.groupBy(_._2)
    val expect = byLang.toSeq.flatMap { case (_, ds) =>
      val med = lowerMedian(ds.map(d => (d._3, d._1)).toSeq)
      val devs = ds.map(d => (d._1, math.abs(d._3 - med)))
      val mad = lowerMedian(devs.map(d => (d._2, d._1)).toSeq)
      devs.filter(_._2 > 2 * mad).map(d => d._1)
    }.toSet
    val got = Relational.madOutliers(spark, sfDir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("margin mining: one row per label-0 query, neighbor from label 1, margin <= cos spread") {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.marginMining(spark, sfDir).collect()
    val nQueries = e.count(_._2 == 0)
    assert(out.length == nQueries)
    assert(out.map(_.getLong(0)).distinct.length == nQueries)
    out.foreach { r =>
      assert(e(r.getLong(0)) == 0)
      assert(e(r.getLong(1)) == 1)
      // margin can't exceed the top cosine's headroom over -1 neighbors
      assert(r.getLong(2) <= r.getLong(3) + 10000)
    }
  }
}
