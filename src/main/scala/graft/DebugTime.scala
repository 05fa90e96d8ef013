package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch timing harness (not part of the driver contract). */
object DebugTime {

  class StageLog extends SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val wall = for {
        s <- si.submissionTime; c <- si.completionTime
      } yield (c - s) / 1000.0
      println(f"    stage ${si.stageId}%3d ${si.numTasks}%4d tasks " +
        f"wall=${wall.getOrElse(-1.0)}%7.2fs cpu=${m.executorRunTime / 1000.0}%8.2fs " +
        f"gc=${m.jvmGCTime / 1000.0}%7.2fs " +
        f"shuffleR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
        f"shuffleW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  ${si.name.takeWhile(_ != '(')}")
    }
  }

  /** Bench's pinned self-calibration probe: the window's own speed
    * constant, printed before and after the query list so cross-run
    * comparisons can be normalized (host windows shift 1.3-1.5x). */
  def calib(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0, 64L << 20, 1, 32)
        .selectExpr("sum(xxhash64(id) % 1000000007) AS h")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // codegen warm-up, untimed
    val xs = Seq.fill(3)(once()).sorted
    xs(1)
  }

  def time(label: String)(f: => DataFrame): Unit = {
    // best-of-3 (Bench's policy): the cold first run is JIT + page-cache
    // warm-up, not plan cost
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"== $label%-24s best=${ts.min}%8.2f s  runs=${ts.map(t => f"$t%.2f").mkString(", ")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc session confs for A/B runs: GRAFT_CONF="k=v;k=v"
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    if (sys.env.contains("GRAFT_STAGE_LOG"))
      spark.sparkContext.addSparkListener(new StageLog)
    println(f"== calib_pre  ${calib(spark)}%.4f s")
    names.foreach { n =>
      if (sys.env.contains("GRAFT_EXPLAIN"))
        SparkEntry.queries(n)(spark, dir).explain("formatted")
      // final ADAPTIVE plan (isFinalPlan=true, with codegen ids): execute
      // the Dataset's own QueryExecution once, then explain it
      if (sys.env.contains("GRAFT_EXPLAIN_FINAL")) {
        val df = SparkEntry.queries(n)(spark, dir)
        df.collect()
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      time(n)(SparkEntry.queries(n)(spark, dir))
    }
    println(f"== calib_post ${calib(spark)}%.4f s")
    spark.stop()
  }
}
