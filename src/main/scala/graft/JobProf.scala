package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch jobs-per-query profiler (not part of the driver contract).
  *
  * The 251 sub-second queries spend their time at the per-job scheduler
  * floor, so their aggregate cost is (jobs per query) x (fixed job
  * latency). This main runs every query twice (first run = JIT/codegen
  * warm-up) and reports, for the SECOND run: job count, stage count,
  * task count and wall — the histogram that tells us which query paths
  * pay avoidable actions (eager checkpoints, count probes, multi-action
  * constructions). Usage:
  *   sbt "runMain graft.JobProf /root/testdata/sf0.1 [qname ...]"
  */
object JobProf {

  class Counter extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      ()
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks.toLong)
      ()
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0L) }
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
    val ctr = new Counter
    spark.sparkContext.addSparkListener(ctr)
    val sel: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (names.isEmpty) SparkEntry.queries.toSeq
      else names.map(n => n -> SparkEntry.queries(n)).toSeq
    // drain listener-bus stragglers between runs so counts don't bleed
    def drain(): Unit = Thread.sleep(120)
    val rows = sel.flatMap { case (name, fn) =>
      try {
        fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
        drain()
        ctr.reset()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        Some((name, ctr.jobs.get(), ctr.stages.get(), ctr.tasks.get(), wall))
      } catch {
        case e: Throwable =>
          println(s"!! $name failed: ${e.getClass.getSimpleName}")
          None
      }
    }
    println(f"${"query"}%-28s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%7s ${"wall_s"}%8s")
    rows.sortBy(-_._2).foreach { case (n, j, s, t, w) =>
      println(f"$n%-28s $j%5d $s%7d $t%7d $w%8.2f")
    }
    val totJ = rows.map(_._2).sum
    val totW = rows.map(_._5).sum
    println(f"TOTAL ${rows.size} queries: jobs=$totJ wall=$totW%.1f s")
    spark.stop()
  }
}
