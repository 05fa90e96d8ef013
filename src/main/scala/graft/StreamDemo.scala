package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Events

/** Runnable streaming entry: drives the event-stream pipeline end-to-end
  * over a testdata dir (arg 1, default sf0.001) — windowed agg, session
  * windows, and a wfevent wait — printing one summary line each.
  * Usage: runMain graft.StreamDemo [sfDir] */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(df: org.apache.spark.sql.DataFrame, name: String, mode: String): Long = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      spark.table(name).count()
    }

    val stream = Events.readEventStream(spark, sfDir)
    println(s"windowed_agg rows: ${run(Events.windowedAgg(stream), "d_win", "complete")}")
    println(s"session_agg rows: ${run(Events.sessionAgg(stream), "d_sess", "complete")}")
    val rows = Events.waitForEvent(spark, stream, "click", timeoutMs = 60000)
    println(s"wfevent(click) first batch: ${rows.length} events")
    spark.stop()
  }
}
