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

    // the unbounded path: wait on a rate-source stream that never ends
    // (live micro-batches, not AvailableNow), decode the event bytes
    import org.apache.spark.sql.functions.col
    val live = Events.rateEventStream(spark, rowsPerSecond = 200)
      .withColumn("shot", Events.decodeShot(col("event")))
      .withColumn("payload", Events.decodePayload(col("event")))
    val fired = Events.waitForEvent(spark, live, "purchase", timeoutMs = 60000,
      trigger = Trigger.ProcessingTime(0))
    println(s"wfevent(purchase) on unbounded rate stream: ${fired.length} events, " +
      s"first shot=${fired.head.getAs[Long]("shot")} payload=${fired.head.getAs[String]("payload")}")
    try {
      Events.waitForEvent(spark, live.where(col("seq") < 0), "purchase",
        timeoutMs = 2000, trigger = Trigger.ProcessingTime(0))
      println("wfevent timeout path: UNEXPECTED fire")
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        println("wfevent timeout path: timed out as expected")
    }
    spark.stop()
  }
}
