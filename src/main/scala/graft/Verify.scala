package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * oracle_sql.json is written FIRST: in round 1 it was written after all
  * queries, so a driver-side timeout mid-run left no oracle file at all and
  * the whole round's correctness came back empty. Queries then run on a
  * thread pool — cold-JVM JIT/janino compilation is the dominant per-query
  * cost at sf0.01 (up to ~40 s each, <1 s warm) and compiles fine in
  * parallel, so wall time drops roughly by the pool width. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to these query names (local debugging;
    // the driver always calls with exactly two args = full run)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_CHECKPOINT_DIR runs the ENTIRE suite in durable-checkpoint
    // mode (every Ckpt truncation goes to the reliable store instead of
    // executor blocks) — the whole-surface proof that the preemption-
    // safety knob changes no result: the driver's DuckDB gate must come
    // back identical with and without it.
    sys.env.get("GRAFT_CHECKPOINT_DIR").foreach { d =>
      spark.conf.set(graft.operators.Ckpt.DirConf, d)
      System.err.println(s"[verify] durable checkpoint mode: $d")
    }
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    System.err.println(s"[verify] wrote oracle_sql.json (${SparkEntry.oracleSql.size} oracles)")
    val pool = Executors.newFixedThreadPool(
      math.min(8, Runtime.getRuntime.availableProcessors))
    val failures = new ConcurrentLinkedQueue[String]()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    selected.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(s"[verify] $name ok")
          } catch { case e: Throwable =>
            failures.add(name)
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    pool.shutdown()
    if (!pool.awaitTermination(2, TimeUnit.HOURS)) {
      // queries still queued/running after the timeout produced no output
      // — record them as failures instead of silently over-reporting "ok"
      System.err.println("[verify] TIMED OUT; cancelling in-flight queries")
      pool.shutdownNow()
      spark.sparkContext.cancelAllJobs()
      selected.keys.foreach { name =>
        if (!java.nio.file.Files.exists(Paths.get(s"$outDir/$name/_SUCCESS"))
            && !failures.contains(name))
          failures.add(name)
      }
    }
    System.err.println(
      s"[verify] done: ${selected.size - failures.size}/${selected.size} ok" +
        (if (failures.isEmpty) "" else s"; failed: ${String.join(",", failures)}"))
    spark.stop()
  }
}
