package graft
import org.apache.spark.sql.SparkSession
import java.util.concurrent.{Executors, TimeUnit}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local[32] analogue of cluster defaults: AQE's byte-based coalescing
      // assumes ~1MB of shuffle bytes is "one core's worth"; text/hash
      // stages here are CPU-dense at tiny byte sizes, so keep them wide.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      // Verify pins UTC; without the same pin here, TIMESTAMP_NTZ events
      // reinterpret in the host zone and epoch-anchored queries (q149
      // midpoint, q151-q153 hourly buckets) time different semantics than
      // the verified path.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOne(dir: String, name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      // noop sink materializes every output column (count() would let
      // Catalyst prune the computed projections away — not a measurement)
      try { fn(spark, dir).write.format("noop").mode("overwrite").save()
            Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => Left(e.getClass.getSimpleName) }
    }
    // Untimed PARALLEL warm-up: the first execution of each query pays
    // janino codegen + JIT of interpreted-eval paths (measured up to 40 s
    // cold, <1 s warm) — round 1 spent 40+ min in sequential warm-up.
    // Compilation parallelizes cleanly, so warm up on a thread pool; only
    // the measured pass below runs queries one at a time.
    def warmAll(dir: String): Unit = {
      val pool = Executors.newFixedThreadPool(
        math.min(8, Runtime.getRuntime.availableProcessors))
      SparkEntry.queries.foreach { case (name, fn) =>
        pool.submit(new Runnable { def run(): Unit = { runOne(dir, name, fn); () } })
      }
      pool.shutdown()
      if (!pool.awaitTermination(1, TimeUnit.HOURS)) {
        // don't let straggling warm-up jobs contaminate the timed passes
        System.err.println("[bench] warm-up timed out; cancelling in-flight jobs")
        pool.shutdownNow()
        spark.sparkContext.cancelAllJobs()
        pool.awaitTermination(5, TimeUnit.MINUTES)
      }
    }
    // Warm-up scale: the smallest sibling SF dir if present (cheap janino/
    // JIT warm), else the target dir itself — no literal string surgery on
    // the path (round-1 version silently tripled wall time for non-sf0.1
    // dirs by "warming up" on the full-size data).
    val parent = new java.io.File(sfDir).getParentFile
    val warmDir = Option(parent)
      .flatMap { p =>
        val sibs = Option(p.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("sf"))
          .flatMap(f => f.getName.stripPrefix("sf").toDoubleOption.map(_ -> f.getPath))
        if (sibs.isEmpty) None else Some(sibs.minBy(_._1)._2)
      }
      .getOrElse(sfDir)
    warmAll(warmDir)
    warmAll(sfDir)
    // Pinned self-calibration probe (VERDICT r13 item 3): a fixed
    // data-independent CPU+scheduler workload (64M xxhash64 over 32
    // tasks) timed around the measured passes. Host-window variance
    // dominated round-over-round comparison (identical code measured
    // 183 s vs 240 s in different windows); `calib_s` carries the
    // window's own speed constant in the artifact, so cross-round
    // per-query ratios can be normalized (r_norm = r_raw *
    // calib_then/calib_now) without manual worktree A/Bs.
    def calibOnce(): Double = {
      val t0 = System.nanoTime()
      // modulo keeps the ANSI sum inside long range (64M × 1e9 < 2^63)
      spark.range(0, 64L << 20, 1, 32)
        .selectExpr("sum(xxhash64(id) % 1000000007) AS h")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def calibMedian(n: Int): Double = {
      val xs = Seq.fill(n)(calibOnce()).sorted
      xs(xs.size / 2)
    }
    calibOnce() // codegen warm-up for the probe itself, untimed
    val calibPre = calibMedian(5)
    // Best-of-3 timed passes: host/VM contention inflates individual runs
    // 2-4x non-deterministically (measured: identical back-to-back FULL
    // bench totals of 30.7 s and 43.8 s); the per-query minimum across
    // three sequential passes is the stable capability number.
    def timedPass(): Map[String, Either[String, Double]] =
      SparkEntry.queries.map { case (name, fn) => name -> runOne(sfDir, name, fn) }
    val passes = Seq(timedPass(), timedPass(), timedPass())
    val calibPost = calibMedian(5)
    // the suite's normalization constant: median of the two brackets —
    // robust to a window shift DURING the run showing up in only one
    val calib = (calibPre + calibPost) / 2
    val results = passes.head.keys.map { name =>
      val rs = passes.map(_(name))
      val best = rs.collect { case Right(v) => v }
      name -> (if (best.nonEmpty) Right(best.min): Either[String, Double]
               else rs.head)
    }.toMap
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val failed = results.collect { case (k, Left(e)) => k -> e }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.map { case (k, e) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val total = ok.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","calib_s":$calib,"calib_pre":$calibPre,"calib_post":$calibPost,"queries":$qs,"failed":$fs,"sf":"$sfDir"}"""
    // Full-precision record goes to the file; stdout gets ONE compact line
    // as the LAST output. The driver tail-captures stdout and the 79-query
    // full-precision map outgrew it (BENCH_r03/r04 read "parsed": null) —
    // total-first field order + millisecond-rounded per-query values keep
    // the whole line inside the capture window.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_last.json"), line + "\n")
    catch { case _: Throwable => () }
    // Round-stamped per-query record (VERDICT r7 item 5): the driver's
    // BENCH_rN.json only tail-captures stdout, so the full 208-query map
    // never survives into a round artifact and r(N-1)->rN per-query
    // regression diffs were impossible. Append every full-precision run
    // (wall-clock stamped) to bench_history.jsonl — committed per round,
    // so the history IS the round-over-round record.
    try {
      val stamped = s"""{"ts":"${java.time.Instant.now()}",""" + line.drop(1)
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_history.jsonl"),
        stamped + "\n", java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      // per-round full-precision snapshot file (VERDICT r8 item 7):
      // BENCH_QUERIES_r07-style artifacts, minted whenever the runner
      // names the round (GRAFT_ROUND=NN); the history line above is the
      // always-on fallback
      sys.env.get("GRAFT_ROUND").foreach { r =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"BENCH_QUERIES_r$r.json"), stamped + "\n")
      }
    } catch { case _: Throwable => () }
    def ms3(v: Double): Double = math.round(v * 1000) / 1000.0
    val qsC = ok.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":${ms3(v)}" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${ms3(total)},"unit":"sec","calib_s":${ms3(calib)},"sf":"$sfDir","n_queries":${ok.size},"failed":$fs,"queries":$qsC}""")
    // The driver keeps only the LAST ~2000 chars of stdout; the 158-query
    // line above is ~3.3 KB so its front (where the total sits) falls off
    // the capture. This tiny FINAL line always lands inside the tail.
    println(
      s"""{"metric":"total","value":${ms3(total)},"unit":"sec","total_s":${ms3(total)},"calib_s":${ms3(calib)},"n":${ok.size},"failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
