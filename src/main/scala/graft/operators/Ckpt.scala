package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation with a durability knob.
  *
  * Every iterative loop (CC, PageRank, HITS, Lloyd) and shared-relation
  * materialization in this engine truncates lineage between rounds so the
  * analyzer re-walks a constant-size plan instead of one that doubles per
  * iteration. The default mechanism is `localCheckpoint`: executor-local
  * blocks, no filesystem round-trip — right for local[32] and for clusters
  * with stable executors. But executor-LOCAL means executor-MORTAL: on a
  * 1000-executor cluster with preemption, losing one executor mid-loop
  * loses blocks whose lineage was deliberately severed — Spark cannot
  * recompute them and the job aborts (the reference's analog of this
  * failure domain is its connection-pool retry,
  * `/root/reference/fdf/factory.py:149-167`).
  *
  * `spark.graft.checkpointDir` swaps in RELIABLE `checkpoint()`: blocks go
  * to the named fault-tolerant store (HDFS/S3/local dir), surviving any
  * executor death; a preempted 50-round CC job resumes from materialized
  * state instead of aborting. The knob is a session conf so one pipeline
  * can run durable while another stays fast; loop clones created via
  * `newSession()` do NOT inherit runtime confs, so every clone site calls
  * [[propagate]] explicitly.
  *
  * Same laziness semantics as the call it replaces: `eager = false`
  * materializes at the first action (so a round's convergence probe stays
  * its only job), `eager = true` materializes now.
  */
object Ckpt {
  val DirConf = "spark.graft.checkpointDir"

  /** Copy the durability knob from a caller session onto a loop clone
    * (`newSession()` starts from the base conf, dropping runtime-set
    * values — without this the clone would silently fall back to
    * localCheckpoint and the knob would only "work" on non-cloned paths). */
  def propagate(from: SparkSession, to: SparkSession): Unit =
    from.conf.getOption(DirConf).foreach(to.conf.set(DirConf, _))

  /** Truncate `df`'s lineage: reliable `checkpoint()` when
    * `spark.graft.checkpointDir` is set, `localCheckpoint()` otherwise. */
  def apply(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir is context-global (shared by all session
        // clones) and mints a unique app subdir per call — only (re)set
        // it when the knob actually changed, or every loop round would
        // mint a fresh directory. getCheckpointDir returns the QUALIFIED
        // subdir (e.g. file:/dir/<uuid>), so match on containment of the
        // scheme-stripped knob value.
        val bare = dir.replaceFirst("^[a-z][a-z0-9+.-]*:(//)?", "")
        if (!sc.getCheckpointDir.exists(_.contains(bare)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  def apply(df: DataFrame): DataFrame = apply(df, eager = true)
}
