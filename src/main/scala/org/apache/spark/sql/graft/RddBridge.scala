package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Access to the leaf RDDs a checkpointed DataFrame is built over.
  *
  * `Dataset.checkpoint`/`localCheckpoint` return a Dataset whose analyzed
  * plan is a [[LogicalRDD]] wrapping the (reliably or locally)
  * checkpointed internal RDD. The public Dataset API exposes no way back
  * to that RDD, but releasing its storage — executor blocks for
  * localCheckpoint, durable files for reliable checkpoint — needs it:
  * `Dataset.unpersist` only talks to the cache manager, and Spark's
  * ContextCleaner deletes reliable checkpoint files only when
  * `spark.cleaner.referenceTracking.cleanCheckpoints` is set (default
  * false) AND the RDD is GC'd, which for a long-lived loop means never.
  * Same bridge pattern as [[DatasetBridge]]: a thin accessor in the
  * `org.apache.spark.sql` namespace, not a fork.
  */
object RddBridge {
  /** The internal RDDs of every LogicalRDD leaf in `df`'s analyzed plan
    * (one, for a frame returned by checkpoint/localCheckpoint). */
  def leafRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr.rdd }.toSeq

  /** Clamp a checkpoint-returned frame's propagated statistics.
    *
    * `Dataset.checkpoint`/`localCheckpoint` copy the PRE-checkpoint
    * plan's `Statistics` onto the returned [[LogicalRDD]] (so downstream
    * broadcast decisions survive the truncation). In an iterative loop
    * whose round SELF-JOINS the previous checkpoint (pointer jumping in
    * connectedComponents), `SizeInBytesOnlyStatsPlanVisitor` SQUARES
    * sizeInBytes every round — the BigInt's digit count doubles per
    * round, and past ~20 rounds the driver livelocks multiplying
    * million-digit integers inside stats estimation (observed: main
    * thread pinned in BigInteger.multiplyToomCook3 on a diameter-heavy
    * graph). Clamping each checkpoint's stats at Long.MaxValue keeps
    * every loop's stats arithmetic on word-sized integers while leaving
    * REAL (small) stats — the ones broadcast planning needs — untouched.
    * Returns `df` unchanged unless its plan is exactly a LogicalRDD with
    * oversized stats. */
  def clampStats(df: DataFrame): DataFrame = {
    val cap = BigInt(Long.MaxValue)
    df.queryExecution.analyzed match {
      case lr: LogicalRDD
          if lr.stats.sizeInBytes > cap || lr.stats.rowCount.exists(_ > cap) =>
        val s = lr.stats
        val clamped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
          sizeInBytes = s.sizeInBytes.min(cap),
          rowCount = s.rowCount.map(_.min(cap)),
          attributeStats = s.attributeStats,
          isRuntime = s.isRuntime)
        val fresh = new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          Some(clamped), None)
        DatasetBridge.ofRows(df.sparkSession, fresh)
      case _ => df
    }
  }

  /** True iff `df`'s analyzed plan is exactly one [[LogicalRDD]] leaf —
    * the shape checkpoint/localCheckpoint return. A frame DERIVED from a
    * checkpoint (projection, join of two checkpointed inputs) is not. */
  def isSingleLogicalRdd(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case _: LogicalRDD => true
      case _             => false
    }
}
