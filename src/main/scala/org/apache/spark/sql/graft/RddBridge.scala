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

  /** True iff `df`'s analyzed plan is exactly one [[LogicalRDD]] leaf —
    * the shape checkpoint/localCheckpoint return. A frame DERIVED from a
    * checkpoint (projection, join of two checkpointed inputs) is not. */
  def isSingleLogicalRdd(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case _: LogicalRDD => true
      case _             => false
    }
}
