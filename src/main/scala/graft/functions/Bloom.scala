package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership as a first-class primitive, built on Spark's
  * own runtime-filter expression pair (`BloomFilterAggregate` builds,
  * `BloomFilterMightContain` probes — the exact machinery
  * `InjectRuntimeFilter` wires up automatically inside its size
  * thresholds). Exposing it explicitly covers the gap those thresholds
  * leave: a build side too big to broadcast-hash-join (say 10^9 keys,
  * tens of GB of rows) still fits a ~1 byte/key bloom, so the probe side
  * can be pruned MAP-SIDE before its shuffle — at 100 TB that's the
  * difference between shuffling the full fact table and shuffling only
  * the ~matching slice (plus the fpp tail).
  *
  * Both sides hash with `xxhash64` (seed 42) so build and probe agree;
  * the probe is a codegen'd expression on a foldable binary literal —
  * no UDF, no broadcast variable plumbing.
  */
object Bloom {

  /** Builds the filter over xxhash64(keyCol) of `keys`: one distributed
    * partial-aggregated job (each task builds a local bloom, partials OR
    * together) whose result is a single ~`expectedItems` x 1-byte binary
    * on the driver — the same footprint class as a broadcast dimension,
    * for a build side that can be orders of magnitude bigger. */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))), expectedItems)
      .toAggregateExpression()
    keys.select(ColumnBridge.column(agg).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))`: false -> definitely absent
    * (safe to drop), true -> present or false positive (verify exactly
    * downstream). Codegen'd; the bloom binary is a constant literal, so
    * the filter runs scan-side under whole-stage codegen. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))
}
