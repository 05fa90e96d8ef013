package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** A constant 1 that REFUSES to constant-fold.
  *
  * Purpose: Spark 4's `EliminateWindowPartitions` optimizer rule strips
  * FOLDABLE window partition keys, so `Window.partitionBy(lit(1))` — the
  * classic "this window is single-partition ON PURPOSE" idiom — silently
  * degrades back to an unpartitioned window and its scary
  * `WindowExec: No Partition Defined` runtime warning. The repo reserves
  * that warning for true scale bugs (a corpus-sized relation serialized
  * through one task); windows over PROVABLY BOUNDED relations (decile
  * grids, |sources|/|languages| censuses, segment-count offsets of the
  * two-phase global rank) declare their intent with [[Win.bounded]]
  * instead, which survives optimization because `foldable = false`.
  *
  * Deterministic (window partition keys must be), nullable = false,
  * evaluates to 1 for every row — execution is byte-for-byte the same
  * single-partition window the unpartitioned spec would run;
  * CodegenFallback's virtual call is irrelevant on bounded inputs (and
  * WindowExec is never whole-stage-codegen'd anyway).
  */
case class NonFoldableOne() extends LeafExpression with CodegenFallback {
  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def eval(input: InternalRow): Any = 1
  override def prettyName: String = "bounded_win_key"
}

object Win {
  /** Partition key for a single-partition window over a relation the
    * call site can PROVE is bounded (post-aggregation grids, never raw
    * corpus rows). `Window.partitionBy(Win.bounded)` = same execution
    * as an unpartitioned window, minus the warning that should only
    * ever mean "someone windowed the corpus". */
  def bounded: Column = ColumnBridge.column(NonFoldableOne())
}
