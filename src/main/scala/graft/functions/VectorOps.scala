package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity operators (SURVEY §4 custom
  * Catalyst inventory item 4). The embedding column is `array<float>`;
  * Spark's higher-order `aggregate`/`zip_with` lambdas are interpreted
  * per element (no codegen), which made brute-force cosine ~50x slower
  * than a tight loop. These expressions generate a plain Java loop inside
  * whole-stage codegen instead.
  *
  * Float discipline: elements are widened float->double before the
  * multiply, and accumulation is strictly left-to-right — the exact
  * operation order of the DuckDB oracle's
  * `list_reduce(list_transform(...), (a,b) -> a+b)`, so scores stay
  * bit-identical across engines.
  */
trait ArrayDoubleInput { self: Expression =>
  protected def checkArrayOfFloatingPoint(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float> or array<double>, got ${other.sql}")
    }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Left-to-right dot product of two float/double arrays (double result).
  * Lengths may differ; iteration stops at the shorter one. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ArrayDoubleInput {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkArrayOfFloatingPoint(left.dataType, "graft_dot")
    if (l.isFailure) l else checkArrayOfFloatingPoint(right.dataType, "graft_dot")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yv = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $xv * $yv; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** L2 norm: sqrt of the left-to-right sum of squares (double result). */
case class NormExpr(child: Expression)
    extends UnaryExpression with ArrayDoubleInput {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    checkArrayOfFloatingPoint(child.dataType, "graft_norm")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = elemIsFloat(child)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      val xv = if (elemIsFloat(child)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { final double $v = $xv; $acc += $v * $v; }
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_norm"
}

/** Left-to-right squared L2 distance of two float/double arrays (double
  * result): acc += (a_i - b_i)·(a_i - b_i) in index order — the exact
  * operation order of `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)),
  * 0.0, (acc,x) -> acc+x)`, so swapping the interpreted lambda for this
  * codegen loop is bit-identical (the round-14 optimization round
  * measured the lambda form interpreted-eval-bound in the q315/q319/
  * q321 centroid scans). Lengths may differ; iteration stops at the
  * shorter one (call sites pair equal-dimension vectors). */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ArrayDoubleInput {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkArrayOfFloatingPoint(left.dataType, "graft_sqdist")
    if (l.isFailure) l else checkArrayOfFloatingPoint(right.dataType, "graft_sqdist")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val xv = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yv = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { final double $d = $xv - $yv; $acc += $d * $d; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sqdist"
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2norm(a: Column): Column =
    ColumnBridge.column(NormExpr(ColumnBridge.expression(a)))

  def sqdist(a: Column, b: Column): Column =
    ColumnBridge.column(SqDistExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
