package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst dot product over two numeric arrays (float or double
  * elements), accumulating in double, sequential left-to-right — the same
  * fold order as DuckDB's list_dot_product, so results are bit-identical.
  *
  * Exists because the composable form — `aggregate(zip_with(a, b, _*_), ...)`
  * — allocates an intermediate array per row and evaluates a lambda per
  * element; for all-pairs similarity (millions of rows × 64 dims) that
  * dominates runtime. This expression generates a tight fused loop inside
  * whole-stage codegen: no allocation, no virtual calls.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch (${n} vs ${y.numElements()})")
    }
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xi * yi
      i += 1
    }
    s
  }

  // Local names MUST come from ctx.freshName: when both inputs are
  // non-nullable, nullSafeCodeGen inlines this block without braces, so two
  // DotProducts in one codegen'd function (vecCosine = 3 dots in one
  // projection) would otherwise declare duplicate locals and fail janino
  // compilation — silently falling back to interpreted execution. The block
  // is additionally brace-wrapped for defense in depth.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val getX = if (elemType(left) == FloatType) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemType(right) == FloatType) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |{
         |  int $n = $a.numElements();
         |  if ($n != $b.numElements()) {
         |    throw new IllegalArgumentException(
         |      "vec_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |  }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += ($getX) * ($getY); }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  import org.apache.spark.sql.GraftBridge

  /** Column-level API for the native dot product. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine similarity built on the native dot product. */
  def vecCosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    vecDot(a, b) / (sqrt(vecDot(a, a)) * sqrt(vecDot(b, b)))
  }
}
