package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a (x, y) grid cell on the 2^bits × 2^bits grid —
  * the locality-preserving alternative to the Z-order interleave
  * ([[graft.ops.Partitioning.zValue]]): consecutive Hilbert indices are
  * always grid-adjacent (Z-order jumps at power-of-two seams), so files
  * cut from a Hilbert-sorted layout have tighter per-file bounding boxes
  * on BOTH dimensions — measurably better min/max pruning for box
  * queries on skewed data (PartitioningSpec quantifies both layouts).
  *
  * The index is the classic per-bit fold (Wikipedia "Hilbert curve",
  * xy2d): walk bit planes high→low, accumulate `s² · ((3·rx) xor ry)`,
  * rotate/reflect the quadrant. The fold is STATEFUL per bit, so a pure
  * Column formulation would double its expression tree per plane (2^bits
  * nodes by substitution) — this native expression keeps it a 16-step
  * loop in both interpreted and codegen'd form, and the SAME recurrence
  * unrolls into the oracle's CTE chain (q_hilbert) one step per plane.
  *
  * Fail-loud domain: both inputs must lie in [0, 2^bits) — an
  * out-of-range coordinate would silently land on another cell's curve
  * position and corrupt the layout's pruning guarantee.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"hilbert: bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hilbert expects (bigint, bigint), got ${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val lim = 1L << bits
      s"""
         |{
         |  long $x = $a;
         |  long $y = $b;
         |  if ($x < 0L || $x >= ${lim}L || $y < 0L || $y >= ${lim}L) {
         |    throw new IllegalArgumentException(
         |      "hilbert: coordinate (" + $x + ", " + $y + ") outside [0, " + ${lim}L + ")");
         |  }
         |  long $d = 0L;
         |  for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |    long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |    long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |    $d += $s * $s * ((3L * $rx) ^ $ry);
         |    if ($ry == 0L) {
         |      if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |      long $t = $x; $x = $y; $y = $t;
         |    }
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** The reference fold — shared by the interpreted path and specs. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val lim = 1L << bits
    require(x0 >= 0 && x0 < lim && y0 >= 0 && y0 < lim,
      s"hilbert: coordinate ($x0, $y0) outside [0, $lim)")
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(x: Column, y: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(HilbertIndex(
      GraftBridge.expression(x), GraftBridge.expression(y), bits))
  }
}
