package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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

/** All random-hyperplane LSH signatures of a vector in ONE expression:
  * result[t] = Σ_b (dot(vec, plane[t][b]) >= 0 ? 1<<b : 0) for t tables.
  *
  * Exists because composing this from `tables × bits` separate DotProduct
  * calls (the obvious form) builds an expression tree with thousands of
  * literal plane coefficients — every stage that touches it (projection,
  * join, broadcast build) pays ~1 s of analysis + janino compilation even
  * on a 2000-row input, and the cost recurs per stage because each fused
  * WholeStageCodegen method inlines the whole tree. Here the planes ride
  * along as ONE flat double[] reference object and the generated code is a
  * triple loop — tiny source, compiled once.
  *
  * @param flatPlanes row-major [t][b][i] → flat(((t*bits)+b)*dim + i)
  */
case class LshSignatures(child: Expression, flatPlanes: Array[Double],
    tables: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(tables > 0 && bits > 0 && bits <= 30, "bad tables/bits")
  require(flatPlanes.length % (tables * bits) == 0, "planes shape mismatch")
  private val dim: Int = flatPlanes.length / (tables * bits)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_signatures expects array<float|double>, got ${t.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"lsh_signatures: vector dim ${v.numElements()} != plane dim $dim")
    val f = isFloat
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val off = (t * bits + b) * dim
        var s = 0.0
        var i = 0
        while (i < dim) {
          s += flatPlanes(off + i) * (if (f) v.getFloat(i).toDouble else v.getDouble(i))
          i += 1
        }
        if (s >= 0) sig |= (1 << b)
        b += 1
      }
      out(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", flatPlanes, "double[]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val off = ctx.freshName("off")
      val getV = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |{
         |  if ($v.numElements() != $dim) {
         |    throw new IllegalArgumentException(
         |      "lsh_signatures: vector dim " + $v.numElements() + " != plane dim " + $dim);
         |  }
         |  int[] $out = new int[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    int $sig = 0;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      int $off = ($t * $bits + $b) * $dim;
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $dim; $i++) { $s += $planesRef[$off + $i] * ($getV); }
         |      if ($s >= 0) $sig |= (1 << $b);
         |    }
         |    $out[$t] = $sig;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmin-cluster assignment against a fixed codebook in ONE expression:
  * result = the index j in [0, k) minimizing Σ_i (v[i] - c[j][i])², ties
  * broken toward the SMALLEST j (strict `<` keeps the first minimum) — the
  * per-row kernel of Lloyd's k-means ([[graft.ops.Lloyd]]).
  *
  * Operates on the QUANTIZED integer vectors Lloyd trains on (array<long>),
  * so distances are exact integer sums — reproducible across engines,
  * partitionings and reruns, which is what lets the training fixed point
  * itself sit under a hash-compare oracle. The centroids ride along as one
  * flat long[] reference object (same trick as [[LshSignatures]]): tiny
  * generated source compiled once, no per-row allocation, k×dim multiplies
  * in a fused loop inside whole-stage codegen.
  *
  * @param flatCentroids row-major [j][i] → flat(j*dim + i)
  */
case class NearestCentroid(child: Expression, flatCentroids: Array[Long],
    k: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k > 0 && dim > 0 && flatCentroids.length == k * dim,
    "nearest_centroid: centroids shape mismatch")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<bigint>, got ${t.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector dim ${v.numElements()} != $dim")
    var best = 0
    var bestD = Long.MaxValue
    var j = 0
    while (j < k) {
      var s = 0L
      var i = 0
      while (i < dim) {
        val d = v.getLong(i) - flatCentroids(j * dim + i)
        s += d * d
        i += 1
      }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("centroids", flatCentroids, "long[]")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |{
         |  if ($v.numElements() != $dim) {
         |    throw new IllegalArgumentException(
         |      "nearest_centroid: vector dim " + $v.numElements() + " != $dim");
         |  }
         |  int $best = 0;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $s = 0L;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      long $d = $v.getLong($i) - $centsRef[$j * $dim + $i];
         |      $s += $d * $d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $j; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  /** Argmin cluster against a flat codebook (see [[NearestCentroid]]). */
  def nearestCentroid(vec: Column, centroids: Array[Array[Long]]): Column = {
    val k = centroids.length
    val dim = centroids.head.length
    GraftBridge.column(
      NearestCentroid(GraftBridge.expression(vec), centroids.flatten, k, dim))
  }

  /** array<int> of per-table LSH sign signatures (see [[LshSignatures]]). */
  def lshSignatures(vec: Column, planes: Array[Array[Array[Double]]]): Column = {
    val tables = planes.length
    val bits = planes.head.length
    val flat = planes.flatten.flatten
    GraftBridge.column(
      LshSignatures(GraftBridge.expression(vec), flat, tables, bits))
  }
}
