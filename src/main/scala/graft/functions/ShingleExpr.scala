package graft.functions


import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in ONE pass: tokenize on
  * whitespace, join every n consecutive tokens with a single space, dedupe.
  *
  * Semantically identical to the composable form
  * `array_distinct(transform(sequence(...), i => array_join(slice(w,i,n))))`
  * (asserted in ShingleExprSpec) but ~7x faster: higher-order functions are
  * interpreted per element and re-materialize arrays per shingle, while this
  * runs a single tight loop over the UTF8String. Used by the dedup pipeline's
  * shingle stage (graft.queries.TextOps / graft.ops.Dedup hot path).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    // Tok tokenizes on the Java-regex \s charset — exactly what the
    // composable regexp_extract_all(text, "\\S+") form and the DuckDB
    // oracles split on (Character.isWhitespace would diverge on
    // U+2028/U+0085 etc.)
    val seen = Tok.shingles(Tok.words(input.asInstanceOf[UTF8String].toString), n)
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL word n-gram shingles in positional order, duplicates kept — the
  * positioned-k-gram form: element i (0-based) is the shingle starting at
  * token i+1. `posexplode` over this array recovers (position, gram) rows,
  * which is what exact-substring span detection needs (a duplicated gram
  * marks token positions p..p+n-1 as duplicated; see
  * [[graft.ops.Dedup.duplicateSpans]]).
  *
  * Value-equal to the composable HOF form
  * `transform(sequence(1, greatest(len-n+1, 0)), i => array_join(slice(w,i,n), ' '))`
  * (asserted in ShingleExprSpec) but one tight pass — same rationale as
  * [[WordShingles]].
  */
case class WordShinglesOrdered(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val toks = Tok.words(input.asInstanceOf[UTF8String].toString)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpr {
  /** Distinct word n-gram shingles of a string column. */
  def wordShingles(c: Column, n: Int = 3): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))

  /** All word n-gram shingles in positional order (duplicates kept). */
  def orderedShingles(c: Column, n: Int = 3): Column =
    GraftBridge.column(WordShinglesOrdered(GraftBridge.expression(c), n))
}
