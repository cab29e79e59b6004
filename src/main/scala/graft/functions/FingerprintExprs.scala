package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass text tokenization for the fingerprint expressions
  * (same whitespace semantics as [[WordShingles]]).
  */
private[functions] object Tok {
  /** The Java-regex `\s` character class (NOT Character.isWhitespace, which
    * also matches U+2028/U+0085/...): the spec-asserted equivalences against
    * the relational `regexp_extract_all(text, "\\S+")` forms and the DuckDB
    * oracles must hold for any input, not just ASCII-whitespace corpora.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Whitespace-delimited tokens of `s`, in order. */
  def words(s: String): mutable.ArrayBuffer[String] = {
    val toks = mutable.ArrayBuffer.empty[String]
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    toks
  }

  /** Distinct n-word shingles joined by single spaces, first-seen order. */
  def shingles(toks: mutable.ArrayBuffer[String], n: Int): java.util.LinkedHashSet[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    if (toks.length < n) return seen
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    seen
  }
}

/** 64-bit SimHash of a text column as a single narrow map — bit b of the
  * result is the sign of Σ over DISTINCT whitespace tokens of
  * (2·bit_b(xxhash64(token)) − 1), identical to the relational formulation
  *
  *   explode(array_distinct(tokens)) → xxhash64 → groupBy(doc) 64 bit-sums
  *
  * (reference dedup semantics; asserted equal in FingerprintExprsSpec) but
  * with NO shuffle: the explode+groupBy form moves every token row through
  * an exchange and aggregates 64 columns, while this computes the
  * fingerprint inline per row. At 100 TB that is the difference between a
  * full-corpus shuffle and a map-only scan. Empty/whitespace-only text
  * yields 0L (the relational form drops such docs at the explode — the only
  * divergence).
  *
  * SQL: `simhash64(text)` via [[graft.GraftExtensions]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects string, got ${t.sql}")
    }

  /** Public so generated code can call back into it. */
  def compute(input: UTF8String): Long = {
    val toks = Tok.words(input.toString)
    val distinct = new java.util.HashSet[String]()
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (distinct.add(toks(i))) {
        // same hash as the SQL function xxhash64(token): seed 42
        val h = XxHash64Function.hash(UTF8String.fromString(toks(i)), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a text column in ONE pass: k minimums of
  * xxhash64(i, shingle) over the distinct n-word shingles, i = 0..k−1.
  *
  * Semantically identical to the higher-order-function chain
  *
  *   transform(sequence(0, k−1), i → array_min(transform(shingles, x → xxhash64(i, x))))
  *
  * (asserted in FingerprintExprsSpec) but evaluated in a single tight loop:
  * the HOF form is interpreted per element and materializes k intermediate
  * hash arrays per row. Empty shingle sets yield an array of k nulls, same
  * as `array_min` of an empty array. Feeds [[graft.ops.Dedup.minhashBands]]
  * — column-only, so it runs unchanged on streaming DataFrames.
  *
  * SQL: `minhash_sig(text[, n, k])` via [[graft.GraftExtensions]].
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1, "minhash_sig needs n >= 1, k >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects string, got ${t.sql}")
    }

  // xxhash64(i, x) folds left over the arguments: the running hash of the
  // int literal i becomes the seed for hashing x. Precompute those k seeds.
  @transient private lazy val seeds: Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = XxHash64Function.hash(i, IntegerType, 42L)
      i += 1
    }
    out
  }

  /** Public so generated code can call back into it. */
  def compute(input: UTF8String): GenericArrayData = {
    val sh = Tok.shingles(Tok.words(input.toString), n)
    if (sh.isEmpty) return new GenericArrayData(new Array[Any](k)) // k nulls
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val it = sh.iterator()
    while (it.hasNext) {
      val u = UTF8String.fromString(it.next())
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(u, StringType, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FingerprintExprs {

  /** 64-bit SimHash fingerprint of a string column, shuffle-free. */
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  /** array<long> MinHash signature (k hashes over n-word shingles). */
  def minhashSig(c: Column, n: Int = 3, k: Int = 16): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), n, k))
}
