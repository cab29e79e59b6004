package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): Rabin-Karp rolling hashes of every k-gram, then the
  * minimum hash of each w-window, deduplicated by position.
  *
  * Guarantee: two documents sharing any substring of length >= w + k - 1
  * share at least one fingerprint — so fingerprint overlap is a
  * containment/plagiarism detector, complementing shingle Jaccard (which
  * measures whole-document similarity).
  *
  * A custom Expression (not a UDF) so the hash loop runs on UTF8String bytes
  * without materializing a String per row; CodegenFallback is acceptable
  * here — the expression is itself a tight O(n) loop, not a composition the
  * optimizer needs to see through.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int,
    md5Mode: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val BASE = 257L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])

    val nh = n - k + 1
    val hashes =
      if (md5Mode) md5Hashes(bytes, nh)
      else rollingHashes(bytes, nh)
    var i = 0

    if (nh <= w) {
      var mn = hashes(0); i = 1
      while (i < nh) { if (unsignedLt(hashes(i), mn)) mn = hashes(i); i += 1 }
      return new GenericArrayData(Array(mn))
    }

    // robust winnowing: min of each window of w consecutive hashes,
    // recorded once per selected position
    val out = Array.newBuilder[Long]
    var lastPos = -1
    i = 0
    while (i + w <= nh) {
      var mnPos = i
      var jj = i + 1
      while (jj < i + w) {
        if (unsignedLt(hashes(jj), hashes(mnPos)) ||
          (hashes(jj) == hashes(mnPos) && jj > mnPos)) mnPos = jj
        jj += 1
      }
      if (mnPos != lastPos) { out += hashes(mnPos); lastPos = mnPos }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** Rabin-Karp rolling k-gram hashes: h_i = sum b[i+j]·BASE^(k-1-j),
    * wrap-around 2^64. The fast production hash (one pass, no allocation
    * per gram).
    */
  private def rollingHashes(bytes: Array[Byte], nh: Int): Array[Long] = {
    var pow = 1L
    var j = 1
    while (j < k) { pow *= BASE; j += 1 }
    val hashes = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < k) { h = h * BASE + (bytes(i) & 0xff); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = (h - (bytes(i - 1) & 0xff) * pow) * BASE + (bytes(i + k - 1) & 0xff)
      hashes(i) = h
      i += 1
    }
    hashes
  }

  /** Cross-engine 60-bit k-gram hash: the value DuckDB computes as
    * `('0x'||substr(md5(substr(text,i,k)),1,15))::BIGINT` — first 15 hex
    * chars of the gram's md5, i.e. bytes 0-6 plus the high nibble of byte
    * 7. Byte-k-grams equal character-k-grams on 1-byte (ASCII) text, which
    * is the oracle's domain; the winnowing guarantee itself holds under
    * any deterministic hash. Always non-negative, so signed and unsigned
    * window minima agree with DuckDB's BIGINT min.
    */
  private def md5Hashes(bytes: Array[Byte], nh: Int): Array[Long] = {
    val md = WinnowFingerprints.digest.get()
    val d = WinnowFingerprints.digestBuf.get()
    val hashes = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      md.update(bytes, i, k)
      // digest-into-buffer: MessageDigest.digest() allocates a fresh 16-byte
      // array per call — at one digest per character that allocation was
      // ~40% of this scan's time
      md.digest(d, 0, 16)
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hashes(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
      i += 1
    }
    hashes
  }

  private def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** MessageDigest is stateful and not thread-safe; expression instances
    * are shared across local-mode task threads.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }
}

object TextExprs {
  /** Winnowing fingerprints of a string column. `md5Mode` switches the
    * k-gram hash from the fast Rabin-Karp rolling hash to the 60-bit
    * md5 prefix that DuckDB can replicate (the q_containment oracle).
    */
  def winnowFingerprints(c: Column, k: Int = 5, w: Int = 4,
      md5Mode: Boolean = false): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(c), k, w, md5Mode))
}
