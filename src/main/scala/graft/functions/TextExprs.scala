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
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[functions] val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }
}

/** [[WinnowFingerprints]] with POSITIONS: array<struct<pos int, f long>>
  * of the selected (0-based gram offset, fingerprint hash) pairs — the
  * span-granular form cross-document substring dedup needs (a value-only
  * fingerprint can say two docs overlap, not WHERE). Selection is robust
  * winnowing with the RIGHTMOST-min tie-break in every branch (the main
  * loop's rule, applied to the short-document branch too so one SQL
  * formulation mirrors both); the selected position is non-decreasing
  * across windows, so consecutive-dedup equals distinct positions.
  */
case class WinnowFingerprintPositions(child: Expression, k: Int, w: Int,
    md5Mode: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("f", LongType, nullable = false))), containsNull = false)

  private val BASE = 257L

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nh = n - k + 1
    val hashes =
      if (md5Mode) md5Hashes(bytes, nh) else rollingHashes(bytes, nh)
    def row(pos: Int, f: Long) =
      org.apache.spark.sql.catalyst.InternalRow(pos, f)
    if (nh <= w) {
      // one window covering everything; rightmost min, like the main loop
      var mnPos = 0
      var i = 1
      while (i < nh) {
        if (unsignedLt(hashes(i), hashes(mnPos)) ||
          hashes(i) == hashes(mnPos)) mnPos = i
        i += 1
      }
      return new GenericArrayData(Array[Any](row(mnPos, hashes(mnPos))))
    }
    val out = Array.newBuilder[Any]
    var lastPos = -1
    var i = 0
    while (i + w <= nh) {
      var mnPos = i
      var jj = i + 1
      while (jj < i + w) {
        if (unsignedLt(hashes(jj), hashes(mnPos)) ||
          (hashes(jj) == hashes(mnPos) && jj > mnPos)) mnPos = jj
        jj += 1
      }
      if (mnPos != lastPos) { out += row(mnPos, hashes(mnPos)); lastPos = mnPos }
      i += 1
    }
    new GenericArrayData(out.result())
  }

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

  private def md5Hashes(bytes: Array[Byte], nh: Int): Array[Long] = {
    val md = WinnowFingerprints.digest.get()
    val d = WinnowFingerprints.digestBuf.get()
    val hashes = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      md.update(bytes, i, k)
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

/** Single-pass character-entropy statistics of a string: (n, n_distinct,
  * clnc_micros) where clnc_micros = Σ_c count(c) · round(ln count(c), 6)·10⁶
  * as an exact long — bit-identical to the relational form
  * `sum(cnt * CAST(round(ln(cnt), 6) AS DECIMAL(18,6)))` over a
  * (doc, char) explode (the micros value IS the decimal's unscaled value,
  * and both sides use BigDecimal.valueOf(ln)·setScale(6, HALF_UP)), but
  * computed map-side in one pass with NO exchange. Exists because the
  * explode→groupBy(doc, char) form shuffles one row per corpus character:
  * measured 120 s / 547 MB at 100× where this is a pure scan. Characters
  * are code points excluding the five Java line terminators (\n \r U+0085
  * U+2028 U+2029 — Java's `.` class; RE2's `.` excludes only \n, so the
  * DuckDB oracles pin the explicit class [^\n\r\x{85}\x{2028}\x{2029}]).
  * Entropy derives as ln(n) − (clnc_micros/10⁶)/n.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("clnc_micros", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy_stats expects string, got ${t.sql}")
    }

  /** Public so generated code can call back into it. */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = input.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      // the regex `.` class: any code point except line terminators
      if (cp != '\n' && cp != '\r' && cp != 0x85 &&
          cp != 0x2028 && cp != 0x2029) {
        n += 1
        val cell = counts.get(cp)
        if (cell == null) counts.put(cp, Array(1L)) else cell(0) += 1
      }
    }
    var clnc = 0L
    // memoize the dec6 ln per distinct COUNT value (counts repeat a lot)
    val lnCache = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      var m = lnCache.get(c: java.lang.Long)
      if (m == null) {
        // EXACT mirror of Spark/DuckDB round(ln(c), 6) → DECIMAL(18,6):
        // BigDecimal.valueOf uses the shortest double repr, HALF_UP at
        // scale 6; the unscaled value is the micros long
        m = java.math.BigDecimal.valueOf(Math.log(c.toDouble))
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        lnCache.put(c, m)
      }
      clnc += c * m
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, counts.size.toLong, clnc))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("charEntropyExpr", this,
        classOf[CharEntropyStats].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Single-pass word-repetition statistics of a string: (nw, maxtf) — the
  * token count and the most frequent token's count, the two integers the
  * Gopher repetition rule (maxtf·5 ≤ nw) needs. Same tokenization as the
  * relational `regexp_extract_all(text, '\S+')` explode ([[Tok.words]]'
  * spec-asserted `\s` class), but map-side with NO (doc, word) exchange —
  * the word-path twin of [[CharEntropyStats]]. Pure integers, so
  * equivalence is exact by construction.
  */
case class WordRepStats(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("nw", LongType, nullable = false),
    StructField("maxtf", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_rep_stats expects string, got ${t.sql}")
    }

  /** Public so generated code can call back into it. */
  def compute(input: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Tok.words(input.toString)
    val counts = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    var maxtf = 0L
    while (i < toks.length) {
      val cell = counts.get(toks(i))
      val c = if (cell == null) {
        counts.put(toks(i), Array(1L)); 1L
      } else { cell(0) += 1; cell(0) }
      if (c > maxtf) maxtf = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length.toLong, maxtf))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val self = ctx.addReferenceObj("wordRepExpr", this,
        classOf[WordRepStats].getName)
      s"${ev.value} = $self.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  /** Winnowing fingerprints of a string column. `md5Mode` switches the
    * k-gram hash from the fast Rabin-Karp rolling hash to the 60-bit
    * md5 prefix that DuckDB can replicate (the q_containment oracle).
    */
  def winnowFingerprints(c: Column, k: Int = 5, w: Int = 4,
      md5Mode: Boolean = false): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(c), k, w, md5Mode))

  /** Winnowing fingerprints WITH 0-based positions
    * (array<struct<pos, f>>) — see [[WinnowFingerprintPositions]].
    */
  def winnowFingerprintPositions(c: Column, k: Int = 5, w: Int = 4,
      md5Mode: Boolean = false): Column =
    GraftBridge.column(
      WinnowFingerprintPositions(GraftBridge.expression(c), k, w, md5Mode))

  /** One-pass char-entropy stats struct (n, n_distinct, clnc_micros) of a
    * string column — see [[CharEntropyStats]].
    */
  def charEntropyStats(c: Column): Column =
    GraftBridge.column(CharEntropyStats(GraftBridge.expression(c)))

  /** One-pass word-repetition stats struct (nw, maxtf) of a string
    * column — see [[WordRepStats]].
    */
  def wordRepStats(c: Column): Column =
    GraftBridge.column(WordRepStats(GraftBridge.expression(c)))
}
