package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.NormalizeExpr.normalize

/** Unicode normalization expression: form semantics, ASCII fast path,
  * codegen/interpreted parity, null propagation, and idempotence.
  * Cross-engine byte equality with DuckDB's utf8proc is under the hash
  * gate (q_normalize_nfc). All non-ASCII is spelled as explicit \u
  * escapes so the intended codepoints are visible and editor-proof.
  */
class NormalizeExprSpec extends SparkSuite {

  import spark.implicits._

  private val decomposed = "cafe\u0301"  // e + combining acute
  private val composed = "caf\u00e9"

  private def norm1(s: String, form: String): String =
    Seq(s).toDF("v").select(normalize(col("v"), form)).head().getString(0)

  test("NFC composes; NFD decomposes; NFKC folds compatibility forms") {
    assert(norm1(decomposed, "NFC") === composed)
    assert(norm1(composed, "NFD") === decomposed)
    // Hangul jamo pair composes to the precomposed syllable
    assert(norm1("\u1100\u1161", "NFC") === "\uac00")
    // ligature fi (U+FB01) survives NFC but folds under NFKC
    assert(norm1("\ufb01le", "NFC") === "\ufb01le")
    assert(norm1("\ufb01le", "NFKC") === "file")
    // fullwidth digits fold under NFKC only
    assert(norm1("\uff11\uff12", "NFKC") === "12")
  }

  test("the dedup motivation: byte-different spellings hash together after NFC") {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("id", "t")
    val fps = df.select(md5(normalize(col("t"), "NFC"))).distinct().count()
    assert(fps === 1L, "composed and decomposed forms must share a fingerprint")
    assert(df.select(md5(col("t"))).distinct().count() === 2L)
  }

  test("ASCII fast path, nulls, idempotence, and codegen/interpreted parity") {
    val mixed = Seq(Some("plain ascii only"), None, Some("um\u00e9"),
      Some(""), Some("\uac00 already composed")).toDF("v")
    val out = mixed.select(normalize(col("v"), "NFC").as("n")).collect()
    assert(out(0).getString(0) === "plain ascii only")
    assert(out(1).isNullAt(0))
    assert(out(2).getString(0) === "um\u00e9")
    assert(out(3).getString(0) === "")
    // idempotence: normalize after normalize = normalize
    val once = mixed.select(normalize(col("v"), "NFC").as("n"))
    val twice = once.select(normalize(col("n"), "NFC").as("n"))
    assert(once.collect().map(_.toString).toSeq ===
      twice.collect().map(_.toString).toSeq)
    // interpreted eval path (outside codegen) agrees
    val e = NormalizeText(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)),
      "NFC")
    assert(e.eval(null).toString === composed)
  }

  test("an unknown form fails at construction, not per row") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("v").select(normalize(col("v"), "NFX")).head()
    }
  }

  test("a non-string input is an ANALYSIS error, not a per-row cast crash") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(normalize(col("n"), "NFC")).head()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
