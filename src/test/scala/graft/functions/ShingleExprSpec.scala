package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.ShingleExpr.wordShingles

/** WordShingles must be value-equal to the composable catalyst form it
  * replaces (the dedup oracles were verified against that form).
  */
class ShingleExprSpec extends SparkSuite {

  private def composable(n: Int) = {
    val w = col("__w")
    array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
      i => array_join(slice(w, i, lit(n)), " ")))
  }

  test("identical to array_distinct(transform(...)) on the documents corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__w", regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
      .filter(size(col("__w")) >= 3)
    val both = docs.select(
      col("doc_id"),
      wordShingles(col("text"), 3).as("fast"),
      composable(3).as("ref"))
    val mismatches = both
      .filter(not(array_sort(col("fast")) <=> array_sort(col("ref"))))
      .count()
    assert(mismatches == 0)
  }

  test("edge cases: short text, extra whitespace, null") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b"),            // < n tokens -> empty
      (2L, "  a   b  c  "),   // whitespace runs collapse
      (3L, "x y x y x y"),    // repeated shingles dedupe
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"), wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq)).toMap
    assert(out(1L) == Seq())
    assert(out(2L) == Seq("a b c"))
    assert(out(3L).sorted == Seq("x y x", "y x y"))
    assert(out(4L) == null)
  }

  test("orderedShingles: identical to transform(...) without dedupe, in order") {
    val n = 5
    val w = col("__w")
    val composableOrdered = transform(
      sequence(lit(1), greatest(size(w) - (n - 1), lit(0))),
      i => array_join(slice(w, i, lit(n)), " "))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__w", regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val mismatches = docs.select(
        ShingleExpr.orderedShingles(col("text"), n).as("fast"),
        composableOrdered.as("ref"))
      .filter(not(col("fast") <=> col("ref")))
      .count()
    assert(mismatches == 0)
  }

  test("orderedShingles edge cases: duplicates kept, short text, null") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y x y x y"),  // repeats kept, positional order
      (2L, "a b"),          // < n tokens -> empty
      (3L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val out = df.select(col("id"), ShingleExpr.orderedShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq)).toMap
    assert(out(1L) == Seq("x y x", "y x y", "x y x", "y x y"))
    assert(out(2L) == Seq())
    assert(out(3L) == null)
  }

  test("unicode whitespace follows the Java-regex \\s charset, not isWhitespace") {
    import spark.implicits._
    // U+2028 (line separator) is Character.isWhitespace but NOT regex \s:
    // \S+ keeps "a b" as ONE token, and so must the fused expression —
    // otherwise the spec-asserted equivalence above holds only for ASCII.
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
      .withColumn("__w", regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
    val r = df.select(wordShingles(col("text"), 3).as("fast"), composable(3).as("ref"))
      .head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](0) == Seq("a b c d", "c d e"))
  }
}
