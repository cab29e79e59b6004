package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[CharEntropyStats]]: the one-pass struct must equal the relational
  * explode→groupBy(doc, char) formulation term for term — the micros long
  * IS the DECIMAL(18,6) sum's unscaled value — and the map-side plan must
  * carry no exchange.
  */
class TextExprsSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("char_entropy_stats equals the explode/groupBy decimal formulation") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val rel = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c") * round(log(col("c").cast("double")), 6).cast(dec))
          .as("clnc"))
      .select(col("doc_id"), col("n"), col("n_distinct"),
        (col("clnc") * lit(1000000)).cast("long").as("clnc_micros"))
    val fast = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"), TextExprs.charEntropyStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n").as("n"),
        col("st.n_distinct").as("n_distinct"),
        col("st.clnc_micros").as("clnc_micros"))
    assert(rel.exceptAll(fast).isEmpty && fast.exceptAll(rel).isEmpty,
      "one-pass stats must match the relational form exactly")
  }

  test("char_entropy_stats: hand values, line terminators excluded, null") {
    import spark.implicits._
    val r = Seq("aab", "a\nb", "", null: String).toDF("t")
      .select(TextExprs.charEntropyStats(col("t")).as("st"))
      .select(col("st.n"), col("st.n_distinct"), col("st.clnc_micros"))
      .collect()
    // "aab": n=3, 2 distinct; clnc = 2·round6(ln 2) + 1·round6(ln 1)
    assert(r(0).getLong(0) === 3L && r(0).getLong(1) === 2L)
    assert(r(0).getLong(2) === 2L * 693147L)
    // "a\nb": the \n is not a `.` char
    assert(r(1).getLong(0) === 2L && r(1).getLong(1) === 2L &&
      r(1).getLong(2) === 0L)
    // empty: all zero
    assert(r(2).getLong(0) === 0L && r(2).getLong(2) === 0L)
    // null input → null struct
    assert(r(3).isNullAt(0) || r(3).anyNull ||
      Seq(0, 1, 2).forall(r(3).isNullAt))
  }

  test("word_rep_stats equals the explode/groupBy formulation; hand values") {
    import spark.implicits._
    val rel = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).as("wd"))
      .groupBy("doc_id", "wd").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("maxtf"), sum(col("c")).as("nw"))
      .select("doc_id", "nw", "maxtf")
    val fast = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"), TextExprs.wordRepStats(col("text")).as("ws"))
      .select(col("doc_id"), col("ws.nw").as("nw"), col("ws.maxtf").as("maxtf"))
    assert(rel.exceptAll(fast).isEmpty && fast.exceptAll(rel).isEmpty)
    val r = Seq("a b a  a\tc", " ", null: String).toDF("t")
      .select(TextExprs.wordRepStats(col("t")).as("ws"))
      .select(col("ws.nw"), col("ws.maxtf")).collect()
    assert(r(0).getLong(0) === 5L && r(0).getLong(1) === 3L)
    assert(r(1).getLong(0) === 0L && r(1).getLong(1) === 0L)
    assert(Seq(0, 1).forall(r(2).isNullAt))
  }

  test("char_entropy_stats plans with no exchange on the stats path") {
    val fast = docs
      .select(TextExprs.charEntropyStats(col("text")).as("st"))
      .select(sum(col("st.n")))
    val plan = fast.queryExecution.executedPlan.toString
    // the only allowed exchange is the final 1-row aggregate's
    assert(!plan.contains("Exchange hashpartitioning"),
      s"map-side expression must not hash-shuffle:\n$plan")
  }
}
