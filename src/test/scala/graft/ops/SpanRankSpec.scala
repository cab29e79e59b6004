package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Dedup.duplicateSpans (exact-substring span detection) and
  * Ranking.bm25TopK on corpora with known answers.
  */
class SpanRankSpec extends SparkSuite {

  import spark.implicits._

  private val run = (1 to 12).map(i => s"s$i").mkString(" ") // 12 shared tokens

  test("duplicateSpans: one maximal span per doc covering the shared run") {
    // doc1: 2 unique tokens, the run at positions 3..14; doc2: run at 2..13
    val docs = Seq(
      (1L, s"u1 u2 $run u3 u4"),
      (2L, s"v1 $run v2 v3 v4")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 5, minDocs = 2, minSpanTokens = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // grams of the run only (unique flanks break extension): doc1 positions
    // 3..10 -> span [3, 3+12-1], doc2 positions 2..9 -> span [2, 13]
    assert(spans.toSeq == Seq((1L, 3L, 12L), (2L, 2L, 12L)))
  }

  test("duplicateSpans: separated shared runs merge into distinct islands") {
    val runB = (1 to 12).map(i => s"t$i").mkString(" ")
    val gap = (1 to 10).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run $gap $runB"), // both runs, 10 unique tokens between
      (2L, s"x1 x2 $run x3"),
      (3L, s"y1 $runB y2 y3")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 5, minDocs = 2, minSpanTokens = 8)
      .filter(col("doc_id") === 1L).orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((1L, 12L), (23L, 12L)))
  }

  test("duplicateSpans: minDocs honored; within-doc repetition alone no span") {
    val docs = Seq(
      (1L, s"u1 u2 $run u3 u4"),
      (2L, s"v1 $run v2 v3 v4"),
      (3L, s"$run w1 w2 $run") // run also repeats WITHIN doc 3
    ).toDF("doc_id", "text")
    // the run is in 3 docs -> minDocs=3 keeps it; a doc-3-only token run
    // repeated within doc 3 must NOT count as 2 documents
    val within = Seq(
      (9L, "a1 a2 z1 z2 z3 z4 z5 z6 z7 z8 a3 z1 z2 z3 z4 z5 z6 z7 z8 a4"))
      .toDF("doc_id", "text")
    // doc 3 holds the run twice, 2 tokens apart -> two islands of its own
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", 5, 3, 8).count() == 4)
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", 5, 4, 8).count() == 0)
    assert(Dedup.duplicateSpans(within, "doc_id", "text", 5, 2, 8).count() == 0)
  }

  test("bm25TopK: known idf value, tf monotonicity, non-matching docs absent") {
    val docs = Seq(
      (1L, "q a a a"), (2L, "q q a a"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = Ranking.bm25TopK(docs, "doc_id", "text", Seq("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.map(_._1).toSeq == Seq(2L, 1L)) // ordered desc, doc 3 absent
    // dl=4=avgdl for doc 1, tf=1: score = idf*2.2/2.2 = idf =
    // round(ln(1 + (3-2+0.5)/2.5), 6) = 0.470004 -> round4 = 0.47
    assert(out.toMap.apply(1L) == 0.47)
    assert(out.toMap.apply(2L) > out.toMap.apply(1L))
  }
}
