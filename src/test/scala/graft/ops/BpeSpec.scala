package graft.ops

import graft.SparkSuite

/** [[Bpe.learnMerges]] on corpora small enough to run classic BPE by
  * hand — merge order, tie-breaks, and the greedy-equivalence edge cases
  * (runs of identical symbols, re-pairing of merged symbols). The
  * cross-engine exactness is gated by q_bpe_train's DuckDB oracle.
  */
class BpeSpec extends SparkSuite {

  private def learn(texts: Seq[String], n: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    Bpe.learnMerges(texts.toDF("text"), "text", n).orderBy("step")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("textbook corpus: most frequent pair merges first, merged symbols re-pair") {
    // 'lo' appears in low(x3) and lower(x2): pair (l,o) freq 5 beats all
    val m = learn(Seq("low low low lower lower newest", "newest newest"), 4)
    assert(m(0)._2 === "l" && m(0)._3 === "o" && m(0)._4 === 5L)
    // after (l,o) -> lo, pair (lo, w) has freq 5 and the merged symbol
    // participates — the re-pairing BPE exists for
    assert(m(1)._2 === "lo" && m(1)._3 === "w" && m(1)._4 === 5L)
    // ties break lexicographically: at freq 3, (e,s) (es,t)/(s,t) chains
    // and (n,e) from newest all compete; (e,s) sorts first
    assert(m(2)._4 === 3L && m(2)._2 === "e" && m(2)._3 === "s")
  }

  test("runs of identical symbols merge greedily left-to-right") {
    // 'aaaa' alone: pairs (a,a) x3 -> merge gives (aa)(aa), NOT (a)(aa)(a)
    val m = learn(Seq("aaaa"), 2)
    assert(m(0)._2 === "a" && m(0)._3 === "a" && m(0)._4 === 3L)
    // round 2: the word is now 'aa aa' -> best pair is (aa, aa) freq 1;
    // a wrong (non-greedy) first merge would leave 'a aa a' whose best
    // pair (a, aa) would surface here instead
    assert(m(1)._2 === "aa" && m(1)._3 === "aa" && m(1)._4 === 1L)
  }

  test("frequency weights come from the word-frequency table, not distinct words") {
    val m = learn(Seq("ab ab ab", "ab cd"), 1)
    assert(m(0) === ((1L, "a", "b", 4L))) // 4 occurrences of word 'ab'
  }

  test("non-letter tokens are excluded by the default token filter") {
    val m = learn(Seq("zz zz 123 a1b ?!"), 1)
    assert(m(0)._2 === "z" && m(0)._3 === "z" && m(0)._4 === 2L)
  }

  test("asking for more merges than the corpus supports fails loud") {
    val e = intercept[IllegalArgumentException] { learn(Seq("ab"), 5) }
    assert(e.getMessage.contains("exhausted"))
  }
}
