package graft.ops

import graft.SparkSuite

/** Ranking.phraseSearch edge semantics the char-scan oracle in
  * q_phrase_search cannot express: overlapping occurrences (repeated-word
  * phrases) and rare-term anchoring not changing results.
  */
class PhraseSearchSpec extends SparkSuite {
  import spark.implicits._

  private def search(docs: Seq[(Long, String)], phrase: String): Map[Long, (Int, Long)] =
    Ranking.phraseSearch(docs.toDF("doc_id", "text"), "doc_id", "text", phrase)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap

  test("finds consecutive-token matches only, with word positions") {
    val docs = Seq(
      (1L, "a data query runs fast"),        // match at word 2
      (2L, "data there query"),              // words not adjacent: no match
      (3L, "data query data query"),         // two occurrences
      (4L, "query data"),                    // wrong order: no match
      (5L, "data query"))                    // whole doc
    assert(search(docs, "data query") ==
      Map(1L -> ((2, 1L)), 3L -> ((1, 2L)), 5L -> ((1, 1L))))
  }

  test("overlapping occurrences of a repeated-word phrase all count") {
    // "data data" in "data data data" starts at words 1 AND 2 — the
    // positional join sees both; left-to-right replace counting would
    // see one. This is why the spec, not the char-scan oracle, owns it.
    val docs = Seq((1L, "data data data"), (2L, "data data"))
    assert(search(docs, "data data") == Map(1L -> ((1, 2L)), 2L -> ((1, 1L))))
  }

  test("three-term phrase joins at the right offsets regardless of anchor") {
    // 'zzz' is rare (anchor), surrounded by common terms at both offsets
    val docs = Seq(
      (1L, "a b zzz c d"), (2L, "b zzz c"), (3L, "zzz b c"), (4L, "b c zzz"))
    assert(search(docs, "b zzz c") == Map(1L -> ((2, 1L)), 2L -> ((1, 1L))))
  }

  test("phrase absent everywhere yields an empty frame") {
    assert(search(Seq((1L, "a b c")), "x y").isEmpty)
  }

  test("whitespace RUNS — double spaces, tabs, newlines — separate adjacent tokens") {
    // \S+ tokenization (the repo-wide convention): split-on-single-space
    // would emit empty tokens that shift positions and break matches
    // across a double space or the fixture's embedded newlines
    val docs = Seq(
      (1L, "deep  learning systems"),   // double space between the terms
      (2L, "deep\tlearning"),           // tab separator
      (3L, "intro\ndeep\nlearning"),    // newline separators
      (4L, "  deep learning"),          // leading whitespace: no pos shift
      (5L, "deeplearning"))             // no boundary: no match
    assert(search(docs, "deep learning") ==
      Map(1L -> ((1, 1L)), 2L -> ((1, 1L)), 3L -> ((2, 1L)), 4L -> ((1, 1L))))
  }
}
