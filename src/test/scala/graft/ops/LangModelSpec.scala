package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LangModelSpec extends SparkSuite {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog sat on the rug", "en"),
      (3L, "cat mat dog rug the the", "en"),
      (4L, "zorp blik quux flim zorp blik", "xx"),
      (5L, "the cat the cat the cat", "xx")
    ).toDF("doc_id", "text", "lang")
  }

  test("unigramCrossEntropy: in-reference docs score lower than OOV-heavy docs") {
    val out = LangModel.unigramCrossEntropy(docs, "doc_id", "text",
        refPred = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 4 is entirely OOV for the en reference -> every token takes the
    // smoothed floor, the corpus maximum per-token surprisal.
    assert(out(4L) > out(1L) && out(4L) > out(2L) && out(4L) > out(3L))
    // doc 5 repeats the two most frequent reference words -> lowest xent.
    assert(out(5L) < out(1L))
    // OOV floor exactly: ln((N+V+1)/1) with N ref tokens, V distinct.
    val n = 18; val v = 7
    val floor = BigDecimal(math.log((n + v + 1).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(4L) - floor) < 5e-5)
  }

  test("unigramCrossEntropy counts every token (n_tok) and keeps one row per doc") {
    val out = LangModel.unigramCrossEntropy(docs, "doc_id", "text",
      refPred = col("lang") === "en")
    assert(out.count() == 5)
    val n = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n(1L) == 6 && n(4L) == 6 && n(5L) == 6)
  }

  test("dsirLogWeights: target-like docs weigh higher; n_feat = unigrams + bigrams") {
    val out = LangModel.dsirLogWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = out.map(t => t._1 -> t).toMap
    // 6 words -> 6 unigrams + 5 bigrams.
    assert(out.forall(_._2 == 11))
    // doc 4's features never occur in the target slice -> its weight is
    // below every pure-target doc's.
    assert(Seq(1L, 2L, 3L).forall(id => byId(4L)._3 < byId(id)._3))
  }

  test("dsirLogWeights is deterministic across runs") {
    def run() = LangModel.dsirLogWeights(docs, "doc_id", "text",
        targetPred = col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }
}
