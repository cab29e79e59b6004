package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class BloomSpec extends SparkSuite {

  test("bloomAntiJoin == exact left-anti join (string keys)") {
    import spark.implicits._
    val corpus = (1 to 500).map(i => (s"k$i", i.toLong)).toDF("key", "payload")
      .repartition(4)
    val bad = (1 to 500 by 7).map(i => s"k$i").toDF("key")
    val got = Bloom.bloomAntiJoin(corpus, bad, "key")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = corpus.join(bad, Seq("key"), "left_anti")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact && got.nonEmpty && got.size < 500)
  }

  test("bloomAntiJoin == exact left-anti join (long keys, aggressive fpp)") {
    import spark.implicits._
    val corpus = (1L to 1000L).toDF("id")
    val bad = (1L to 1000L by 3).toDF("id")
    // fpp=0.5 floods the confirm path with false positives — the exact
    // confirm must remove every one of them
    val got = Bloom.bloomAntiJoin(corpus, bad, "id", fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 1000L).filterNot(i => (i - 1) % 3 == 0).toSet)
  }

  test("bloomAntiJoin keeps null-key rows, exactly like a left-anti join") {
    import spark.implicits._
    val corpus = Seq(Some("a"), Some("b"), None, Some("c"), None)
      .toDF("key")
    val bad = Seq("b").toDF("key")
    val got = Bloom.bloomAntiJoin(corpus, bad, "key")
      .collect().map(r => Option(r.getString(0))).toSeq.sortBy(_.getOrElse(""))
    val exact = corpus.join(bad, Seq("key"), "left_anti")
      .collect().map(r => Option(r.getString(0))).toSeq.sortBy(_.getOrElse(""))
    assert(got == exact && got.count(_.isEmpty) == 2)
  }

  test("empty bad set keeps the whole corpus") {
    import spark.implicits._
    val corpus = (1L to 50L).toDF("id")
    val bad = corpus.filter(col("id") < 0)
    assert(Bloom.bloomAntiJoin(corpus, bad, "id").count() == 50)
  }

  test("bloomSemiJoin == exact left-semi join; empty keep list selects nothing") {
    import spark.implicits._
    val corpus = (1L to 1000L).toDF("id")
    val keep = (1L to 1000L by 13).toDF("id")
    val got = Bloom.bloomSemiJoin(corpus, keep, "id", fpp = 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 1000L by 13).toSet)
    assert(Bloom.bloomSemiJoin(corpus, keep.filter(col("id") < 0), "id").count() == 0)
  }
}
