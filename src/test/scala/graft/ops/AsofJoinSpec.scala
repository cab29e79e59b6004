package graft.ops

import graft.SparkSuite

class AsofJoinSpec extends SparkSuite {

  test("asof: latest at-or-before match per key; null before first match") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // before any right row -> null
      (1L, 200L, 11L), // matches right@150 (v=1.5)
      (1L, 300L, 12L), // matches right@300 exactly (inclusive, v=3.0)
      (1L, 400L, 13L), // still right@300
      (2L, 500L, 20L)  // key 2 has no right rows -> null
    ).toDF("k", "t", "left_id")
    val right = Seq(
      (1L, 150L, 1.5),
      (1L, 300L, 3.0)
    ).toDF("k", "t", "v")

    val out = AsofJoin.asof(left, right, "k", "t", "t", Seq("v"))
      .orderBy("left_id")
      .collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3)))

    assert(out.toSeq == Seq(
      (10L, null), (11L, 1.5), (12L, 3.0), (13L, 3.0), (20L, null)))
  }

  test("asof preserves left row count (left-outer semantics)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong * 10, i.toLong))
      .toDF("k", "t", "left_id")
    val right = Seq((0L, 55L, 1.0), (1L, 5L, 2.0)).toDF("k", "t", "v")
    assert(AsofJoin.asof(left, right, "k", "t", "t", Seq("v")).count() == 100)
  }
}
