package graft.ops

import graft.SparkSuite

/** [[Graph.pageRank]] on tiny graphs with hand-checkable structure. The
  * cross-engine exactness claim is gated separately by q_pagerank's DuckDB
  * oracle; here: ordering, dangling handling, determinism, mass bounds.
  */
class GraphSpec extends SparkSuite {

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    Graph.pageRank(df, "src", "dst", iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hub gets the highest rank; dangling mass is redistributed, not lost") {
    // 1,2,3 all point to 4; 4 points nowhere (dangling)
    val r = ranks(Seq((1L, 4L), (2L, 4L), (3L, 4L)))
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    assert(r(4L) > r(1L) && r(1L) === r(2L) && r(2L) === r(3L))
    // total mass stays within truncation loss of the scale: each of the
    // 4 nodes can lose <1 unit per div, a handful of divs per iteration
    val total = r.values.sum
    assert(total > 1000000000000L - 100L && total <= 1000000000000L)
  }

  test("symmetric cycle converges to uniform; parallel edges weight") {
    val cyc = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 5)
    assert(cyc.values.toSet.size === 1) // exactly equal by symmetry
    // doubling an edge shifts mass toward its target
    val par = ranks(Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)))
    assert(par(2L) > par(3L))
  }

  test("deterministic across reruns and repartitionings") {
    import spark.implicits._
    val edges = (1L to 400L).map(i => (i % 37, (i * i) % 37)).toDF("src", "dst")
    val a = Graph.pageRank(edges, "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRank(edges.repartition(7), "src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
  }

  test("string node ids work unchanged (no silent cast)") {
    import spark.implicits._
    val df = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("s", "d")
    val r = Graph.pageRank(df, "s", "d", iters = 4).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set("a", "b", "c"))
    assert(r("c") > r("b")) // c has two in-routes, b one
  }
}
