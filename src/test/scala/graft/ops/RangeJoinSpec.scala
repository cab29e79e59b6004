package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {

  private def pairs(binWidth: Long) = {
    import spark.implicits._
    val points = Seq(0L, 5L, 7L, 13L, 14L, 21L, 99L).toDF("p")
    val intervals = Seq(
      (1L, 0L, 7L),    // covers 0,5,7
      (2L, 7L, 13L),   // covers 7,13
      (3L, 14L, 14L),  // single-point interval
      (4L, 50L, 60L)   // empty
    ).toDF("iid", "s", "e")
    RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth)
      .select("iid", "p").as[(Long, Long)].collect().toSet
  }

  private val expected = Set(
    (1L, 0L), (1L, 5L), (1L, 7L),
    (2L, 7L), (2L, 13L),
    (3L, 14L))

  test("point-in-interval matches inclusive bounds for any bin width") {
    // Bin width smaller than / equal to / larger than interval lengths —
    // binning over-approximates candidates; the exact filter must always
    // yield the same pairs.
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      assert(pairs(w) == expected, s"binWidth=$w")
    }
  }

  test("binned join equals naive inequality join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (0 until 500).map(_ => rnd.nextInt(1000).toLong).toDF("p")
    val intervals = (0 until 100).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(30).toLong)
    }.toDF("iid", "s", "e")
    val naive = points.join(intervals, col("p").between(col("s"), col("e")))
      .groupBy("iid").count().as[(Long, Long)].collect().toSet
    val binned = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 16L)
      .groupBy("iid").count().as[(Long, Long)].collect().toSet
    assert(binned == naive)
  }

  test("fan-out guard raises on pathological bin width") {
    import spark.implicits._
    val points = Seq(1L).toDF("p")
    val intervals = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        binWidth = 1L, maxBinsPerInterval = 1000L).count()
    }
    assert(ex.getMessage != null)
  }

  test("equi-key restriction: only same-key pairs survive") {
    import spark.implicits._
    val points = Seq(("a", 5L), ("b", 5L)).toDF("pk", "p")
    val intervals = Seq(("a", 10L, 0L, 9L)).toDF("ik", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 4L,
        equiKeys = Seq(("pk", "ik")))
      .select("pk", "p").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 5L)))
  }
}
