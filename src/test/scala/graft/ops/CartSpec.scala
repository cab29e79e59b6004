package graft.ops

import graft.SparkSuite

/** Cart semantics the two-level oracle (q_cart_train/q_cart_classify)
  * cannot isolate: stop rules (pure node, no strict improvement),
  * deterministic tie-breaking, binning arithmetic, and deeper trees than
  * the depth-2 unroll.
  */
class CartSpec extends SparkSuite {
  import spark.implicits._

  private def toDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("fa", "fb", "y")

  test("depth-1 stump picks the minimal-error split; classify routes by <= threshold") {
    // fa separates perfectly at <= 2; fb is noise
    val rows = Seq[(Long, Long, Long)](
      (1L, 9L, 0L), (2L, 1L, 0L), (2L, 7L, 0L), (3L, 2L, 1L), (4L, 8L, 1L))
    val tree = Cart.train(toDf(rows), Seq("fa", "fb"), "y", depth = 1, maxBins = 0)
    val root = tree.find(_.node == 1L).get
    assert(root.feature == "fa" && root.threshold == 2L && root.err == 2L)
    assert(tree.find(_.node == 2L).get.pred == 0L)
    assert(tree.find(_.node == 3L).get.pred == 1L)
    val preds = Cart.classify(toDf(rows), tree)
      .select("fa", "pred").as[(Long, Long)].collect().toSet
    assert(preds == Set((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("a pure node never splits (every candidate ties the parent at 0)") {
    val rows = Seq[(Long, Long, Long)]((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L))
    val tree = Cart.train(toDf(rows), Seq("fa", "fb"), "y", depth = 3, maxBins = 0)
    assert(tree == Seq(Cart.TreeNode(1L, null, -1L, 3L, 3L, 0L, 1L)))
  }

  test("no strict improvement -> leaf, even when impure") {
    // alternating labels on a single repeated feature value: no candidate
    // exists at all (one bin), so the impure root stays a leaf, majority 0
    val rows = Seq[(Long, Long, Long)](
      (5L, 5L, 0L), (5L, 5L, 1L), (5L, 5L, 0L), (5L, 5L, 1L))
    val tree = Cart.train(toDf(rows), Seq("fa", "fb"), "y", depth = 2, maxBins = 0)
    assert(tree == Seq(Cart.TreeNode(1L, null, -1L, 4L, 2L, 2L, 0L)))
  }

  test("argmin ties break on (error, feature, threshold) — smallest wins") {
    // fa <= 1 and fb <= 1 both achieve 0 errors; 'fa' < 'fb' wins.
    // Within fa, only threshold 1 achieves 0 (threshold candidates are
    // value bins, last excluded).
    val rows = Seq[(Long, Long, Long)]((1L, 1L, 0L), (2L, 2L, 1L))
    val tree = Cart.train(toDf(rows), Seq("fb", "fa"), "y", depth = 1, maxBins = 0)
    val root = tree.find(_.node == 1L).get
    assert(root.feature == "fa" && root.threshold == 1L)
  }

  test("maxBins buckets thresholds to bin upper edges without changing a coarse split") {
    // values 0..99, label = v > 49. With maxBins=10: w=10, bins are
    // 9,19,...,99; the perfect threshold 49 IS a bin edge so the split
    // stays exact; the chosen threshold must be one of the edges.
    val rows = (0L until 100L).map(v => (v, 0L, if (v > 49L) 1L else 0L))
    val tree = Cart.train(toDf(rows), Seq("fa", "fb"), "y", depth = 1, maxBins = 10)
    val root = tree.find(_.node == 1L).get
    assert(root.feature == "fa" && root.threshold == 49L && root.err == 50L)
    assert(tree.filter(_.feature == null).map(_.err).sum == 0L)
  }

  test("depth-3 tree recovers a three-level rule exactly") {
    // y = 1 iff fa>3 XOR fb>5 on a 8x10 grid: needs fa split then fb
    // splits on both sides (depth 2 handles it), deeper levels add nothing
    val rows = for (a <- 0L until 8L; b <- 0L until 10L)
      yield (a, b, if ((a > 3L) != (b > 5L)) 1L else 0L)
    val tree = Cart.train(toDf(rows), Seq("fa", "fb"), "y", depth = 3, maxBins = 0)
    val bad = Cart.classify(toDf(rows), tree)
      .filter(org.apache.spark.sql.functions.col("pred") =!=
        org.apache.spark.sql.functions.col("y")).count()
    assert(bad == 0L)
    // perfect depth-2 tree: root + 2 children split, 4 pure leaves
    assert(tree.count(_.feature != null) == 3)
    assert(tree.count(_.feature == null) == 4)
  }

  test("trainMany over overlapping subsets == per-subset train, node for node") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // deterministic pseudo-random rows with a learnable-but-noisy rule and
    // id-keyed subsets that OVERLAP (each row is in 2 of 3 complements +
    // the full set) — the fused pass must keep every subset's counts,
    // per-subset binning (different min/max per subset) and tie order
    // fully isolated from its siblings
    val rows = (0L until 240L).map { i =>
      val fa = (i * 37L) % 101L
      val fb = (i * 61L) % 53L
      val y = if ((fa > 50L) != (i % 11L == 0L)) 1L else 0L
      (i, fa, fb, y)
    }
    val df = rows.toDF("id", "fa", "fb", "y")
    val subsets = lit(true) +: (0 until 3).map(b => pmod(col("id"), lit(3)) =!= b)
    val fused = Cart.trainMany(df, subsets, Seq("fa", "fb"), "y",
      depth = 2, maxBins = 8)
    val solo = Seq(df) ++ (0 until 3).map(b => df.filter(pmod(col("id"), lit(3)) =!= b))
    solo.zipWithIndex.foreach { case (sub, i) =>
      assert(fused(i) == Cart.train(sub, Seq("fa", "fb"), "y",
        depth = 2, maxBins = 8), s"subset $i diverged")
    }
  }
}
