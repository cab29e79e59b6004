package graft.ops

import graft.SparkSuite

/** Model-based check: Cart.train's root split against a brute-force
  * driver-side search on seeded random datasets — every candidate
  * (feature, threshold) scored exhaustively, argmin by the same
  * (error, feature, threshold) order. CartSpec pins named edge cases;
  * this sweeps the space between them, including binned candidates.
  */
class CartProperties extends SparkSuite {
  import spark.implicits._

  private case class Best(f: String, thr: Long, e: Long)

  /** Exhaustive stump search with the binning contract of Cart.train. */
  private def bruteStump(rows: Seq[(Long, Long, Long)], maxBins: Int)
      : Option[Best] = {
    val feats = Seq("fa" -> rows.map(r => (r._1, r._3)),
      "fb" -> rows.map(r => (r._2, r._3)))
    val n = rows.size.toLong
    val pos = rows.count(_._3 == 1L).toLong
    val eNode = n - math.max(pos, n - pos)
    val cands = for {
      (f, vs) <- feats
      mn = vs.map(_._1).min
      mx = vs.map(_._1).max
      w = if (maxBins == 0) 1L else math.max(1L, (mx - mn + maxBins) / maxBins)
      vb <- vs.map { case (v, _) => mn + ((v - mn) / w) * w + (w - 1) }.distinct
      left = vs.filter(_._1 <= vb)
      if left.size < vs.size // last bin splits nothing off
    } yield {
      val (ln, lp) = (left.size.toLong, left.count(_._2 == 1L).toLong)
      val (rn, rp) = (n - ln, pos - lp)
      Best(f, vb,
        (ln - math.max(lp, ln - lp)) + (rn - math.max(rp, rn - rp)))
    }
    cands.sortBy(b => (b.e, b.f, b.thr)).headOption.filter(_.e < eNode)
  }

  test("root split matches the exhaustive search on seeded random data (binned and exact)") {
    for (seed <- 1 to 8; maxBins <- Seq(0, 4)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(40)((rnd.nextInt(20).toLong, rnd.nextInt(9).toLong,
        rnd.nextInt(2).toLong))
      val tree = Cart.train(rows.toDF("fa", "fb", "y"), Seq("fa", "fb"), "y",
        depth = 1, maxBins = maxBins)
      val root = tree.find(_.node == 1L).get
      bruteStump(rows, maxBins) match {
        case Some(b) =>
          assert(root.feature == b.f && root.threshold == b.thr,
            s"seed=$seed bins=$maxBins: got (${root.feature},${root.threshold}), " +
              s"brute force says (${b.f},${b.thr})")
          // leaf errors fold back to the chosen split's error
          assert(tree.filter(_.feature == null).map(_.err).sum == b.e,
            s"seed=$seed bins=$maxBins")
        case None =>
          assert(root.feature == null, s"seed=$seed bins=$maxBins: " +
            "brute force found no improving split but train split anyway")
      }
    }
  }

  test("classify agrees with driver-side tree walk on seeded random data") {
    for (seed <- 9 to 12) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        rnd.nextInt(2).toLong))
      val tree = Cart.train(rows.toDF("fa", "fb", "y"), Seq("fa", "fb"), "y",
        depth = 3, maxBins = 0)
      val byId = tree.map(t => t.node -> t).toMap
      def walk(fa: Long, fb: Long): Long = {
        var node = 1L
        while (byId(node).feature != null) {
          val t = byId(node)
          val v = if (t.feature == "fa") fa else fb
          node = 2 * node + (if (v <= t.threshold) 0 else 1)
        }
        byId(node).pred
      }
      val got = Cart.classify(rows.toDF("fa", "fb", "y"), tree)
        .select("fa", "fb", "pred").as[(Long, Long, Long)].collect()
      got.foreach { case (fa, fb, p) =>
        assert(p == walk(fa, fb), s"seed=$seed at ($fa,$fb)")
      }
    }
  }
}
