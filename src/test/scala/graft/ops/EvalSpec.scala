package graft.ops

import graft.SparkSuite

/** [[Eval]] against brute force: AUC by all-pairs comparison (ties = half),
  * kappa by the textbook formula on a hand-built confusion matrix.
  */
class EvalSpec extends SparkSuite {

  private def auc(rows: Seq[(Long, Long)]): (Long, Long) = {
    import spark.implicits._
    val r = Eval.aucExact(rows.toDF("score", "y"), "score", "y").head()
    (r.getAs[Long]("u2"), r.getAs[Long]("den"))
  }

  /** 2·(number of (pos, neg) pairs where pos outscores neg, ties half). */
  private def bruteU2(rows: Seq[(Long, Long)]): (Long, Long) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    (u2, 2L * pos.size * neg.size)
  }

  test("aucExact equals all-pairs brute force on random data with heavy ties") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 5) {
      // scores drawn from a tiny domain so ties are everywhere
      val rows = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(2).toLong))
      assert(auc(rows) === bruteU2(rows), s"trial $trial")
    }
  }

  /** dec6 convention replicated for the brute jackknife tails —
    * BigDecimal.valueOf (Double.toString canonical form), matching
    * Spark's Round expression, NOT the exact-binary new BigDecimal(x).
    */
  private def r6(x: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def bruteJackSe(stats: Seq[Double]): Double = {
    val g = stats.size
    val adot = r6(stats.map(r6).sum / g)
    val ssq = stats.map(r6).map(v => r6((v - adot) * (v - adot))).sum
    r6(math.sqrt((g - 1).toDouble / g * ssq))
  }

  test("aucJackknife matches the brute leave-one-group-out recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(400)(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(2).toLong))
    val df = rows.toDF("id", "score", "y")
    val got = Eval.aucJackknife(df, "score", "y", "id", nGroups = 5).head()
    // brute: per group, recompute AUC over every OTHER row from scratch
    val aucs = (0 until 5).map { g =>
      val rest = rows.filter(_._1 % 5 != g).map(r => (r._2, r._3))
      val (u2, den) = bruteU2(rest)
      r6(u2.toDouble / den)
    }
    val (u2all, denall) = bruteU2(rows.map(r => (r._2, r._3)))
    assert(got.getAs[Long]("n_groups") === 5L)
    assert(got.getAs[Double]("auc") === r6(u2all.toDouble / denall))
    assert(got.getAs[Double]("jack_se") === bruteJackSe(aucs))
    // degenerate guard: one group holds every positive
    val degen = Seq.tabulate(60)(i =>
      (i.toLong * 2, i.toLong, if (i % 2 == 0) 1L else 0L)) // pos ids all even
    intercept[IllegalArgumentException] {
      Eval.aucJackknife(degen.toDF("id", "score", "y"), "score", "y",
        "id", nGroups = 2).collect()
    }
  }

  test("giniJackknife matches the brute leave-one-group-out recompute") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(200)(i => (i.toLong, (rnd.nextInt(50) + 1).toLong))
    val df = rows.toDF("id", "x")
    val got = Eval.giniJackknife(df, "x", "id", nGroups = 4).head()
    def bruteGini(vs: Seq[Long]): Double = {
      val s = (for (a <- vs; b <- vs) yield math.abs(a - b)).sum / 2.0
      r6(s / (vs.size.toDouble * vs.sum.toDouble))
    }
    val ginis = (0 until 4).map { g =>
      bruteGini(rows.filter(_._1 % 4 != g).map(_._2))
    }
    assert(got.getAs[Long]("n_rows") === 200L)
    assert(got.getAs[Long]("sum_val") === rows.map(_._2).sum)
    assert(got.getAs[Double]("gini") === bruteGini(rows.map(_._2)))
    assert(got.getAs[Double]("jack_se") === bruteJackSe(ginis))
  }

  test("aucExact endpoints: perfect scorer = 1, inverted = 0, constant = 1/2") {
    val perfect = Seq((1L, 0L), (2L, 0L), (9L, 1L), (8L, 1L))
    assert(auc(perfect) === ((8L, 8L)))
    val inverted = perfect.map { case (s, y) => (-s, y) }
    assert(auc(inverted) === ((0L, 8L)))
    val constant = Seq((5L, 0L), (5L, 1L), (5L, 0L), (5L, 1L))
    val (u2c, denc) = auc(constant)
    assert(u2c * 2 === denc) // AUC exactly 1/2
  }

  test("prCurve rows match per-threshold brute force; invariants hold everywhere") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(2).toLong))
    val got = Eval.prCurve(rows.toDF("score", "y"), "score", "y")
      .collect()
      .map(r => r.getAs[Long]("threshold") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Long]("fn"), r.getAs[Long]("tn"))).toMap
    val npos = rows.count(_._2 == 1L).toLong
    val nneg = rows.size - npos
    assert(got.keySet === rows.map(_._1).toSet)
    got.foreach { case (t, (tp, fp, fn, tn)) =>
      val btp = rows.count(r => r._1 >= t && r._2 == 1L).toLong
      val bfp = rows.count(r => r._1 >= t && r._2 == 0L).toLong
      assert((tp, fp, fn, tn) === ((btp, bfp, npos - btp, nneg - bfp)),
        s"threshold $t")
    }
  }

  test("cohensKappa matches the textbook formula; degenerate marginals handled") {
    import spark.implicits._
    // confusion matrix: a=b on 70 of 100, marginals a:(60,40) b:(70,30)
    val rows = Seq.fill(50)((1L, 1L)) ++ Seq.fill(20)((0L, 0L)) ++
      Seq.fill(10)((1L, 0L)) ++ Seq.fill(20)((0L, 1L))
    val r = Eval.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    val (total, agree, pe) =
      (r.getAs[Long]("total"), r.getAs[Long]("agree"), r.getAs[Long]("pe_num"))
    assert(total === 100L && agree === 70L)
    assert(pe === 60L * 70L + 40L * 30L) // Σ marginal products
    assert(r.getAs[Long]("kappa_num") === agree * total - pe)
    assert(r.getAs[Long]("kappa_den") === total * total - pe)
    // disjoint label sets: no marginal pair matches → pe_num = 0
    val disjoint = Seq((1L, 2L), (1L, 2L)).toDF("a", "b")
    val d = Eval.cohensKappa(disjoint, "a", "b").head()
    assert(d.getAs[Long]("pe_num") === 0L && d.getAs[Long]("agree") === 0L)
  }

  test("eceBinned: bins, counts, and the ECE identity against brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(300)((rnd.nextInt(1000001).toLong,
      if (rnd.nextBoolean()) 1L else 0L))
    val got = Eval.eceBinned(rows.toDF("ppm", "y"), "ppm", "y", bins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val brute = rows.groupBy { case (p, _) => math.min(p * 10 / 1000000, 9) }
      .map { case (b, xs) =>
        val pos = xs.map(_._2).sum; val conf = xs.map(_._1).sum
        b -> (xs.size.toLong, pos, conf, math.abs(1000000L * pos - conf))
      }
    assert(got === brute)
    // the scalar identity: sum(ece_num)/(1e6*N) == sum over bins of
    // (n_b/N)*|acc_b - conf_b| computed in doubles (within fp tolerance)
    val n = rows.size.toDouble
    val exact = got.values.map(_._4).sum / (1e6 * n)
    val ref = brute.values.map { case (nb, pos, conf, _) =>
      (nb / n) * math.abs(pos.toDouble / nb - conf / (1e6 * nb))
    }.sum
    assert(math.abs(exact - ref) < 1e-9, s"$exact vs $ref")
    // ppm = 1e6 lands in the top bin (the min(..., bins-1) clamp)
    val top = Eval.eceBinned(Seq((1000000L, 1L)).toDF("ppm", "y"),
      "ppm", "y", bins = 10).head()
    assert(top.getLong(0) === 9L)
  }

  test("liftDeciles matches brute-force ranking incl. ties; invariants hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // heavy ties: scores in 0..9 over 200 rows, label correlated with score
    val rows = (1L to 200L).map { id =>
      val s = rnd.nextInt(10).toLong
      (id, s, if (rnd.nextInt(10).toLong < s) 1L else 0L)
    }
    val got = Eval.liftDeciles(rows.toDF("id", "s", "y"), "s", "y", "id",
        buckets = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // brute force: sort by (score desc, id), cut into 10 equal buckets
    val ranked = rows.sortBy { case (id, s, _) => (-s, id) }
    val n = ranked.size; val pos = ranked.map(_._3).sum
    val exp = ranked.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
      .map { case (d, g) => d -> (g.size.toLong, g.map(_._1._3).sum) }
    assert(got.keySet === exp.keySet)
    var cumN = 0L; var cumP = 0L
    (0L to 9L).foreach { d =>
      val (en, ep) = exp(d); cumN += en; cumP += ep
      val (gn, gp, gcn, gcp, lnum, lden) = got(d)
      assert((gn, gp, gcn, gcp) === ((en, ep, cumN, cumP)), s"decile $d")
      assert(lnum === cumP * n && lden === cumN * pos)
    }
    assert(cumN === n && cumP === pos) // gains reach 100%
    // perfect scorer: every positive precedes every negative
    val perf = (1L to 100L).map(id => (id, 100L - id, if (id <= 30) 1L else 0L))
    val pd = Eval.liftDeciles(perf.toDF("id", "s", "y"), "s", "y", "id", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pd(0L) === 10L && pd(1L) === 10L && pd(2L) === 10L) // first 3 deciles all positive
    assert((3L to 9L).forall(pd(_) === 0L))
  }

  test("spearmanExact matches brute-force midrank Pearson incl. heavy ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val rows = Seq.fill(200)((rnd.nextInt(6).toLong, rnd.nextInt(9).toLong))
      val got = Eval.spearmanExact(rows.toDF("x", "y"), "x", "y").head()
      // brute force: average ranks (1-based), then Pearson
      def avgRanks(vs: Seq[Long]): Seq[Double] = {
        val sorted = vs.sorted.zipWithIndex.groupBy(_._1)
          .map { case (v, g) => v -> g.map(_._2 + 1.0).sum / g.size }
        vs.map(sorted)
      }
      val xr = avgRanks(rows.map(_._1)); val yr = avgRanks(rows.map(_._2))
      val n = rows.size.toDouble
      val mx = xr.sum / n; val my = yr.sum / n
      val cov = xr.zip(yr).map { case (a, b) => (a - mx) * (b - my) }.sum
      val vx = xr.map(a => (a - mx) * (a - mx)).sum
      val vy = yr.map(b => (b - my) * (b - my)).sum
      val expected = cov / math.sqrt(vx * vy)
      assert(got.getAs[Long]("n_rows") === 200L, s"trial $trial")
      assert(math.abs(got.getAs[Double]("spearman_rho") - expected) < 1e-6,
        s"trial $trial: got ${got.getAs[Double]("spearman_rho")} vs $expected")
    }
    // monotone transform invariance: rho(x, x^3) = 1 on distinct values
    val mono = (1L to 50L).map(v => (v, v * v * v))
    val r1 = Eval.spearmanExact(mono.toDF("x", "y"), "x", "y").head()
    assert(r1.getAs[Double]("spearman_rho") === 1.0)
  }

  test("rankBuckets: floor allocation, ties split by id, n<buckets, buckets=1") {
    import spark.implicits._
    // 10 rows, 5 buckets: exactly 2 per bucket; ties on value split by id
    val rows = Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L), (1L, 5L),
      (9L, 6L), (9L, 7L), (2L, 8L), (2L, 9L), (7L, 10L))
    val got = Eval.rankBuckets(rows.toDF("v", "id"), "v", "id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force the same formula: rank over (v, id), ((rank-1)*5) div 10
    val expected = rows.sortBy(identity).map(_._2).zipWithIndex
      .map { case (id, i) => id -> (i.toLong * 5L) / 10L }.toMap
    assert(got === expected)
    // the tie group at v=5 (ranks 4..7) straddles buckets 1, 2 and 3 —
    // deliberately NOT ntile semantics, id order decides
    assert(Set(got(1L), got(2L), got(3L), got(4L)) === Set(1L, 2L, 3L))
    // n < buckets: ranks 1..2 over 5 buckets → buckets 0 and 2, never 5
    val tiny = Eval.rankBuckets(Seq((1L, 1L), (2L, 2L)).toDF("v", "id"),
        "v", "id", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny === Map(1L -> 0L, 2L -> 2L))
    // buckets = 1: everything in bucket 0
    val one = Eval.rankBuckets(rows.toDF("v", "id"), "v", "id", 1)
      .collect().map(_.getLong(1)).toSet
    assert(one === Set(0L))
  }

  test("retentionCurve matches brute-force Kaplan–Meier; zero-survival row is NULL") {
    import spark.implicits._
    // lifetimes with ties and gaps; max lifetime 9 → its row hits S=0
    val lifetimes = Seq(1L, 1L, 2L, 4L, 4L, 4L, 7L, 9L)
    val rows = lifetimes.zipWithIndex.map { case (l, i) => (i.toLong, l) }
    val got = Eval.retentionCurve(rows.toDF("id", "life"), "id", "life")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    val n = lifetimes.size
    val distinct = lifetimes.distinct.sorted
    var logS = 0.0
    distinct.foreach { t =>
      val churned = lifetimes.count(_ == t)
      val atRisk = lifetimes.count(_ >= t)
      val (gc, gr, gp, gs) = got(t)
      assert((gc, gr) === ((churned.toLong, atRisk.toLong)), s"t=$t")
      assert(gp === atRisk.toLong * 1000000L / n, s"t=$t retention")
      if (atRisk == churned) assert(gs.isEmpty, s"t=$t should be NULL")
      else {
        // per-step micro-nats are rounded BEFORE summing, so compare
        // against the same quantization
        logS += math.round(math.log((atRisk - churned).toDouble / atRisk) * 1e6).toDouble
        assert(gs.contains(logS.toLong), s"t=$t log-survival")
      }
    }
    assert(got.keySet === distinct.toSet)
  }

  test("giniExact matches brute force; endpoints 0 (uniform) and →1 (concentrated)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(150)(rnd.nextInt(1000).toLong + 1L)
    val rows = vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }
    val got = Eval.giniExact(rows.toDF("x", "id"), "x", "id").head()
    val sorted = vals.sorted
    val n = vals.size.toDouble
    val srx = sorted.zipWithIndex.map { case (v, i) => (i + 1.0) * v }.sum
    val expected = (2.0 * srx - (n + 1.0) * sorted.sum) / (n * sorted.sum)
    assert(got.getAs[Long]("n_rows") === 150L)
    assert(got.getAs[Long]("sum_val") === vals.sum)
    assert(math.abs(got.getAs[Double]("gini") - expected) < 1e-6)
    // perfectly equal values → gini exactly 0
    val eq = (1L to 40L).map(i => (5L, i))
    assert(Eval.giniExact(eq.toDF("x", "id"), "x", "id")
      .head().getAs[Double]("gini") === 0.0)
    // all mass on one holder of n → gini = (n-1)/n
    val conc = (1L to 9L).map(i => (0L, i)) :+ (100L, 10L)
    assert(Eval.giniExact(conc.toDF("x", "id"), "x", "id")
      .head().getAs[Double]("gini") === 0.9)
  }

  test("chiSquare matches the textbook statistic incl. zero cells") {
    import spark.implicits._
    // 2x3 contingency with one unobserved cell (a,z)
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(20)(("b", "y")) ++
      Seq.fill(15)(("b", "z"))
    val got = Eval.chiSquare(rows.toDF("u", "v"), "u", "v").head()
    val n = rows.size.toDouble
    val cellCounts = rows.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val rT = rows.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val cT = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    // keys.toSeq: yielding over Sets would DEDUPE equal per-cell terms
    val expected = (for (r <- rT.keys.toSeq; c <- cT.keys.toSeq) yield {
      val o = cellCounts.getOrElse((r, c), 0.0)
      val e = rT(r) * cT(c) / n
      (o - e) * (o - e) / e
    }).sum
    assert(got.getAs[Long]("n_rows") === 80L)
    assert(got.getAs[Long]("dof") === 2L)
    assert(math.abs(got.getAs[Double]("chi2") - expected) < 1e-4)
    val v = math.sqrt(got.getAs[Double]("chi2") / (n * 1.0))
    assert(math.abs(got.getAs[Double]("cramers_v") - v) < 1e-4)
  }

  test("pmiTable: independent columns give pmi 0; MI derives from the table") {
    import spark.implicits._
    // perfectly independent 2x2 (uniform)
    val ind = (for (a <- Seq("a", "b"); b <- Seq("x", "y"); _ <- 1 to 10)
      yield (a, b))
    val t0 = Eval.pmiTable(ind.toDF("u", "v"), "u", "v").collect()
    assert(t0.length === 4 && t0.forall(_.getAs[Double]("pmi") === 0.0))
    // perfectly dependent: MI = ln(2)
    val dep = Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y"))
    val t1 = Eval.pmiTable(dep.toDF("u", "v"), "u", "v").collect()
    val mi = t1.map(r => r.getAs[Long]("n_cell") * r.getAs[Double]("pmi")).sum / 20.0
    assert(math.abs(mi - math.log(2)) < 1e-5)
  }
}
