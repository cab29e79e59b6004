package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property tests pinning the drift statistics (TV / PSI / KS) against
  * driver-side model implementations on RANDOM histograms — every bucket
  * shape, zero buckets, one-sided emptiness, both-empty poles. The models
  * recompute the documented formulas independently (plain Scala folds, the
  * same round-to-6 stations); equality means the DataFrame plans implement
  * exactly the contract the scaladocs state.
  */
object DriftStatProperties extends Properties("graft.ops.DriftStats") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val histGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 8)
    buckets <- Gen.pick(n, -1L to 10L)
    refs <- Gen.listOfN(n, Gen.frequency(3 -> Gen.choose(0L, 50L), 1 -> Gen.const(0L)))
    curs <- Gen.listOfN(n, Gen.frequency(3 -> Gen.choose(0L, 50L), 1 -> Gen.const(0L)))
    zeroSide <- Gen.frequency(8 -> Gen.const(0), 1 -> Gen.const(1), 1 -> Gen.const(2))
  } yield buckets.toList.sorted.lazyZip(refs).lazyZip(curs).map {
    case (b, r, c) => (b,
      if (zeroSide == 1) 0L else r,
      if (zeroSide == 2) 0L else c)
  }

  private def toDf(rows: List[(Long, Long, Long)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_ref",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_cur",
          org.apache.spark.sql.types.LongType, nullable = false))))

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def modelTv(rows: List[(Long, Long, Long)]): Double = {
    val tr = rows.map(_._2).sum
    val tc = rows.map(_._3).sum
    if (tr == 0 && tc == 0) 0.0
    else if (tr == 0 || tc == 0) 1.0
    else {
      val l1 = rows.map { case (_, nr, nc) =>
        (BigInt(nr) * BigInt(tc) - BigInt(nc) * BigInt(tr)).abs
      }.sum
      r6(l1.toDouble / (2.0 * tr.toDouble * tc.toDouble))
    }
  }

  private def modelPsi(rows: List[(Long, Long, Long)]): Double = {
    val tr = rows.map(_._2).sum
    val tc = rows.map(_._3).sum
    if (tr == 0 && tc == 0) return 0.0
    val nb = rows.length
    val terms = rows.map { case (_, nr, nc) =>
      val pr = (nr + 1).toDouble / (tr + nb).toDouble
      val pc = (nc + 1).toDouble / (tc + nb).toDouble
      BigDecimal(r6((pc - pr) * r6(math.log(pc / pr))))
    }
    r6(terms.sum.toDouble)
  }

  private def modelKs(rows: List[(Long, Long, Long)]): Double = {
    val tr = rows.map(_._2).sum
    val tc = rows.map(_._3).sum
    if (tr == 0 && tc == 0) 0.0
    else if (tr == 0 || tc == 0) 1.0
    else {
      val sorted = rows.sortBy(_._1)
      var cr = 0L; var cc = 0L
      var gap = BigInt(0)
      sorted.foreach { case (_, nr, nc) =>
        cr += nr; cc += nc
        val g = (BigInt(cr) * BigInt(tc) - BigInt(cc) * BigInt(tr)).abs
        if (g > gap) gap = g
      }
      r6(gap.toDouble / (tr.toDouble * tc.toDouble))
    }
  }

  private def modelJs(rows: List[(Long, Long, Long)]): Double = {
    val tr = rows.map(_._2).sum
    val tc = rows.map(_._3).sum
    if (tr == 0 && tc == 0) 0.0
    else if (tr == 0 || tc == 0) 0.693147
    else {
      val terms = rows.map { case (_, nr, nc) =>
        val p = nr.toDouble / tr.toDouble
        val q = nc.toDouble / tc.toDouble
        val m = (p + q) / 2.0
        val tp = if (nr > 0) p * r6(math.log(p / m)) else 0.0
        val tq = if (nc > 0) q * r6(math.log(q / m)) else 0.0
        BigDecimal(r6((tp + tq) / 2.0))
      }
      r6(terms.sum.toDouble)
    }
  }

  property("tv/psi/ks/js equal the driver-side models on random histograms") =
    forAll(histGen) { rows =>
      val df = toDf(rows)
      val tv = Validate.totalVariation(df).head().getAs[Double]("tv")
      val psi = Validate.psi(df).head().getAs[Double]("psi")
      val ks = Validate.ksStatistic(df).head().getAs[Double]("ks")
      val js = Validate.jsDivergence(df).head().getAs[Double]("js")
      val ok = tv == modelTv(rows) && math.abs(psi - modelPsi(rows)) < 1e-12 &&
        ks == modelKs(rows) && math.abs(js - modelJs(rows)) < 1e-12 &&
        js >= -1e-12 && js <= 0.693148 // bounded in [0, ln 2] by identity
      if (!ok) println(s"rows=$rows tv=$tv/${modelTv(rows)} " +
        s"psi=$psi/${modelPsi(rows)} ks=$ks/${modelKs(rows)} " +
        s"js=$js/${modelJs(rows)}")
      ok
    }
}
