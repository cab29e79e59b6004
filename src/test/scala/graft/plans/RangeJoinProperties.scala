package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test for the automatic between-join rewrite: on RANDOM points,
  * intervals (including empty, point-width, overlapping, and out-of-range
  * ones) and bin widths, the rewritten plan must return exactly the naive
  * nested-loop join's rows. Optimizer rules are the riskiest code in the
  * repo — a wrong bin boundary silently drops matches.
  */
object RangeJoinProperties extends Properties("graft.plans.RangeJoinRule") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val gen: Gen[(Seq[(Long, Long)], Seq[(Long, Long, Long)], Long)] = for {
    np <- Gen.choose(1, 60)
    ni <- Gen.choose(1, 15)
    points <- Gen.listOfN(np, Gen.choose(-50L, 150L))
    ivs <- Gen.listOfN(ni, for {
      lo <- Gen.choose(-60L, 160L)
      len <- Gen.choose(-3L, 40L) // negative => empty interval
    } yield (lo, lo + len))
    w <- Gen.choose(1L, 25L)
  } yield (points.zipWithIndex.map { case (v, i) => (i.toLong, v) },
    ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }, w)

  property("rewritten between-join equals naive on random data") =
    forAll(gen) { case (points, intervals, w) =>
      import spark.implicits._
      val p = points.toDF("pid", "v")
      val iv = intervals.toDF("iid", "lo", "hi")
      val cond = col("v") >= col("lo") && col("v") <= col("hi")
      val naive = p.join(iv, cond).select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val before = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations = before :+ RangeJoinRule
      spark.conf.set(RangeJoinRule.BinWidthConf, w.toString)
      try {
        val rewritten = p.join(iv, cond)
        val plan = rewritten.queryExecution.executedPlan.toString
        val got = rewritten.select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        plan.contains("Generate explode") && got == naive
      } finally {
        spark.experimental.extraOptimizations = before
        spark.conf.unset(RangeJoinRule.BinWidthConf)
      }
    }
}
