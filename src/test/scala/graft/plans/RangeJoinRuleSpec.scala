package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The automatic between-join rewrite: same rows as the naive nested-loop
  * plan, but planned as an equi join on the bin.
  */
class RangeJoinRuleSpec extends SparkSuite {

  private def withRule[A](binWidth: Long)(f: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RangeJoinRule
    spark.conf.set(RangeJoinRule.BinWidthConf, binWidth.toString)
    try f
    finally {
      spark.experimental.extraOptimizations = before
      spark.conf.unset(RangeJoinRule.BinWidthConf)
    }
  }

  private def fixtures = {
    import spark.implicits._
    val points = (0L until 2000L).map(i => (i, i * 3 % 997)).toDF("pid", "v")
    val intervals = Seq((1L, 10L, 25L), (2L, 100L, 103L), (3L, 990L, 996L),
      (4L, 500L, 500L), (5L, 2000L, 3000L)).toDF("iid", "lo", "hi")
    (points, intervals)
  }

  test("rewritten between-join equals the naive plan and plans as an equi join") {
    val (points, intervals) = fixtures
    val cond = col("v") >= col("lo") && col("v") <= col("hi")
    val naive = points.join(intervals, cond)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)

    withRule(16L) {
      val rewritten = points.join(intervals, cond)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rule should have produced an equi join:\n$plan")
      assert(plan.contains("Generate explode"), s"interval side should explode bins:\n$plan")
      val got = rewritten.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive)
    }
  }

  test("strict bounds and reversed operand order rewrite too, exactly") {
    val (points, intervals) = fixtures
    // lo < v AND hi > v  (bound-on-the-left forms)
    val cond = col("lo") < col("v") && col("hi") > col("v")
    val naive = points.join(intervals, cond)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule(16L) {
      val rewritten = points.join(intervals, cond)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      val got = rewritten.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive)
    }
  }

  test("joins with a cross-side equi key are left alone") {
    import spark.implicits._
    val (points, _) = fixtures
    val intervals = Seq((1L, 10L, 25L, 3L), (2L, 100L, 103L, 6L))
      .toDF("iid", "lo", "hi", "pkey")
    withRule(16L) {
      val joined = points.join(intervals,
        col("pid") === col("pkey") && col("v") >= col("lo") && col("v") <= col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Generate explode"),
        s"equi-joinable condition must not be rewritten:\n$plan")
      joined.collect() // still runs
    }
  }

  test("unparseable binWidth conf disables the rule instead of breaking the session") {
    val (points, intervals) = fixtures
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RangeJoinRule
    spark.conf.set(RangeJoinRule.BinWidthConf, "1.5days")
    try {
      // the rule runs on EVERY plan — a throwing parse would fail even this
      assert(spark.range(10).count() == 10)
      val joined = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(!joined.queryExecution.executedPlan.toString.contains("Generate explode"))
      joined.collect()
    } finally {
      spark.experimental.extraOptimizations = before
      spark.conf.unset(RangeJoinRule.BinWidthConf)
    }
  }

  test("fan-out guard raises on a wide interval instead of exploding it") {
    val (points, intervals) = fixtures // iid=5 spans 2000..3000
    withRule(16L) {
      intervals.join(points, col("v") >= col("lo") && col("v") <= col("hi")).collect()
    }
    // binWidth=1 over a 10M-wide interval → 10M bins per row: must raise
    import spark.implicits._
    val wide = Seq((1L, 0L, 10000000L)).toDF("iid", "lo", "hi")
    withRule(1L) {
      val e = intercept[Exception] {
        fixtures._1.join(wide, col("v") >= col("lo") && col("v") <= col("hi")).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("fan-out exceeds")), s"got: ${msgs(e)}")
    }
  }

  test("rule is inert without the conf") {
    val (points, intervals) = fixtures
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ RangeJoinRule
    try {
      val plan = points.join(intervals,
          col("v") >= col("lo") && col("v") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Generate explode"), plan)
    } finally spark.experimental.extraOptimizations = before
  }
}
