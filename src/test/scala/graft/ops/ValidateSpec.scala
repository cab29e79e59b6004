package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ops.Validate.Checks._

/** Structural + behavioral assertions for the one-pass validation suite.
  * The data path (observed values vs DuckDB) is under the hash gate via
  * ProfileOps' q_validate.
  */
class ValidateSpec extends SparkSuite {

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("run computes the whole suite; passes() gates on the worst check") {
    val res = Validate.run(li, Seq(
      completeness("l_returnflag"),
      minBound("l_quantity", 1.0),
      maxBound("l_quantity", 100.0),
      sizeBetween(1L))).collect()
    assert(res.length === 4)
    assert(res.forall(_.getBoolean(2)))
    assert(Validate.passes(li, Seq(completeness("l_returnflag"))))
    // a violated bound flips only its own row, and the gate
    val mixed = Validate.run(li, Seq(
      minBound("l_quantity", 1000.0), // fails: quantities are ≤ 50
      sizeBetween(1L))).collect()
    assert(mixed.count(_.getBoolean(2)) === 1)
    assert(!Validate.passes(li, Seq(minBound("l_quantity", 1000.0))))
  }

  test("null and set semantics: completeness counts nulls, containedIn ignores them") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("b"), None, Some("zz"))
      .toDF("v")
    val byName = Validate.run(df, Seq(
        completeness("v", 0.5),
        containedIn("v", Seq("a", "b"), 0.5),
        matches("v", "^[ab]$", 0.5),
        uniqueness("v")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(byName("completeness:v") === ((0.75, true)))
    // 2 of 3 NON-null values in the set (full precision — no pre-rounding)
    assert(math.abs(byName("contained_in:v")._1 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(byName("matches:v")._1 - 2.0 / 3.0) < 1e-12)
    assert(byName("uniqueness:v") === ((1.0, true)))
  }

  test("the suite is ONE aggregation pass: a single scan of the input") {
    val plan = Validate.run(li, Seq(
      completeness("l_returnflag"),
      minBound("l_quantity", 1.0),
      meanBetween("l_tax", 0.0, 1.0),
      compliance("pos", col("l_extendedprice") > 0)))
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans === 1, s"expected one scan, plan:\n$plan")
  }

  test("an EMPTY input fails the gate (null metrics → failed, never NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("t", "v")
    // ratio checks on zero rows are 0/0 = null observed — the verdict
    // must be a clean FAIL, not a null that NPEs the caller
    assert(!Validate.passes(empty, Seq(
      completeness("t"), uniqueness("v"), minBound("v", 0.0))))
    val rows = Validate.run(empty, Seq(completeness("t"))).collect()
    assert(rows.length === 1 && !rows(0).getBoolean(2))
    assert(rows(0).isNullAt(1)) // observed stays null — honest "no data"
    // sizeBetween(0) is the one check an empty input can legitimately pass
    assert(Validate.passes(empty, Seq(sizeBetween(0L))))
  }

  test("strict 1.0 gates are NOT rounded past small violations") {
    // 20 001 rows with ONE duplicate key: ratio 20000/20001 = 0.99995…
    // A 4-decimal pre-round would report 1.0 and pass the release gate
    val df = spark.range(20000).toDF("id")
      .unionByName(spark.range(1).toDF("id"))
    val r = Validate.run(df, Seq(uniqueness("id"))).collect()(0)
    assert(!r.getBoolean(2), "a duplicate key slipped through the 1.0 gate")
    assert(r.getDouble(1) < 1.0)
  }

  test("runGrouped: per-group verdicts differ where the data differs") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 2L))
      .toDF("g", "v")
    val rows = Validate.runGrouped(df, Seq("g"), Seq(uniqueness("v")))
      .collect().map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(rows === Map("a" -> true, "b" -> false))
    // still ONE scan for the whole grouped suite
    val plan = Validate.runGrouped(df, Seq("g"),
      Seq(uniqueness("v"), completeness("v"), minBound("v", 0.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "grouped suite must not fan into unions")
  }

  test("duplicate check names and empty suites are refused") {
    intercept[IllegalArgumentException] {
      Validate.run(li, Seq(sizeBetween(1L), sizeBetween(2L)))
    }
    intercept[IllegalArgumentException] { Validate.run(li, Seq.empty) }
  }

  test("driftHistogram: identical distributions have TV 0, disjoint TV 1") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 11.0, 12.0).toDF("x")
    val same = Validate.driftHistogram(a, a.orderBy(desc("x")), "x", 0.0, 10.0, 3)
    val tv0 = Validate.totalVariation(same).head()
    assert(tv0.getLong(0) == 5L && tv0.getLong(1) == 5L && tv0.getDouble(2) == 0.0)
    val b = Seq(21.0, 22.0).toDF("x")
    val tv1 = Validate.totalVariation(
      Validate.driftHistogram(a, b, "x", 0.0, 10.0, 3)).head()
    assert(tv1.getDouble(2) == 1.0)
  }

  test("totalVariation poles: an empty side is TV 1 (not NaN); two empty sides TV 0") {
    import spark.implicits._
    val ref = Seq(1.0, 2.0).toDF("x")
    val none = Seq.empty[Double].toDF("x")
    val oneEmpty = Validate.totalVariation(
      Validate.driftHistogram(ref, none, "x", 0.0, 10.0, 3)).head()
    assert(oneEmpty.getDouble(2) == 1.0)
    val bothEmpty = Validate.totalVariation(
      Validate.driftHistogram(none, none, "x", 0.0, 10.0, 3)).head()
    assert(bothEmpty.getLong(0) == 0L && bothEmpty.getDouble(2) == 0.0)
  }

  test("driftHistogram: under/overflow clamp, null exclusion, zero-count buckets") {
    import spark.implicits._
    val ref = Seq(Some(-5.0), Some(5.0), Some(95.0), None).toDF("x")
    val cur = Seq(Some(5.0)).toDF("x")
    val rows = Validate.driftHistogram(ref, cur, "x", 0.0, 10.0, 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // -1 underflow, bucket 0, bucket 9 overflow; the null row never counts
    assert(rows == Set((-1L, 1L, 0L), (0L, 1L, 1L), (9L, 1L, 0L)))
    // TV = (|1*1-0*3| + |1*1-1*3| + |1*1-0*3|) / (2*3*1) = 4/6
    val tv = Validate.totalVariation(
      Validate.driftHistogram(ref, cur, "x", 0.0, 10.0, 9)).head().getDouble(2)
    assert(math.abs(tv - 4.0 / 6.0) < 1e-6)
  }

  test("ksJackknife: empty pole, degenerate guard, sane on a real split") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val pole = Validate.ksJackknife(empty, empty, "v", "id",
      lo = 0.0, width = 10.0, buckets = 5).head()
    assert(pole.getAs[Long]("n_ref") === 0L && pole.getAs[Long]("n_cur") === 0L)
    assert(pole.getAs[Double]("ks") === 0.0)
    assert(pole.getAs[Long]("n_groups") === 0L && pole.isNullAt(4))
    // degenerate: every cur row in ONE group -> loud refusal
    val ref = (1L to 60L).map(i => (i, i % 40)).toDF("id", "v")
    val cur1 = (1L to 30L).map(i => (i * 4, i % 40)).toDF("id", "v") // all grp 0
    intercept[IllegalArgumentException] {
      Validate.ksJackknife(ref, cur1, "v", "id",
        lo = 0.0, width = 10.0, buckets = 5, nGroups = 4).collect()
    }
    // healthy split: overall ks matches ksStatistic on the same histogram,
    // se non-negative, groups counted
    val cur = (1L to 60L).map(i => (i, (i * 7) % 40)).toDF("id", "v")
    val got = Validate.ksJackknife(ref, cur, "v", "id",
      lo = 0.0, width = 10.0, buckets = 5, nGroups = 4).head()
    val ksRef = Validate.ksStatistic(
      Validate.driftHistogram(ref, cur, "v", 0.0, 10.0, 5)
        .localCheckpoint(true)).head().getAs[Double]("ks")
    assert(got.getAs[Double]("ks") === ksRef)
    assert(got.getAs[Long]("n_groups") === 4L)
    assert(got.getAs[Double]("jack_se") >= 0.0)
  }
}
