package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** HLL sketch ops: estimation error within the published bound, sketches
  * merge associatively (the persisted-rollup pattern), and the aggregation
  * plans with a map-side partial like any algebraic aggregate.
  */
class SketchesSpec extends SparkSuite {

  test("estimate within the 1.04/sqrt(2^lgK) bound in the estimation regime") {
    val n = 200000L
    val df = spark.range(n).select(col("id").as("v"))
    val global = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("e"))
      .head().getLong(0)
    // lgK=12 -> relative standard error ~1.6%; allow 3 sigma
    assert(math.abs(global - n).toDouble / n < 0.05, s"estimate $global vs $n")
  }

  test("union of per-partition sketches equals the whole-table sketch estimate") {
    val df = spark.range(150000L).select(col("id").as("v"),
      pmod(col("id"), lit(16)).as("part"))
    val whole = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12)))).head().getLong(0)
    val partial = Sketches.hllSketch(df, Seq("part"), "v")
    val merged = Sketches.estimateAll(partial)
    assert(merged == whole, s"merged $merged != whole $whole")
  }

  test("rollup over a persisted sketch table matches direct estimates") {
    // Q.t normalizes ts to the epoch-nanos long contract regardless of the
    // parquet encoding generation (nanos vs micros)
    val events = graft.queries.Q.t(spark, sfDir, "events")
    // "persist" daily sketches (the write-once table), then roll up
    val daily = Sketches.hllSketch(
      events.withColumn("day", expr("ts div 86400000000000")),
      Seq("day", "event_type"), "user_id")
    val rolled = Sketches.rollup(daily, Seq("event_type"))
      .orderBy("event_type").collect()
    val direct = Sketches.approxDistinct(events, Seq("event_type"), "user_id")
      .orderBy("event_type").collect()
    assert(rolled.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      direct.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("frequentItems: exact counts under maxItemsTracked, top-k selection, skewed tail") {
    // skewed synthetic: item i appears 2^(10-i) times, i in 0..9
    val rows = (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"item_$i"))
    import spark.implicits._
    val df = rows.toDF("w").repartition(4)
    val top3 = Sketches.frequentItems(df, "w", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top3.toSeq == Seq(("item_0", 1024L), ("item_1", 512L), ("item_2", 256L)))
    // k beyond the vocabulary returns every item, still exact
    val all = Sketches.frequentItems(df, "w", k = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(all.size == 10 && (0 until 10).forall(i => all(s"item_$i") == (1L << (10 - i))))
  }

  test("frequentItems accepts column names needing backquoting (dots, spaces, hyphens)") {
    import spark.implicits._
    val df = Seq("a", "a", "b").toDF("the word")
      .withColumn("dot.ted", org.apache.spark.sql.functions.col("`the word`"))
    assert(Sketches.frequentItems(df, "the word", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 2L), ("b", 1L)))
    assert(Sketches.frequentItems(df, "dot.ted", k = 1)
      .head().getString(0) == "a")
  }

  test("sketch aggregation plans with a map-side partial") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val plan = Sketches.approxDistinct(events, Seq("event_type"), "user_id")
      .queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate:\n$plan")
  }
}
