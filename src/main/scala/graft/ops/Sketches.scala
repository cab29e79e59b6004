package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch aggregation — the incremental-analytics pattern for
  * 100 TB corpora. An exact COUNT(DISTINCT) over a petabyte-scale key space
  * must shuffle every distinct value to a single reducer per group; an HLL
  * sketch is a few KB per group, combines associatively (partial aggregation
  * map-side, merge reduce-side — Spark plans hll_sketch_agg exactly like
  * sum), and — crucially — persists: per-partition/per-day sketches written
  * once can answer any later rollup by union WITHOUT rescanning the data.
  *
  * Built on Spark 4's bundled Apache DataSketches HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`): standard
  * error ≈ 1.04/√2^lgK (~1.6% at the default lgK=12).
  *
  * The reference has no approximate aggregates at all (SURVEY §2.4 lists
  * exact COUNT/SUM/AVG only — reference column.py:162-208); this is part of
  * the scale extension, alongside dedup and ANN.
  */
object Sketches {

  /** Per-group HLL sketches of `valueCol` distinct values: one binary
    * sketch column per group row. Persist this table (e.g. one row per
    * (day, dimension)) and later rollups never rescan the raw data.
    */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll sketches up to a coarser grouping: union the sketches, estimate.
    * `keep` ⊆ the grouping of the sketch table.
    */
  def rollup(sketches: DataFrame, keep: Seq[String],
      estimateAs: String = "approx_distinct"): DataFrame =
    sketches.groupBy(keep.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as(estimateAs))

  /** Global estimate from a sketch table (union all groups). */
  def estimateAll(sketches: DataFrame): Long =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col("sketch"))))
      .head().getLong(0)

  /** Approximate distinct count per group in one shot (sketch + estimate
    * fused — no persisted sketch table).
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
        .as("approx_distinct"))

  /** Count-min sketch cells (Cormode & Muthukrishnan 2005): `d` hash rows
    * × `w` buckets; cell (j, h) holds the summed count of all items whose
    * row-j hash lands on h. The whole sketch is d×w BIGINTs — KBs —
    * regardless of corpus size, built in ONE groupBy whose key space is
    * bounded at d·w (map-side partials shrink each partition's
    * contribution to ≤ d·w rows before the shuffle), and two sketches
    * merge by cell-wise addition, so per-day/per-shard sketches roll up
    * without rescans. Hashes are the house md5 hex→int convention keyed
    * `j:item`, so the sketch is bit-deterministic and SQL-replayable —
    * the DuckDB oracle builds the identical cells and the gate
    * hash-compares estimates, not just bounds.
    */
  def countMinCells(df: DataFrame, itemCol: String, d: Int = 3,
      w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 2, "countMinCells: need d >= 1, w >= 2")
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(explode(array((0 until d).map(j => lit(j.toLong)): _*)).as("j"),
        col("item"))
      .withColumn("h", cmHash(col("j"), col("item"), w))
      .groupBy("j", "h").agg(count(lit(1)).as("c"))
  }

  /** Point-frequency estimates for `items` from a cell table: estimate =
    * min over the d row cells the item hashes to (each is count +
    * non-negative collision noise, so min is the tightest upper bound;
    * never underestimates). One broadcast-sized join against the d×w
    * cell table — probing never touches the raw corpus.
    */
  def countMinEstimate(cells: DataFrame, items: DataFrame, itemCol: String,
      d: Int = 3, w: Int = 64): DataFrame = {
    require(d >= 1 && w >= 2, "countMinEstimate: need d >= 1, w >= 2")
    // d and w MUST equal the countMinCells build parameters: probing with
    // different ones lands on absent (j, h) cells and the coalesce(c, 0)
    // below would silently UNDERestimate — the one contract violation a
    // count-min sketch must never commit
    items.select(col(itemCol).cast("string").as("item")).distinct()
      .select(col("item"),
        explode(array((0 until d).map(j => lit(j.toLong)): _*)).as("j"))
      .withColumn("h", cmHash(col("j"), col("item"), w))
      .join(cells, Seq("j", "h"), "left")
      .groupBy("item").agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Row-j bucket of `item`: md5("j:item") first 15 hex digits → BIGINT,
    * mod w (positive: the 60-bit value is non-negative).
    */
  private def cmHash(j: Column, item: Column, w: Int): Column =
    conv(substring(md5(concat(j.cast("string"), lit(":"), item)), 1, 15),
      16, 10).cast("long") % w

  /** Approximate quantiles via the positional-error sketch behind
    * `percentile_approx`: mergeable the same way (partial per partition,
    * merged on the reducer), bounded memory regardless of input size —
    * where the exact `median`/`percentile` must materialize the full sorted
    * column per group.
    */
  def approxQuantiles(valueCol: String, probabilities: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(col(valueCol),
      array(probabilities.map(lit): _*), lit(accuracy))

  /** Frequent items via Spark 4's ApproxTopK sketch (a Misra-Gries-family
    * summary): top `k` items with estimated counts, tracking up to
    * `maxItemsTracked` distinct values in bounded memory. Mergeable like
    * the other sketches (partial per partition, merged on the reducer) —
    * the heavy-hitters primitive for vocabulary/domain/source audits at
    * corpus scale. Counts are EXACT while the true distinct count stays
    * under maxItemsTracked; past it they become lower-bound estimates.
    * Returns (item, cnt) rows ordered (cnt DESC, item) — a deterministic
    * total order.
    */
  def frequentItems(df: DataFrame, itemCol: String, k: Int,
      maxItemsTracked: Int = 10000): DataFrame =
    // backquoted (with ` doubled) so names needing quoting — dots, spaces,
    // hyphens — parse as one identifier instead of a path expression
    df.agg(expr(s"approx_top_k(`${itemCol.replace("`", "``")}`, $k, $maxItemsTracked)").as("__tk"))
      .select(explode(col("__tk")).as("__e"))
      .select(col("__e.item").as("item"), col("__e.count").cast("long").as("cnt"))
      .orderBy(desc("cnt"), asc("item"))

  /** Per-group THETA sketches of `valueCol` — like [[hllSketch]] but the
    * sketch also supports INTERSECTION and DIFFERENCE (`theta_intersection`
    * / `theta_difference`), the set questions HLL cannot answer: audience
    * overlap, day-over-day churn. Same persistence story: write one sketch
    * row per (period, dimension), answer any later set-algebra question in
    * sketch space. Spark 4.1 bundles the full theta function set
    * (`theta_sketch_agg` plans like sum: partial map-side, merge
    * reduce-side); below the 2^lgK capacity the sketch retains every hash
    * and estimates — including of intersections/differences — are exact.
    */
  def thetaSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(theta_sketch_agg(col(valueCol), lgK).as("sketch"))

  /** Consecutive-period retention/churn from a per-period sketch table:
    * for each period p with a successor p+1 — |active(p) ∩ active(p+1)|,
    * |active(p) \ active(p+1)|, |active(p) ∪ active(p+1)|. One self-join
    * of the TINY sketch table (one row per period); raw data is scanned
    * exactly once, by [[thetaSketch]].
    */
  def retention(sketches: DataFrame, periodCol: String): DataFrame = {
    val a = sketches.select(col(periodCol).as("__p"), col("sketch").as("__sa"))
    val b = sketches.select(col(periodCol).as("__pn"), col("sketch").as("__sb"))
    a.join(b, col("__pn") === col("__p") + 1)
      .select(col("__p").as(periodCol),
        theta_sketch_estimate(theta_intersection(col("__sa"), col("__sb"))).as("retained"),
        theta_sketch_estimate(theta_difference(col("__sa"), col("__sb"))).as("churned"),
        theta_sketch_estimate(theta_union(col("__sa"), col("__sb"))).as("either"))
  }

  /** Pairwise audience-overlap matrix across a dimension, from ONE sketch
    * table: for every unordered pair a < b of `dimCol` values — |A|, |B|,
    * |A ∩ B|, |A ∪ B|. [[retention]] generalized from consecutive periods
    * to the full cross of a dimension (which segments share users? which
    * event types co-occur?).
    *
    * The raw data is scanned exactly once, by [[thetaSketch]]; this join is
    * over the SKETCH table — one row per dimension value — so the quadratic
    * pair blowup is over dim-cardinality (tens to thousands), never over
    * rows. The non-equi `<` condition plans as a broadcast nested-loop of
    * that tiny table: the right shape, because every pair genuinely IS
    * needed. Below sketch capacity (2^lgK) all four numbers are exact.
    */
  def audienceMatrix(sketches: DataFrame, dimCol: String): DataFrame = {
    val a = sketches.select(col(dimCol).as("dim_a"), col("sketch").as("__sa"))
    val b = sketches.select(col(dimCol).as("dim_b"), col("sketch").as("__sb"))
    a.join(b, col("dim_a") < col("dim_b"))
      .select(col("dim_a"), col("dim_b"),
        theta_sketch_estimate(col("__sa")).as("n_a"),
        theta_sketch_estimate(col("__sb")).as("n_b"),
        theta_sketch_estimate(theta_intersection(col("__sa"), col("__sb"))).as("overlap"),
        theta_sketch_estimate(theta_union(col("__sa"), col("__sb"))).as("either"))
  }
}
