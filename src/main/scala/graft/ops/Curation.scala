package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators as a reusable library: deterministic
  * sampling, token-budget packing, curriculum tiers, chunking, and
  * benchmark decontamination. Each mirrors an oracle-verified query in
  * graft.queries.TrainOps (equality asserted in CurationSpec) — the query
  * inventory proves correctness against DuckDB, this module is the API a
  * pipeline composes.
  *
  * All operators are rand()-free: "random" orders come from hashes and
  * weighted selection from integer systematic sampling, so a re-run over
  * the same corpus reproduces the same output — a hard requirement for
  * auditable training-data lineage.
  */
object Curation {

  /** Exactly-k docs per stratum, chosen by deterministic md5-hash order.
    * Plans as WindowGroupLimit (bounded heap per partition, no global
    * sort).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Weight-proportional systematic sample: a row is selected iff its
    * weight interval [cum-w, cum) crosses a multiple of the per-stratum
    * step (stratum total / target). Selection probability ∝ weight, zero
    * randomness; integer weights keep both the prefix sums and the
    * crossings exact.
    */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
      weightCol: String, targetPerStratum: Long): DataFrame = {
    val weighted = df.withColumn("__w", col(weightCol).cast("long"))
    val totals = weighted.groupBy(strataCol)
      .agg(sum(col("__w")).as("__tot"))
      .withColumn("__step", greatest(expr(s"__tot div ${targetPerStratum}L"), lit(1L)))
      .select(strataCol, "__step")
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weighted
      .withColumn("__cum", sum(col("__w")).over(w))
      .join(broadcast(totals), strataCol)
      .filter(expr("(__cum - __w) div __step") < expr("__cum div __step"))
      .drop("__w", "__cum", "__step")
  }

  /** Greedy fixed-budget shard assignment from the exclusive running total
    * of `weightCol` (token counts), per packing unit: adds a `shard`
    * column. The window distributes across units; rows keep their order.
    */
  def packByBudget(df: DataFrame, unitCol: String, orderCol: String,
      weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(unitCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__before", coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L)))
      .withColumn("shard", expr(s"__before div ${budget}L"))
      .drop("__before")
  }

  /** Equal-count curriculum tiers per stratum over `scoreCol` (ties broken
    * by `idCol` for determinism): adds a `tier` column in 1..nTiers.
    */
  def curriculumTiers(df: DataFrame, strataCol: String, scoreCol: String,
      idCol: String, nTiers: Int): DataFrame =
    df.withColumn("tier", ntile(nTiers).over(
      Window.partitionBy(strataCol).orderBy(col(scoreCol), col(idCol))))

  /** Overlapping fixed-width character chunks of `textCol`: one output row
    * per chunk with `chunk_start` (1-based) and `chunk` columns. Map-only;
    * fan-out = ceil(len/stride) per row.
    */
  def chunk(df: DataFrame, textCol: String, width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    df.filter(length(col(textCol)) > 0)
      .withColumn("chunk_start",
        explode(sequence(lit(1), length(col(textCol)), lit(stride))))
      .withColumn("chunk", substring(col(textCol), col("chunk_start"), lit(width)))
  }

  /** Repeat each row `factors(key)` times (default 1) — deterministic
    * mixture upsampling (high-quality sources seen multiple epochs). Adds
    * an `epoch` column in 1..factor; fan-out bounded by the factor table.
    */
  def upsampleMixture(df: DataFrame, keyCol: String,
      factors: Map[String, Int]): DataFrame = {
    require(factors.values.forall(_ >= 1), "factors must be >= 1")
    val rep = factors.foldLeft(lit(1)) { case (acc, (k, f)) =>
      when(col(keyCol) === k, f).otherwise(acc)
    }
    df.withColumn("epoch", explode(sequence(lit(1), rep)))
  }

  /** End-to-end dedup APPLY: near-dup pairs → full cluster closure
    * (ConnectedComponents star contraction) → drop every cluster member
    * except the minimum id → the filtered corpus. This is the step after
    * any pair-producing pass (MinHash, SimHash, semantic): unlike keeping
    * "rows absent from the pair list", it correctly keeps exactly ONE doc
    * per transitive cluster — a-b + b-c drops b AND c, never strands c
    * because it only paired with b. The drop list is one id per duplicate
    * (small vs the corpus) and anti-joins against it.
    */
  def applyDedup(corpus: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val comp = ConnectedComponents.components(pairs, aCol, bCol)
    val drop = comp.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Docs of `corpus` sharing at least `minShared` distinct n-gram shingles
    * with `benchmark` (benchmark-overlap decontamination). The benchmark's
    * distinct shingles broadcast; candidate pairs exist only where a
    * shingle co-occurs. Returns (idCol, n_shared).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 5, minShared: Long = 1L): DataFrame = {
    def sh(df: DataFrame): DataFrame = df.select(col(idCol),
      graft.functions.ShingleExpr.wordShingles(col(textCol), n).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // hint-free: benchmarks are usually tiny and AQE broadcasts them on its
    // own, but a forced broadcast() would OOM the build side if a caller
    // points this at a corpus-sized "benchmark" — same treatment as the
    // verified-MinHash semi-join.
    val bench = sh(benchmark).select(explode(col("__sh")).as("__g")).distinct()
    sh(corpus).select(col(idCol), explode(col("__sh")).as("__g"))
      .join(bench, "__g")
      .groupBy(idCol)
      .agg(countDistinct(col("__g")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Quality-ordered token-budget cut: keep documents in (scoreCol DESC,
    * idCol ASC) order while the running token total stays ≤ budget — "take
    * the best B tokens", the final selection step of a data-mixture build.
    *
    * The naive form is a global-ORDER-BY window — a single-partition
    * exchange that serializes the whole corpus through one task at scale.
    * Instead: range-repartition on the sort key (each partition owns a
    * contiguous score range), per-partition running sums via a window
    * PARTITIONED on spark_partition_id, and cross-partition offsets from a
    * #partitions-sized aggregate collected to the driver (bounded by
    * cluster width, not data; the broadcast join back is a rows=#partitions
    * frame). Two jobs plan the range exchange independently, but the
    * sampler is seeded per partition index, so both see identical bounds
    * over the same input.
    *
    * Adds `cum_tokens` (running total including the row itself).
    */
  def takeTokenBudget(df: DataFrame, scoreCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    val ordered = df
      .repartitionByRange(col(scoreCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
    val partSums = ordered.groupBy(col("__pid"))
      .agg(sum(col(tokenCol).cast("long")).as("__psum"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sortedPids = partSums.keys.toSeq.sorted
    val offsets = sortedPids.zip(
      sortedPids.scanLeft(0L)((acc, pid) => acc + partSums(pid)).init)
    val offsetDf = broadcast(
      spark.createDataFrame(offsets).toDF("__pid", "__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    ordered
      .withColumn("__within", sum(col(tokenCol).cast("long")).over(w))
      .join(offsetDf, "__pid")
      .withColumn("cum_tokens", col("__off") + col("__within"))
      .filter(col("cum_tokens") <= budget)
      .drop("__pid", "__off", "__within")
  }
}
