package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning strategies for shuffle elimination and skew resistance —
  * the knobs that matter most at 100 TB.
  *
  *  - [[saveBucketed]] / co-located joins: write both join sides bucketed by
  *    the join key into the session catalog; subsequent equi-joins on that
  *    key run WITHOUT an Exchange on either side (asserted in
  *    PartitioningSpec). On a real cluster this is the difference between a
  *    full-network shuffle of the fact table per join and a local merge.
  *  - [[saltedJoin]]: pre-AQE-style manual skew handling. A hot key floods
  *    one reduce partition; salting splits each big-side key into
  *    `saltFactor` subkeys and replicates the small side per salt, so the
  *    hot key spreads across `saltFactor` tasks. AQE's skew-join handles
  *    sort-merge cases adaptively; explicit salting still wins for
  *    extreme single-key skew and for broadcast-ineligible aggregations.
  */
object Partitioning {

  /** Write `df` as a bucketed+sorted catalog table (parquet). Joins between
    * tables bucketed on the same key with the same bucket count are
    * exchange-free.
    */
  def saveBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Equi-join two big DataFrames on `key` with the large side's hot keys
    * spread over `saltFactor` partitions: left gets a random salt in
    * [0, saltFactor); right is replicated once per salt value. Result equals
    * a plain inner join (asserted in PartitioningSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Range-partition + sort within partitions by `cols` — the layout for
    * downstream merge scans and min/max file skipping (write this layout
    * with `df.write.parquet` and parquet row-group stats prune on `cols`).
    */
  def sortedLayout(df: DataFrame, cols: Seq[String], partitions: Int): DataFrame =
    df.repartitionByRange(partitions, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
}
