package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate statistics for 100 TB-scale profiling, where the exact
  * operators (countDistinct, exact median) are correct but shuffle-bound:
  *
  *  - [[approxDistinct]]: HyperLogLog++ — one pass, fixed ~1.5 KB sketch per
  *    group, mergeable map-side; exact countDistinct shuffles every distinct
  *    value.
  *  - [[approxQuantiles]]: Greenwald-Khanna sketches — one pass, bounded
  *    error, no global sort; exact percentile sorts the column.
  *  - [[profile]]: one-scan per-column profile (the `describe` for tables
  *    where a second pass is too expensive): count/nulls/min/max + HLL
  *    distinct for every column in a single aggregation.
  */
object StatsOps {

  def approxDistinct(df: DataFrame, cols: Seq[String], rsd: Double = 0.01): DataFrame =
    df.agg(
      approx_count_distinct(col(cols.head), rsd).as(s"${cols.head}_distinct"),
      cols.tail.map(c => approx_count_distinct(col(c), rsd).as(s"${c}_distinct")): _*)

  def approxQuantiles(df: DataFrame, column: String,
      probabilities: Seq[Double], relErr: Double = 0.001): Seq[Double] =
    df.stat.approxQuantile(column, probabilities.toArray, relErr).toSeq

  /** One-pass profile of every column: rows, nulls, min, max, approx
    * distinct. Output: one row per column.
    */
  def profile(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = df.columns.toSeq.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dst_$c"))
    }
    val total = count(lit(1)).as("__total")
    val row = df.agg(total, aggs: _*).head()
    val n = row.getLong(row.fieldIndex("__total"))
    df.columns.toSeq.map { c =>
      (c, n,
        n - row.getLong(row.fieldIndex(s"__cnt_$c")),
        Option(row.getString(row.fieldIndex(s"__min_$c"))).orNull,
        Option(row.getString(row.fieldIndex(s"__max_$c"))).orNull,
        row.getLong(row.fieldIndex(s"__dst_$c")))
    }.toDF("column", "rows", "nulls", "min", "max", "approx_distinct")
  }
}
