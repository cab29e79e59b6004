package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the verified query inventory.
  *
  * Determinism conventions (the driver hash-compares our parquet output
  * against DuckDB running `oracleSql` on the same tables):
  *  - every query ends in an explicit total ORDER BY in both engines;
  *  - floating-point SUMs go through DECIMAL(18,6) so the result is exact and
  *    independent of partial-aggregation order (a plain double sum differs
  *    between Spark's shuffle tree and DuckDB's sequential scan in the last
  *    ulps), then cast to double and round to 4 places;
  *  - timestamps are emitted as epoch numbers, never as raw timestamp columns
  *    (naive-vs-UTC rendering differs across engines);
  *  - no rand()/sampling in verified queries.
  */
object Q {
  /** The driver's `events` table has shipped `ts` in two parquet encodings
    * across testdata generations: TIMESTAMP(NANOS) — which Spark's reader
    * rejects unless this legacy conf maps it to an epoch-nanos LongType —
    * and plain micros TIMESTAMP. The conf handles the former; t() below
    * normalizes the latter to the same epoch-nanos long contract, so event
    * queries always do integer time arithmetic (double division would lose
    * precision above 2^53 and epoch-nanos is ~1.7e18).
    */
  def ensureNanosReadable(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosReadable(s)
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampType ||
          f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        // micros → the epoch-nanos long contract (exact integer ×1000);
        // the UTC session timezone makes the NTZ→TIMESTAMP cast
        // shift-free, matching DuckDB's naive-as-UTC epoch()/epoch_ms()
        df.withColumn("ts", expr("unix_micros(cast(ts AS TIMESTAMP)) * 1000L"))
      case _ => df
    }
  }

  /** One Database per (session, dir) for the query inventory: open() lists
    * the directory and reads every table's parquet footer, so re-opening per
    * query charged ~0.5 s of pure catalog setup to each Database-routed
    * bench entry. The handle holds only lazy plans — nothing to unpersist.
    */
  private val dbCache =
    scala.collection.concurrent.TrieMap.empty[String, graft.api.Database]
  def db(s: SparkSession, dir: String): graft.api.Database =
    dbCache.getOrElseUpdate(s"${System.identityHashCode(s)}|$dir",
      graft.api.Database.open(s, dir))

  /** Exact integer cents of a 2-decimal money column stored as double:
    * the stored double is within ulps of cents/100, so x*100 rounds to the
    * exact integer identically in both engines (never a .5 tie). Money
    * sums then run on longs/decimal-from-long — no per-row double→decimal
    * cast, which goes through BigDecimal string formatting and measured
    * ~3× slower on scan-bound aggregates (BENCH.md round 9).
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Order-independent exact sum of a double column, rounded to 4 places. */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 6))).cast("double"), 4)

  /** Exact mean = decimal sum / non-null count, rounded to 4 places. */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(18, 6))).cast("double") /
      count(c).cast("double"), 4)

  /** DuckDB-side equivalents of dsum/davg for oracle SQL strings. */
  def sqlDsum(x: String): String =
    s"round(cast(sum(cast($x AS DECIMAL(18,6))) AS DOUBLE), 4)"
  def sqlDavg(x: String): String =
    s"round(cast(sum(cast($x AS DECIMAL(18,6))) AS DOUBLE) / count($x), 4)"
}
