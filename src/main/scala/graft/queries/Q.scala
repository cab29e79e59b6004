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
  /** The driver's `events` table stores TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects by default; this legacy conf reads nanos as a
    * LongType epoch-nanos column instead (event queries do integer
    * arithmetic on it — never double division, which loses precision above
    * 2^53).
    */
  def ensureNanosReadable(s: SparkSession): Unit =
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosReadable(s)
    s.read.parquet(s"$dir/$name.parquet")
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
