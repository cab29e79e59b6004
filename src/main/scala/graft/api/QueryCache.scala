package graft.api

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.SizeEstimator

/** Driver-side memo for scalar/small aggregate results, mirroring the
  * reference's size-capped result cache (reference: pandasdb/cache.py:11-92;
  * defaults 2 MB per item / 100 MB total, connection.py:23-24).
  *
  * The reference keys on the generated SQL string; the Spark-native
  * equivalent is the *canonicalized analyzed plan*, so two differently-written
  * but semantically identical queries share an entry
  * (SURVEY.md §7.4 "cache keying").
  *
  * Scale note: this memoizes only final, already-collected scalar results on
  * the driver — it never holds distributed data, so its footprint is bounded
  * by `maxTotalMb` regardless of input size (the reference's headline claim:
  * a handle stays O(KB) on an 18M-row table, README.md:63-89).
  */
final class QueryCache(
    val enabled: Boolean = true,
    val maxItemMb: Double = 2.0,
    val maxTotalMb: Double = 100.0) {

  private val store = new ConcurrentHashMap[String, Any]()
  // running byte total of stored (key, value) pairs — sized once at insert,
  // not re-estimated by walking the whole store per insert (that walk made
  // aggregate insertion cost O(n²))
  private val storedBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Canonical cache key for a DataFrame's logical plan. */
  def keyOf(df: DataFrame): String =
    df.queryExecution.analyzed.canonicalized.toString

  private def mbOf(v: Any): Double = SizeEstimator.estimate(v.asInstanceOf[AnyRef]) / 1e6

  def currentSizeMb: Double = storedBytes.get() / 1e6

  def size: Int = store.size()
  def contains(key: String): Boolean = store.containsKey(key)
  def clear(): Unit = { store.clear(); storedBytes.set(0L) }

  /** Memoize `compute` under `key`; store only if it fits the caps
    * (reference: cache.py:87-91).
    */
  def getOrElseUpdate[T](key: String)(compute: => T): T = {
    if (!enabled) return compute
    val hit = store.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val v: T = compute
    if (v != null) {
      val itemMb = mbOf(key) + mbOf(v)
      if (itemMb <= maxItemMb && currentSizeMb + itemMb <= maxTotalMb &&
          store.putIfAbsent(key, v) == null)
        storedBytes.addAndGet((itemMb * 1e6).toLong)
    }
    v
  }

  /** Memoize an aggregate computed from `df`, keyed on its canonical plan. */
  def memo[T](df: DataFrame)(compute: => T): T = getOrElseUpdate(keyOf(df))(compute)

  // ---- cross-session durability ----------------------------------------
  // The reference's cache dies with the connection (cache.py:39-92); Spark
  // makes a durable upgrade natural: spill the driver-side memo to one tiny
  // parquet of (plan-key, java-serialized value) rows and reload it on the
  // next Database.open. Canonicalized plan strings normalize expression ids,
  // so the same query over the same source paths re-derives the same key in
  // a fresh session (asserted in Api2Spec). Values are small driver scalars
  // (Long/Double/Row/Map) bounded by maxItemMb — the file stays O(MB).

  private def serialize(v: Any): Option[Array[Byte]] =
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(v)
      oos.close()
      Some(bos.toByteArray)
    } catch { case _: java.io.NotSerializableException => None }

  /** Spill the memo to `dir` (overwrites). Non-serializable values are
    * skipped — they just recompute next session.
    */
  def saveTo(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import spark.implicits._
    val rows = store.asScala.toSeq.flatMap { case (k, v) =>
      serialize(v).map(b => (k, b))
    }
    // driver-sized by the caps (<= maxTotalMb): one file, no shuffle
    rows.toDF("key", "value").coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Reload a [[saveTo]] spill, re-applying the size caps (a spill written
    * under looser caps cannot overfill a tighter cache). Missing/unreadable
    * dirs are a no-op — a cold start, not an error. Returns entries loaded.
    */
  def loadFrom(spark: org.apache.spark.sql.SparkSession, dir: String): Int = {
    if (!enabled) return 0
    val rows =
      try spark.read.parquet(dir).collect()
      catch { case _: Throwable => return 0 }
    var n = 0
    rows.foreach { r =>
      val key = r.getString(0)
      val v =
        try {
          val ois = new java.io.ObjectInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val x = ois.readObject()
          ois.close()
          x
        } catch { case _: Throwable => null }
      if (v != null) {
        val itemMb = mbOf(key) + mbOf(v)
        if (itemMb <= maxItemMb && currentSizeMb + itemMb <= maxTotalMb &&
            store.putIfAbsent(key, v) == null) {
          storedBytes.addAndGet((itemMb * 1e6).toLong)
          n += 1
        }
      }
    }
    n
  }
}
