package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the manual tool for the case AQE's
  * skew-join split cannot reach (a single hot key whose rows exceed one
  * executor's memory in a shuffled join, e.g. the empty-string / "unknown"
  * key joining a dimension too large to broadcast).
  *
  * `saltedJoin` spreads each fact key over `salt` sub-keys and replicates
  * the dimension row once per sub-key, so the hot key's rows land on `salt`
  * reducers instead of one. The join RESULT is identical to the plain join
  * by construction — every fact row still meets exactly its key's dimension
  * row (replication covers all sub-keys) — so the salt assignment itself
  * needs no determinism, only uniformity. Cost: the dim side shuffles
  * `salt ×` its size; use it when dim ≪ fact (else bucket both sides,
  * Partitioning.saveBucketed).
  */
object Skew {

  /** Inner-join `fact` to `dim` on `key` with the fact side salted into
    * `salt` sub-keys. `dim(key)` must be unique (a dimension); result
    * columns = fact columns ++ dim's non-key columns, like a plain
    * `fact.join(dim, key)`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, s"salt must exceed 1, got $salt")
    // route each fact row to a pseudo-random sub-key; uniformity is all
    // that matters (see scaladoc), monotonically_increasing_id is the
    // cheapest per-row distinct value
    val f = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    // replicate every dim row across all sub-keys
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
