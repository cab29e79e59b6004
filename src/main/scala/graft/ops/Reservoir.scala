package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact-k per-stratum uniform sampling as a MERGEABLE bounded-heap
  * aggregation — the reservoir-style twin of Curation.stratifiedSample for
  * strata of unknown (and possibly enormous) size.
  *
  * Both produce the same sample: the k rows with the SMALLEST deterministic
  * hash key per stratum ("bottom-k by hash", the classic mergeable uniform
  * sample without replacement — any fixed hash of a unique id is a uniform
  * permutation, so its k smallest are a uniform k-subset, and bottom-k sets
  * merge associatively by keep-k-smallest). The difference is the plan:
  *
  *  - window variant (Curation.stratifiedSample): shuffles EVERY row to its
  *    stratum's partition, then rank-limits (Spark's WindowGroupLimit
  *    bounds the sort, but the full-row shuffle remains) — fine when the
  *    sample is a large fraction;
  *  - this variant: a typed Aggregator whose buffer is the k smallest
  *    (key, id) pairs, planned by Spark as partial-per-partition +
  *    final-merge (like sum) — each partition ships AT MOST k candidate
  *    pairs per stratum across the shuffle, never the rows. At 100 TB with
  *    k=1000 per language, the shuffle is KBs per partition instead of the
  *    corpus.
  *
  * Sampled rows are then fetched by a semi-join on id (broadcast when the
  * total sample is small). Determinism: md5 of the id string — stable
  * across runs, engines (DuckDB computes the identical key), and cluster
  * topology; OpsSpec asserts equality with the window variant.
  */
object Reservoir {

  /** One sampling candidate: the hash key and the row id it belongs to. */
  final case class Cand(key: String, id: Long)

  /** Keep-k-smallest two-pointer merge of sorted candidate lists (each
    * ≤ k), generic over the (key, id) extraction so the uniform (String
    * key) and weighted (Double key) aggregators share ONE tested merge.
    */
  private def mergeSorted[C, K](a: Seq[C], b: Seq[C], k: Int)
      (key: C => K, id: C => Long)(implicit ord: Ordering[K]): Seq[C] = {
    val out = new scala.collection.mutable.ArrayBuffer[C](k)
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length ||
        (i < a.length && (ord.lt(key(a(i)), key(b(j))) ||
          (ord.equiv(key(a(i)), key(b(j))) && id(a(i)) <= id(b(j)))))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  private[ops] def mergeK(a: Seq[Cand], b: Seq[Cand], k: Int): Seq[Cand] =
    mergeSorted(a, b, k)(_.key, _.id)

  /** Mergeable bottom-k aggregator: buffer = the k smallest candidates seen,
    * sorted ascending by (key, id). reduce is an O(k) insertion, merge an
    * O(k) two-pointer merge — both bounded regardless of stratum size.
    */
  final class BottomK(k: Int)(implicit enc: Encoder[Seq[Cand]])
      extends Aggregator[Cand, Seq[Cand], Seq[Cand]] {
    override def zero: Seq[Cand] = Vector.empty
    override def reduce(buf: Seq[Cand], c: Cand): Seq[Cand] = mergeK(buf, Seq(c), k)
    override def merge(a: Seq[Cand], b: Seq[Cand]): Seq[Cand] = mergeK(a, b, k)
    override def finish(r: Seq[Cand]): Seq[Cand] = r
    override def bufferEncoder: Encoder[Seq[Cand]] = enc
    override def outputEncoder: Encoder[Seq[Cand]] = enc
  }

  /** Exact-k uniform sample per stratum. Returns (stratumCol, idCol) rows —
    * join back on idCol for payload columns. `idCol` must be unique per row
    * (it seeds the hash key).
    */
  def sampleK(df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(stratumCol).cast("string").as("__s"),
        md5(col(idCol).cast("string")).as("key"), col(idCol).cast("long").as("id"))
      .as[(String, String, Long)]
      .map { case (s, key, id) => (s, Cand(key, id)) }
    keyed.groupByKey(_._1).mapValues(_._2)
      .agg(new BottomK(k).toColumn.name("cands"))
      .flatMap { case (s, cands) => cands.map(c => (s, c.id)) }
      .toDF(stratumCol, idCol)
  }

  /** Deterministic uniform in (0, 1) from an id: the md5's top 60 bits,
    * offset by 0.5 ulp-of-grid so 0 (and thus ln(0)) is unreachable.
    */
  private[ops] def hashUniform(id: Long): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) + 0.5) / (1L << 60).toDouble
  }

  /** One weighted candidate: Efraimidis–Spirakis priority + id. */
  final case class WCand(key: Double, id: Long)

  /** Bottom-k by double priority — same bounded mergeable shape as
    * [[BottomK]] (≤ k candidates cross the shuffle per stratum per
    * partition), ordered ascending by (key, id), sharing the tested merge.
    */
  final class BottomKW(k: Int)(implicit enc: Encoder[Seq[WCand]])
      extends Aggregator[WCand, Seq[WCand], Seq[WCand]] {
    private def mergeW(a: Seq[WCand], b: Seq[WCand]): Seq[WCand] =
      mergeSorted(a, b, k)(_.key, _.id)
    override def zero: Seq[WCand] = Vector.empty
    override def reduce(buf: Seq[WCand], c: WCand): Seq[WCand] = mergeW(buf, Seq(c))
    override def merge(a: Seq[WCand], b: Seq[WCand]): Seq[WCand] = mergeW(a, b)
    override def finish(r: Seq[WCand]): Seq[WCand] = r
    override def bufferEncoder: Encoder[Seq[WCand]] = enc
    override def outputEncoder: Encoder[Seq[WCand]] = enc
  }

  /** Exact-k WEIGHTED sample without replacement per stratum
    * (Efraimidis–Spirakis A-ES, mergeable form): each row draws a
    * deterministic uniform u from its id and gets priority -ln(u)/w; the k
    * SMALLEST priorities are the sample, and P(selected) scales with
    * weight exactly as weighted sampling without replacement demands.
    * Bottom-k sets merge associatively, so the plan is the same
    * partial+final bounded-heap aggregation as [[sampleK]]. Rows with
    * null/non-positive weight are excluded (a zero weight must never be
    * drawn; A-ES priorities are undefined there).
    */
  def weightedSampleK(df: DataFrame, stratumCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // the priority is computed COLUMNAR (codegen'd md5/conv/log built-ins
    // mirroring hashUniform exactly — asserted in OpsSpec), not per row in
    // the lambda: a JCA MessageDigest lookup per row would dominate the
    // scan at corpus scale
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + lit(0.5)) / lit((1L << 60).toDouble)
    val keyed = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0.0)
      .select(col(stratumCol).cast("string").as("__s"),
        col(idCol).cast("long").as("id"),
        (-log(u) / col(weightCol).cast("double")).as("p"))
      .as[(String, Long, Double)]
      .map { case (s, id, p) => (s, WCand(p, id)) }
    keyed.groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKW(k).toColumn.name("cands"))
      .flatMap { case (s, cands) => cands.map(c => (s, c.id)) }
      .toDF(stratumCol, idCol)
  }
}
