package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over string keys: find every record
  * pair whose names are within edit distance k, close the pairs into
  * entities, and elect a canonical survivor per entity — the structured-
  * record sibling of content dedup (Dedup/Similarity handle documents and
  * vectors; this handles names/addresses/titles where "same entity" means
  * small edit distance, not shared shingles).
  *
  * Candidate generation is PassJoin segment blocking (Li, Deng & Feng,
  * "PASS-JOIN: a partition-based method for similarity joins", PVLDB
  * 5(3), 2011): each record's name is partitioned into k+1 contiguous
  * segments; by pigeonhole, any string within edit distance k of it must
  * contain at least one of those segments EXACTLY, and because ≤ k
  * insertions/deletions shift alignment by at most k positions, that
  * witness occurrence starts within ±k of the segment's own position. So
  * the index holds (length, segment#, start, content) — one row per
  * segment — and the probe side enumerates, for each indexed length
  * within ±k of its own, each segment's substring window shifted by
  * δ ∈ [−k, k]: a constant (2k+1)·(k+1)·(2k+1) probes per record. The
  * candidate join is a pure EQUI-join on (length, segment#, start,
  * content); candidates are then verified with one codegen'd
  * levenshtein.
  *
  * Why not q-gram prefix filtering (Ed-Join): on vocabulary-dense corpora
  * (names drawn from a small token set) every q-gram is common, posting
  * lists grow ∝ corpus, and Σdf² makes the candidate join quadratic —
  * measured 27× more candidates than PassJoin on the documents-derived
  * fixture at sf0.1 (6.96M vs 257k). Segments are ~|name|/(k+1) chars
  * long, so their selectivity tracks the corpus' real duplicate density
  * instead of its alphabet.
  *
  * Records shorter than 2·(k+1) chars can't form ≥2-char segments (their
  * 1-char segments would post under single letters); they take a
  * broadcast residual path, verified against every length-compatible
  * record. At 100 TB that set is a handful of near-empty strings; the
  * guarantee stays exact without an all-pairs join.
  *
  * Scale shape: one explode to index segments (k+1 rows/record), one
  * explode to build probes (constant rows/record), one equi-join, then
  * levenshtein only on surviving distinct candidates. Nothing is
  * all-pairs; nothing collects to the driver. Correctness of the
  * blocking is proven empirically too: q_entity_pairs' DuckDB oracle is
  * brute-force all-pairs, and EntitySpec re-checks random corpora
  * against a local brute force.
  */
object Entity {

  /** Record pairs within edit distance ≤ k, exactly: (a, b, dist) with
    * a < b, one row per unordered pair. `records` needs an integral id
    * column and a string name column; null names are ignored.
    */
  def editPairs(records: DataFrame, idCol: String, nameCol: String,
      k: Int = 2, inputBytes: Long = -1L): DataFrame = {
    require(k >= 0, s"editPairs: distance threshold k must be >= 0, got $k")
    val nSeg = k + 1
    val minLen = 2 * nSeg // below this, 1-char segments would post under letters
    // SMALL inputs: spread the record rows across the session's full width
    // before the per-row-heavy segment/probe explodes and the levenshtein
    // verify (the Dedup.scala convention): a records frame built as a
    // union of single-file scans arrives as a handful of partitions, the
    // index side broadcasts, and so the WHOLE pipeline — explodes,
    // substring windows, banded-DP verify — runs at the input's partition
    // count no matter how many cores the session has (measured 3 tasks
    // carrying 15 s of task time at sf0.1). LARGE inputs already split
    // wide at the scan and the extra exchange is a pure full pass of the
    // name rows — measured at 100× the unconditional spread ADDED ~115 MB
    // of shuffle and lost ~25% wall — so the spread fires only below a
    // size threshold (`spark.graft.entity.spreadMaxBytes`, default
    // 256 MB), exactly the regime where the exchange is cheap and the
    // under-parallelism is the bottleneck. Size signal: caller-supplied
    // `inputBytes` (the source table's real file bytes — plan stats can't
    // serve here, Spark's default string-column estimate is 20 B/row so a
    // TB text table "estimates" small); unknown (-1) means NO spread —
    // the spread only fires on an affirmative small signal (r15 advice:
    // the old plan-stats fallback was biased toward spreading on exactly
    // the underestimated large unions where the spread was measured to
    // ADD ~115 MB shuffle and ~25% wall at 100×). Callers that want the
    // small-input parallelism must pass the real source bytes, as the
    // three entity gates do.
    val spreadMax = records.sparkSession.conf
      .get("spark.graft.entity.spreadMaxBytes", (256L << 20).toString).toLong
    val small = inputBytes >= 0L && inputBytes <= spreadMax
    val recs0 = records
      .select(col(idCol).as("__id"), col(nameCol).as("__nm"))
      .filter(col("__nm").isNotNull)
    val recs = (if (small)
        recs0.repartition(records.sparkSession.sparkContext.defaultParallelism,
          col("__id"))
      else recs0)
      .withColumn("__len", length(col("__nm")))
    val long = recs.filter(col("__len") >= minLen)
    val short = recs.filter(col("__len") < minLen)

    // balanced partition of a length-L name: the first (k+1) − L%(k+1)
    // segments get ⌊L/(k+1)⌋ chars, the rest one more; start positions
    // follow by prefix sums. Pure integer Column arithmetic, codegen'd.
    def segLen(lCol: String, j: String) =
      when(col(j) <= lit(nSeg) - pmod(col(lCol), lit(nSeg)),
        col(lCol) / nSeg cast "int").otherwise((col(lCol) / nSeg cast "int") + 1)
    def segStart(lCol: String, j: String) =
      lit(1) + (col(j) - 1) * (col(lCol) / nSeg).cast("int") +
        greatest(lit(0), col(j) - 1 - (lit(nSeg) - pmod(col(lCol), lit(nSeg))))

    // a segment's identity is (indexed length, segment#): its own start
    // and length follow from those, so the join key is (__len, __j, __c)
    val segIdx = long
      .withColumn("__j", explode(sequence(lit(1), lit(nSeg))))
      .withColumn("__lj", segLen("__len", "__j"))
      .withColumn("__pj", segStart("__len", "__j"))
      .select(col("__id"), col("__nm"), col("__len"), col("__j"),
        expr("substring(__nm, __pj, __lj)").as("__c"))

    // probe rows: for each plausible indexed length (±k), each segment,
    // each alignment shift δ ∈ [−k, k] — a constant multiplier per
    // record. The substring is read at the SHIFTED window (that's where
    // an untouched segment lands after ≤k ins/del), but it probes the
    // segment's own (length, j) key.
    val probes = long
      .withColumn("__L", explode(sequence(col("__len") - k, col("__len") + k)))
      .filter(col("__L") >= minLen)
      .withColumn("__j", explode(sequence(lit(1), lit(nSeg))))
      .withColumn("__lj", segLen("__L", "__j"))
      .withColumn("__pj0", segStart("__L", "__j"))
      .withColumn("__d", explode(sequence(lit(-k), lit(k))))
      .withColumn("__pp", col("__pj0") + col("__d"))
      .filter(col("__pp") >= 1 && col("__pp") + col("__lj") - 1 <= col("__len"))
      .select(col("__id"), col("__nm"), col("__L").as("__len"), col("__j"),
        expr("substring(__nm, __pp, __lj)").as("__c"))

    def orient(x: String, y: String) = Seq(
      least(col(s"$x.__id"), col(s"$y.__id")).as("a"),
      greatest(col(s"$x.__id"), col(s"$y.__id")).as("b"),
      when(col(s"$x.__id") < col(s"$y.__id"), col(s"$x.__nm"))
        .otherwise(col(s"$y.__nm")).as("__na"),
      when(col(s"$x.__id") < col(s"$y.__id"), col(s"$y.__nm"))
        .otherwise(col(s"$x.__nm")).as("__nb"))

    val mainCand = segIdx.alias("x")
      .join(probes.alias("y"), Seq("__len", "__j", "__c"))
      .filter(col("x.__id") =!= col("y.__id"))
      .select(orient("x", "y"): _*)

    // near-empty names: outside the segment scheme; broadcast the (tiny)
    // set and verify against every length-compatible record
    val shortCand = broadcast(short.alias("x")).join(recs.alias("y"),
        col("x.__id") =!= col("y.__id") &&
          abs(col("x.__len") - col("y.__len")) <= k)
      .select(orient("x", "y"): _*)

    // verify BEFORE deduplicating: a candidate pair reappears once per
    // matching (segment, shift) — a small constant — while deduplicating
    // first would shuffle every candidate. Verifying inline makes the
    // only large exchange proportional to the TRUE pair count, and the
    // thresholded levenshtein (banded DP, returns -1 above k) costs
    // O(k·|name|) per check instead of O(|name|²).
    mainCand.union(shortCand)
      .withColumn("dist", levenshtein(col("__na"), col("__nb"), k))
      .filter(col("dist") >= 0)
      .select(col("a"), col("b"), col("dist"))
      .distinct()
  }

  /** Entity assignment: every record mapped to its entity id (the minimum
    * record id of its edit-distance-≤k connected component; singletons map
    * to themselves). Output: (idCol, nameCol, entity_id).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      k: Int = 2, inputBytes: Long = -1L): DataFrame = {
    val pairs = editPairs(records, idCol, nameCol, k, inputBytes)
    val comp = ConnectedComponents.components(pairs, "a", "b")
    records.select(col(idCol), col(nameCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("component"), col(idCol)))
      .select(col(idCol), col(nameCol), col("entity_id"))
  }

  /** Survivorship: one master row per entity — the canonical name is the
    * LONGEST member name (most complete record), ties broken by the
    * lexicographically smallest, plus the member count. Two grouped
    * aggregations, both keyed on entity_id; no window, no collect.
    */
  def canonicalize(resolved: DataFrame, nameCol: String): DataFrame = {
    val stats = resolved.groupBy("entity_id").agg(
      count(lit(1)).as("n_members"), max(length(col(nameCol))).as("__mx"))
    resolved.join(stats, "entity_id")
      .filter(length(col(nameCol)) === col("__mx"))
      .groupBy(col("entity_id"), col("n_members"))
      .agg(min(col(nameCol)).as("canonical_name"))
      .select(col("entity_id"), col("canonical_name"), col("n_members"))
  }
}
