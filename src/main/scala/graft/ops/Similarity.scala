package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.vecDot

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), the similarity-search layer of the pipeline.
  *
  * Two paths:
  *  - [[bruteTopK]]: exact — broadcast the (small) query set, one fused-loop
  *    dot per (query, candidate), per-query top-k via TakeOrdered-style
  *    window. One scan of the corpus; the right baseline and the recall
  *    oracle for the approximate path.
  *  - [[lshTopK]]: random-hyperplane LSH — L independent hash tables, each
  *    hashing a vector to a b-bit signature of dot-product signs; candidates
  *    are vectors sharing a (table, signature) bucket with the query, then
  *    exact re-rank inside buckets. At 100 TB the bucket join replaces the
  *    O(n·q) cross product with an equi-join whose fan-out is controlled by
  *    b (bucket size ~ n/2^b); increase L for recall, b for speed.
  */
object Similarity {

  private def cosine(v: Column, q: Column, nv: Column, nq: Column): Column =
    vecDot(v, q) / (nv * nq)

  private def withNorm(df: DataFrame, vec: String, out: String): DataFrame =
    df.withColumn(out, sqrt(vecDot(col(vec), col(vec))))

  /** Exact cosine top-k for each query vector.
    * @param corpus  (idCol, vecCol) table
    * @param queries (qidCol, vecCol) table — small, broadcast
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, vecCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, vecCol, "__nc").select(col(idCol), col(vecCol).as("__cv"), col("__nc"))
    val q = withNorm(queries, vecCol, "__nq").select(col(qidCol), col(vecCol).as("__qv"), col("__nq"))
    val scored = c.crossJoin(broadcast(q))
      .select(col(qidCol), col(idCol),
        cosine(col("__cv"), col("__qv"), col("__nc"), col("__nq")).as("cos"))
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy(qidCol).orderBy(desc("cos"), asc(idCol))))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Deterministic random hyperplanes: L tables × b planes × dim, seeded. */
  private[graft] def hyperplanes(seed: Long, tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** (id, vec, norm, table, bucket) index rows for a vector table — one
    * pass: norm and ALL table signatures in the same projection via the
    * fused LshSignatures expression (one tiny expression instead of
    * tables×bits DotProducts whose literal planes bloat every downstream
    * stage's analysis + codegen), then posexplode to (table, sig) rows.
    */
  private def buckets(df: DataFrame, idCol: String, vecCol: String,
      normName: String, planes: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol), col(vecCol),
        sqrt(vecDot(col(vecCol), col(vecCol))).as(normName),
        posexplode(graft.functions.VectorExprs.lshSignatures(col(vecCol), planes)))
      .withColumnRenamed("pos", "__t")
      .withColumnRenamed("col", "__sig")

  /** LSH-bucketed approximate cosine top-k: candidates share a
    * (table, signature) bucket with the query; exact re-rank on candidates.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, vecCol: String, k: Int,
      tables: Int = 8, bits: Int = 10, seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    // Hyperplanes must span the FULL vector dimension: a shorter plane would
    // silently hash only the vector's first components (DotProduct raises on
    // mismatch, but derive-from-data avoids ever building a wrong plane).
    val d = if (dim > 0) dim else vectorDim(corpus, vecCol)
    val planes = hyperplanes(seed, tables, bits, d)
    val cb = buckets(corpus, idCol, vecCol, "__nc", planes)
    val qb = buckets(queries, qidCol, vecCol, "__nq", planes)
      .withColumnRenamed(vecCol, "__qv")
    val cand = cb.join(broadcast(qb),
        cb("__t") === qb("__t") && cb("__sig") === qb("__sig"))
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol), col("__qv"), col("__nc"), col("__nq")).as("cos"))
      .distinct()
    cand
      .withColumn("__rk", row_number().over(
        Window.partitionBy(qidCol).orderBy(desc("cos"), asc(idCol))))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** IVF (inverted-file) approximate top-k: k-means over L2-normalized
    * vectors partitions the corpus into `nCells` cells; each query probes
    * its `nProbe` nearest cells and re-ranks exactly inside them.
    *
    * The 100 TB layout: write the corpus bucketed by cell id
    * (Partitioning.saveBucketed) so a query touches only its probed
    * buckets' files. With nProbe == nCells this is exhaustive and equals
    * bruteTopK exactly (asserted in OpsSpec).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      qidCol: String, vecCol: String, k: Int,
      nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame =
    ivfTopK(ivfIndex(corpus, idCol, vecCol, nCells, seed), queries,
      idCol, qidCol, vecCol, k, nProbe)

  /** A built IVF index: per-vector cell assignments + the centroid table.
    * Build ONCE (k-means training scans the corpus repeatedly), then serve
    * any number of query batches against it; `assigned` is the thing to
    * persist in memory for a session or write out bucketed by `__cell`
    * (Partitioning.saveBucketed) so probes touch only their cells' files.
    */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Training points per centroid for the sampled k-means fit: the full
    * corpus is only scanned ONCE (assignment); the iterated clustering runs
    * on a bounded sample of ~`TrainPointsPerCell x nCells` vectors. Without
    * the sample, training cost is iterations x n x nCells — with the
    * production sizing nCells ∝ n that is O(n²) per iteration, the term
    * the 100x ScaleBench point caught. 128/centroid sits inside the
    * 30–256/centroid band FAISS documents as sufficient for quantizer
    * training (faiss/Clustering.cpp max_points_per_centroid).
    */
  private val TrainPointsPerCell = 128L

  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val unit = normalized(corpus, vecCol)
    // nCells == 1 is the exhaustive degenerate (Spark ML KMeans requires
    // k > 1): everything in cell 0, centroid unused by a 1-cell probe
    if (nCells == 1) {
      val assigned = unit.select(col(idCol), col(vecCol),
        col("__vnorm").as("__nc"), lit(0).as("__cell"))
      val spark = corpus.sparkSession
      import spark.implicits._
      val d = vectorDim(corpus, vecCol)
      val centroids = Seq((0, Array.fill(d)(0.0))).toDF("__cell", "__centroid")
      return IvfIndex(assigned, centroids)
    }
    val feats = unit.withColumn("__f", array_to_vector(col("__unit")))
    // Sampled quantizer training (seeded Bernoulli, 1.2x headroom so the
    // realized sample stays comfortably >= the target even at small n);
    // corpora at or under the cap train on every vector, so bench-scale
    // results — and the captured-centroid oracles — are byte-identical.
    val trainCap = TrainPointsPerCell * nCells
    val n = feats.count()
    val train =
      if (n <= trainCap) feats
      else feats.sample(withReplacement = false,
        math.min(1.0, trainCap * 1.2 / n), seed)
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__f").setPredictionCol("__cell")
      .fit(train.select("__f"))
    val assigned = model.transform(feats)
      .select(col(idCol), col(vecCol), col("__vnorm").as("__nc"), col("__cell"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }.toDF("__cell", "__centroid")
    IvfIndex(assigned, centroids)
  }

  /** Persist a built [[IvfIndex]]: assignments partitioned by cell id (a
    * probe reads ONLY its probed cells' directories — parquet partition
    * pruning does the file skipping), centroids as one tiny table. This is
    * the serve-later half of "train k-means once": any number of later
    * sessions [[loadIvfIndex]] and probe without rescanning or retraining.
    */
  def saveIvfIndex(index: IvfIndex, dir: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("__cell").parquet(s"$dir/assigned")
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Load an [[IvfIndex]] written by [[saveIvfIndex]]; probes against it
    * are partition-pruned to the probed cells.
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$dir/assigned"),
      spark.read.parquet(s"$dir/centroids"))

  /** (qidCol, __qv, __nq, __cell) — each query row exploded to its `nProbe`
    * nearest cells. The centroid table is collected driver-side (it is
    * driver-sized by construction: nCells x dim, the same bound the
    * broadcast in earlier rounds assumed) and embedded as an array literal,
    * so cell selection is per-row array arithmetic: distance to every
    * centroid via the native dot product, `array_sort` on (dist, cell)
    * structs — field order IS the sort order, ties to the lowest cell id —
    * then `slice`. No window, no shuffle, no join: the same plan fragment
    * runs on a batch OR STREAMING query frame (streams support neither
    * `row_number` windows nor the crossJoin+rank shape this replaces).
    */
  private def probedCells(index: IvfIndex, queries: DataFrame, qidCol: String,
      vecCol: String, nProbe: Int): DataFrame = {
    val cents: Seq[(Int, Seq[Double])] = index.centroids
      .select(col("__cell"), col("__centroid")).collect().toSeq
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
    val centLit = typedLit(cents) // array<struct<_1: cell, _2: centroid>>
    normalized(queries, vecCol)
      .withColumn("__pc", explode(slice(array_sort(
        transform(centLit, c => struct(
          (-vecDot(col("__unit"), c("_2"))).as("d"), c("_1").as("cell")))),
        1, nProbe)))
      .select(col(qidCol), col(vecCol).as("__qv"),
        col("__vnorm").as("__nq"), col("__pc.cell").as("__cell"))
  }

  /** Probe a prebuilt [[IvfIndex]]: nProbe nearest cells per query, exact
    * cosine re-rank inside the probed cells.
    */
  def ivfTopK(index: IvfIndex, queries: DataFrame, idCol: String,
      qidCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val probed = probedCells(index, queries, qidCol, vecCol, nProbe)
    index.assigned.join(probed, "__cell")
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol), col("__qv"), col("__nc"), col("__nq")).as("cos"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(qidCol).orderBy(desc("cos"), asc(idCol))))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** [[ivfTopK]] for a STREAMING query frame: same probed-cell selection
    * (per-row array ops — see [[probedCells]]), a stream-static inner join
    * against the prebuilt index, and a streaming-legal top-k — windows are
    * unavailable on streams, so the per-query rank becomes
    * `collect_list(struct(-cos, id))` + `array_sort` + `slice`, whose
    * (-cos asc, id asc) struct order reproduces the batch tie-break
    * (cos desc, id asc) exactly. Per-query state is bounded by the probed
    * cells' contents per trigger; run with Update/Complete output (or add a
    * watermark upstream on the query stream for Append). Emits the batch
    * contract: (qidCol, idCol, cos).
    */
  def ivfTopKStream(index: IvfIndex, queries: DataFrame, idCol: String,
      qidCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val probed = probedCells(index, queries, qidCol, vecCol, nProbe)
    index.assigned.join(probed, "__cell")
      .select(col(qidCol), col(idCol),
        cosine(col(vecCol), col("__qv"), col("__nc"), col("__nq")).as("cos"))
      .groupBy(qidCol)
      .agg(slice(array_sort(collect_list(
        struct((-col("cos")).as("nc"), col(idCol).as("id")))), 1, k).as("__top"))
      .select(col(qidCol), explode(col("__top")).as("__t"))
      .select(col(qidCol), col("__t.id").as(idCol), (-col("__t.nc")).as("cos"))
  }

  /** SemDeDup proper (Abbas et al. 2023): k-means cells bound the pair
    * search — candidate pairs exist only WITHIN a cell, so the pair stage
    * is Σ_cells |cell|² instead of n², tunable by nCells. Same star
    * grouping and output contract as [[semanticDedup]] (the LSH-bucketed
    * variant); near-dups straddling a cell boundary are missed, which is
    * the algorithm's documented recall trade — raise nCells for speed,
    * lower for recall, or run the LSH variant when boundary pairs matter.
    * With nCells = 1 the cell stage is exhaustive and the result equals
    * exact all-pairs star grouping (the q_semdedup_cells oracle).
    *
    * 100 TB: `index.assigned` written bucketed by `__cell`
    * (Partitioning.saveBucketed) makes the self-join shuffle-free.
    */
  def semanticDedupByCell(index: IvfIndex, idCol: String,
      threshold: Double): DataFrame = {
    val a = index.assigned.select(col("__cell"), col(idCol).as("__a"),
      col(vecColName(index)).as("__va"), col("__nc").as("__na"))
    val b = index.assigned.select(col("__cell"), col(idCol).as("__b"),
      col(vecColName(index)).as("__vb"), col("__nc").as("__nb"))
    val pairs = a.join(b, "__cell")
      .filter(col("__a") < col("__b"))
      .select(col("__a"), col("__b"),
        cosine(col("__va"), col("__vb"), col("__na"), col("__nb")).as("__cos"))
      .filter(col("__cos") >= threshold)
    // the grouped side renames its key BEFORE the self-join: rep("__b") and
    // pairs("__b") share attribute lineage, and joining them directly leans
    // on plan-id disambiguation (and logs a trivially-true-predicate warning)
    val rep = pairs.groupBy(col("__b").as("__rb")).agg(min(col("__a")).as("rep_id"))
    rep.join(pairs, col("__rb") === col("__b") && col("rep_id") === col("__a"))
      .select(col("__b").as(idCol), col("rep_id"), col("__cos").as("cos"))
  }

  /** The vector column name inside an IvfIndex's `assigned` frame (the
    * non-reserved column that is not the id): assigned is
    * (idCol, vecCol, __nc, __cell) by construction.
    */
  private def vecColName(index: IvfIndex): String =
    index.assigned.columns.filterNot(c => c.startsWith("__")).apply(1)

  /** Embedding dimension, read from the first corpus row (one tiny job);
    * fails fast on an empty corpus instead of defaulting silently.
    */
  private[ops] def vectorDim(df: DataFrame, vecCol: String): Int = {
    val head = df.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(head.nonEmpty, s"cannot derive vector dimension: $vecCol table is empty")
    head(0).getInt(0)
  }

  /** L2-normalize `vecCol` into a double-array `__unit` column. The norm is
    * hoisted into its own column FIRST: an expression inlined into the
    * transform lambda re-evaluates per element (O(d²) per row — the HOF
    * inlining pitfall this repo documents in TextOps.shingleDf).
    */
  private def normalized(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__vnorm", sqrt(vecDot(col(vecCol), col(vecCol))))
      .withColumn("__unit", transform(col(vecCol), x => x.cast("double") / col("__vnorm")))

  /** SemDeDup-style semantic near-duplicate grouping: LSH buckets propose
    * candidate pairs (equi-join, never all-pairs), exact cosine confirms,
    * and each confirmed duplicate points at its lowest-id confirmed
    * neighbor as representative — the star-shaped single-pass
    * approximation of connected components that large-scale semantic
    * dedup uses instead of an iterative transitive closure. Returns one
    * row per DUPLICATE: (idCol, rep_id, cos), where cos is the exact
    * cosine to the representative; rows absent from the output are
    * keepers.
    *
    * 100 TB shape: bucket equi-join fan-out is controlled by `bits`
    * (bucket size ~ n/2^b per table); everything downstream of the join
    * touches only confirmed-candidate pairs.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 8, bits: Int = 10, seed: Long = 42L,
      dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else vectorDim(corpus, vecCol)
    val planes = hyperplanes(seed, tables, bits, d)
    // Candidate ids FIRST, vectors later: the bucket join fans out (every
    // co-bucketed pair, per table), so it must shuffle only (a, b) id
    // pairs — carrying the vectors through it and deduping wide rows
    // measured ~2x slower even at bench scale, and is catastrophic at
    // corpus scale. The unique pairs then join the corpus twice by id to
    // fetch vectors, and each cosine is computed once per pair.
    val sig = buckets(corpus.select(col(idCol), col(vecCol)), idCol, vecCol,
        "__n", planes)
      .select(col(idCol), col("__t"), col("__sig"))
    val cand = sig.alias("x").join(sig.alias("y"),
        col("x.__t") === col("y.__t") && col("x.__sig") === col("y.__sig") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("__a"), col(s"y.$idCol").as("__b"))
      .distinct()
    val e = withNorm(corpus, vecCol, "__n")
    val ea = e.select(col(idCol).as("__a"), col(vecCol).as("__va"), col("__n").as("__na"))
    val eb = e.select(col(idCol).as("__b"), col(vecCol).as("__vb"), col("__n").as("__nb"))
    val pairs = cand.join(ea, "__a").join(eb, "__b")
      .select(col("__a"), col("__b"),
        cosine(col("__va"), col("__vb"), col("__na"), col("__nb")).as("__cos"))
      .filter(col("__cos") >= threshold)
    // the grouped side renames its key BEFORE the self-join: rep("__b") and
    // pairs("__b") share attribute lineage, and joining them directly leans
    // on plan-id disambiguation (and logs a trivially-true-predicate warning)
    val rep = pairs.groupBy(col("__b").as("__rb")).agg(min(col("__a")).as("rep_id"))
    rep.join(pairs, col("__rb") === col("__b") && col("rep_id") === col("__a"))
      .select(col("__b").as(idCol), col("rep_id"), col("__cos").as("cos"))
  }

  /** All pairs with cosine >= threshold (exact, O(n²) dot products — the
    * recall oracle for bounded corpora; `lshTopK` / `Dedup.minhashLshPairs`
    * are the scale paths).
    *
    * Guarded: refuses corpora above `maxRows` (overridable) so the exact
    * baseline cannot be pointed at a large corpus by accident — at 1M rows
    * this stage is ~5·10¹¹ dot products, a cluster-killer however it is
    * partitioned. The probe is a `limit(maxRows+1).count()`, which stops
    * scanning once the cap is disproved rather than counting the corpus.
    */
  def thresholdPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxRows: Long = 100000L): DataFrame = {
    val probed = df.limit((maxRows + 1).min(Int.MaxValue).toInt).count()
    require(probed <= maxRows,
      s"thresholdPairs is an exact O(n^2) baseline guarded at $maxRows rows; " +
        s"corpus exceeds the cap. Use Similarity.lshTopK (bucketed ANN) or " +
        s"Dedup.minhashLshPairs (banded near-dup) at scale, or raise maxRows " +
        s"explicitly if the quadratic cost is intended.")
    val e = withNorm(df, vecCol, "__n")
    // the pair join is a broadcast-nested-loop whose parallelism equals the
    // stream side's partition count — a single-file source would run the
    // whole O(n²) stage on one core without this
    val a = e.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("a"), col(vecCol).as("__va"), col("__n").as("__na"))
    val b = e.select(col(idCol).as("b"), col(vecCol).as("__vb"), col("__n").as("__nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        cosine(col("__va"), col("__vb"), col("__na"), col("__nb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
