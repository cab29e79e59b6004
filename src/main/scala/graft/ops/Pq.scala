package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization (PQ) codebooks on top of [[Lloyd]] — the standard
  * memory-side of large-scale ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", PAMI 2011): split each `dim`-vector into `m`
  * subvectors, train an independent `ks`-centroid codebook per subspace,
  * and store every corpus vector as `m` small codes instead of `dim`
  * floats (64-dim float → 4 bytes at m=4/ks<=256: a 64× compression).
  * Queries then scan CODES, not vectors: per query one m×ks lookup table
  * of exact subspace distances is built against the codebooks (ADC —
  * asymmetric distance computation), and each corpus point's approximate
  * distance is `m` table lookups + adds, no dim-length arithmetic.
  *
  * Exactness contract, inherited from [[Lloyd]]: training, encoding and
  * ADC all run in quantized integer units, so the codebooks, the codes
  * and every ADC distance are exactly reproducible across engines and
  * reruns — the whole shortlist is hash-compared against DuckDB replaying
  * the identical integer recurrence (q_ann_pq).
  *
  * Scale shape: training is m independent [[Lloyd.train]] runs over
  * sliced columns (each the one-scan-per-iteration / k×dim-row-shuffle
  * shape); encoding is ONE corpus scan through m fused argmin kernels;
  * an ADC scan broadcasts the (queries × m × ks)-long tables and reads
  * only the codes column — the point of PQ at 100 TB is exactly that the
  * scan side is bytes-per-vector, not the raw embedding table. Re-ranking
  * the shortlist against true vectors (the standard IVF-PQ tail) touches
  * only shortlist×queries rows.
  */
object Pq {

  /** Trained codebooks: one [[Lloyd.Model]] per subspace, all with the
    * same `ks` and quantization.
    */
  final case class Model(sub: Array[Lloyd.Model], subDim: Int) {
    def m: Int = sub.length
    def ks: Int = sub.head.k
  }

  /** Train `m` subspace codebooks of `ks` centroids each by `iters` exact
    * Lloyd rounds. `dim` must split evenly into `m`. Init per subspace =
    * the `ks` rows with the smallest id on the SLICED frame — the same
    * deterministic rule the oracle replays.
    */
  def train(points: DataFrame, idCol: String, vecCol: String, m: Int,
      ks: Int, iters: Int, quant: Long = 1000000L): Model = {
    require(m >= 1, "pq: m must be >= 1")
    val firstDim = points.select(size(col(vecCol))).limit(1).collect()
    require(firstDim.nonEmpty, "pq: empty training set")
    val dim = firstDim.head.getInt(0)
    require(dim % m == 0, s"pq: dim $dim must split evenly into m=$m subvectors")
    val subDim = dim / m
    val subs = (0 until m).map { j =>
      Lloyd.train(
        points.select(col(idCol),
          slice(col(vecCol), j * subDim + 1, subDim).as("__sub")),
        idCol, "__sub", ks, iters, quant)
    }.toArray
    Model(subs, subDim)
  }

  /** `(id, codes)` with `codes(j)` = the argmin centroid of subspace `j` —
    * one corpus scan through `m` fused codegen argmin kernels
    * ([[graft.functions.NearestCentroid]]), ties to the smallest cluster.
    */
  def encode(points: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val codeCols = (0 until model.m).map { j =>
      graft.functions.VectorExprs.nearestCentroid(
        transform(
          slice(col(vecCol), j * model.subDim + 1, model.subDim),
          x => floor(x.cast("double") * lit(model.sub(j).quant.toDouble))),
        model.sub(j).centroids)
    }
    points.select(col(idCol).as("id"), array(codeCols: _*).as("codes"))
  }

  /** The flattened ADC lookup table for one quantized query vector:
    * `lut(j*ks + c)` = exact squared distance (quantized integer units)
    * between the query's subvector `j` and centroid `c` of codebook `j`.
    * O(m·ks·subDim) on the driver — the per-query cost ADC amortizes
    * over the whole corpus scan.
    */
  def lookupTable(q: Array[Long], model: Model): Array[Long] = {
    require(q.length == model.m * model.subDim,
      s"pq: query dim ${q.length} != ${model.m}x${model.subDim}")
    val lut = new Array[Long](model.m * model.ks)
    var j = 0
    while (j < model.m) {
      var c = 0
      while (c < model.ks) {
        val cent = model.sub(j).centroids(c)
        var acc = 0L
        var i = 0
        while (i < model.subDim) {
          val dAxis = q(j * model.subDim + i) - cent(i)
          acc += dAxis * dAxis
          i += 1
        }
        lut(j * model.ks + c) = acc
        c += 1
      }
      j += 1
    }
    lut
  }

  /** ADC distance of a `codes` column against a (possibly per-row) `lut`
    * column: `Σ_j lut[j*ks + codes[j]]` — `m` array lookups and adds per
    * corpus row, codegen'd HOFs, no dim-length arithmetic anywhere in
    * the scan.
    */
  def adcDistance(codes: Column, lut: Column, ks: Int): Column =
    aggregate(
      transform(codes, (c, j) => element_at(lut, j * lit(ks) + c + 1)),
      lit(0L), (acc, x) => acc + x)

  /** ADC shortlist: per query the `k` nearest corpus points by ADC
    * distance (ties to the smaller id), as a bounded-heap AGGREGATION —
    * [[Reservoir.BottomKW]]'s mergeable bottom-k, so each partition ships
    * at most `k` candidates per query across the exchange, never the
    * scored corpus, and parallelism is never bounded by the query count
    * (a per-query `row_number` window would shuffle every scored row into
    * one sort partition per query — measured 54 MB at 100× before this).
    * `codes` = [[encode]]'s output, `luts` = `(qid, lut)` rows from
    * [[lookupTable]] (broadcast — queries are the bounded side). Returns
    * `(qid, vec_id)`. Distances ride the heap as Doubles — exact below
    * 2^53, far above any real quantization's range (guarded).
    */
  def adcShortlist(codes: DataFrame, luts: DataFrame, ks: Int,
      k: Int): DataFrame =
    heapShortlist(
      codes.crossJoin(broadcast(luts))
        .select(col("qid"), col("id"),
          adcDistance(col("codes"), col("lut"), ks).as("adist")),
      k)

  /** Bottom-k per qid over a `(qid, id, adist)` frame — the shared heap
    * tail of [[adcShortlist]] and the IVF-PQ composition (which restricts
    * the scored set to probed cells before handing it here). Same bounded
    * mergeable aggregation and exactness bound as adcShortlist's scaladoc.
    */
  private[graft] def heapShortlist(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .select(col("qid").cast("long"), col("id").cast("long"),
        col("adist").cast("long"))
      .as[(Long, Long, Long)]
      .map { case (qid, id, ad) =>
        require(math.abs(ad) < (1L << 53),
          s"ADC distance $ad exceeds the exact-Double range")
        (qid, Reservoir.WCand(ad.toDouble, id))
      }
      .groupByKey(_._1).mapValues(_._2)
      .agg(new Reservoir.BottomKW(k).toColumn.name("cands"))
      .flatMap { case (qid, cands) => cands.map(c => (qid, c.id)) }
      .toDF("qid", "vec_id")
  }
}
