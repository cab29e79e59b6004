package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over hashed token buckets — the trained-model
  * document CLASSIFIER of the curation pipeline (language ID beyond the
  * n-gram heuristic, quality/domain routing), joining the other gated
  * trained models (PageRank, BPE, Lloyd/PQ) as a fourth training path
  * whose MODEL and predictions are both exactly engine-replayable.
  *
  * Determinism (the [[LangModel]] conventions): features are 60-bit md5
  * buckets, every ln() is rounded to 6 decimals and carried as
  * DECIMAL(18,6), and per-document scores are decimal SUMS of those
  * terms — exact, order-independent, and comparable exactly (the argmax
  * never depends on float summation order; ties break to the smallest
  * class label).
  *
  * Scale shape (100 TB corpus): the model is two aggregates over the
  * training slice — (class, bucket) counts (≤ classes × buckets rows)
  * and class totals/priors (classes rows) — both broadcast back to the
  * scoring scan. Scoring explodes tokens map-side, shuffles once on
  * (doc, bucket), joins the broadcast model, and collapses per doc with
  * one more keyed aggregation. Nothing corpus-sized is ever on the model
  * side of a join.
  */
object NaiveBayes {

  private def toks(c: Column): Column =
    regexp_extract_all(c, lit("\\S+"), lit(0))

  private def dec6(c: Column): Column =
    round(c, 6).cast(org.apache.spark.sql.types.DecimalType(18, 6))

  /** Cross-engine bucket: DuckDB `('0x'||substr(md5(f),1,15))::BIGINT % B`. */
  private def bucketOf(c: Column, buckets: Int): Column =
    pmod(conv(substring(md5(c), 1, 15), 16, 10).cast("long"), lit(buckets))

  /** Per-(document, class) log-posterior scores:
    * `score(d, k) = ln p(k) + Σ_b n_d(b) · ln p̂(b | k)` with add-one
    * smoothing over `buckets` buckets (`p̂ = (c_k(b)+1)/(N_k+buckets)`).
    * `train` provides (labelCol, textCol); `score` provides (idCol,
    * textCol). Output: (idCol, cls, score) — score is an EXACT
    * DECIMAL sum of 6-dp-rounded ln terms, one row per scored document
    * per class (documents with zero tokens produce no rows, matching
    * the relational replay). Callers comparing scores may do so exactly.
    */
  def scores(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, labelCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "naiveBayes needs a positive bucket count")
    val classes = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    val total = classes.agg(sum(col("n_docs")).as("n_all"))
    val priors = classes.crossJoin(broadcast(total))
      .select(col("cls"),
        dec6(log(col("n_docs").cast("double") / col("n_all").cast("double")))
          .as("lnprior"))
    val counts = train
      .select(col(labelCol).as("cls"), explode(toks(col(textCol))).as("w"))
      .withColumn("bk", bucketOf(col("w"), buckets))
      .groupBy("cls", "bk").agg(count(lit(1)).as("c"))
    val classTok = counts.groupBy("cls").agg(sum(col("c")).as("n_tok"))
    // LEFT join + 0 floor: a class whose training docs carry zero tokens
    // still exists (prior + all-smoothing likelihoods 1/buckets) — an
    // inner join would silently drop it from the model and make it
    // unpredictable with no warning
    val model = priors.join(broadcast(classTok), Seq("cls"), "left")
      .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
      // per-class unseen-bucket floor, precomputed ONCE: ln(1/(N_k+B))
      .withColumn("llh0", dec6(log(
        lit(1L).cast("double") / (col("n_tok") + lit(buckets)).cast("double"))))
    // occupied-bucket log-likelihoods, precomputed per (class, bucket) —
    // ≤ classes × buckets rows, broadcast; integer inputs mean the double
    // division and ln see bit-identical arguments in any engine
    val llhTab = counts.join(broadcast(classTok), "cls")
      .select(col("cls"), col("bk"), dec6(log(
        (col("c") + lit(1)).cast("double") /
          (col("n_tok") + lit(buckets)).cast("double"))).as("llh"))
    // Shape choice, MEASURED at 100× (ScaleBench): aggregate per-doc
    // bucket counts FIRST (the tf shuffle — exchange keyed on near-
    // distinct (doc, bucket) pairs, 496 MB, 29 s wall, the LangModel
    // shape), then fan out × classes on the collapsed frame. The
    // shuffle-minimal alternative — joining RAW tokens × classes and
    // combining on (doc, class), 53 MB — was tried and is 3.6× SLOWER
    // (104 s): the nested-loop fan-out multiplies the full token stream
    // by k before any collapse, and that CPU dwarfs the linear exchange.
    // tf-shuffle ∝ corpus tokens is the honest, linear price.
    val feats = score
      .select(col(idCol), explode(toks(col(textCol))).as("w"))
      .withColumn("bk", bucketOf(col("w"), buckets))
      .groupBy(col(idCol), col("bk")).agg(count(lit(1)).as("nb"))
    feats.crossJoin(broadcast(model.select(col("cls"), col("lnprior"), col("llh0"))))
      .join(broadcast(llhTab), Seq("cls", "bk"), "left")
      .withColumn("term", coalesce(col("llh"), col("llh0")))
      .groupBy(col(idCol), col("cls"))
      .agg((first(col("lnprior")) + sum(col("nb") * col("term"))).as("score"))
  }

  /** Argmax classification over [[scores]]: (idCol, pred) — highest
    * score wins, ties to the SMALLEST class label, decided on the exact
    * decimal scores via one min_by aggregation (no per-document sort).
    */
  def classify(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, labelCol: String, buckets: Int = 1024): DataFrame =
    scores(train, score, idCol, textCol, labelCol, buckets)
      .groupBy(col(idCol))
      .agg(min_by(col("cls"),
        struct((col("score") * -1).as("ns"), col("cls"))).as("pred"))
}
