package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) over string keys: find every record
  * pair whose names are within edit distance k, close the pairs into
  * entities, and elect a canonical survivor per entity — the structured-
  * record sibling of content dedup (Dedup/Similarity handle documents and
  * vectors; this handles names/addresses/titles where "same entity" means
  * small edit distance, not shared shingles).
  *
  * Candidate generation is Ed-Join-style prefix filtering (Xiao, Wang &
  * Lin, "Ed-Join: an efficient algorithm for similarity joins with edit
  * distance constraints", VLDB 2008): each record indexes only the
  * q·k + 1 of its distinct q-grams that are globally RAREST (total order
  * = (gram document frequency, gram) ascending). Why that is complete:
  * one edit disturbs at most q of a string's distinct q-grams, so two
  * strings within edit distance k share all but at most q·k distinct
  * grams — overlap ≥ max(|G₁|,|G₂|) − q·k. By the standard prefix-filter
  * lemma on a common total order, any pair meeting that overlap shares at
  * least one gram inside both records' first |G| − overlap + 1 ≤ q·k + 1
  * grams. Indexing the RAREST grams is what makes the index join cheap:
  * stop-word grams ("th ", " an") never enter the posting lists, so no
  * bucket is corpus-sized. A length filter (||s|−|t|| ≤ k, a trivial
  * lower bound on edit distance) prunes candidates before the verify.
  *
  * Degenerate records — fewer than q·k + 1 distinct grams, i.e. highly
  * repetitive or shorter than ~q·k chars — fall outside the lemma's
  * guarantee (their gram overlap bound is vacuous), so they are verified
  * against EVERY length-compatible record via a broadcast of the (tiny)
  * degenerate set. At 100 TB this residual is a handful of pathological
  * strings; the guarantee stays exact without an all-pairs join.
  *
  * Scale shape: one groupBy for gram document frequencies, one bounded
  * per-record window (≤ |name| rows per key) for the rarest-gram ranks,
  * one equi-join on the prefix index (posting lists are df-small by
  * construction), then levenshtein only on surviving candidates. Nothing
  * is all-pairs; nothing collects to the driver.
  */
object Entity {

  /** Record pairs within edit distance ≤ k, exactly: (a, b, dist) with
    * a < b, one row per unordered pair. `records` needs an integral id
    * column and a string name column; null names are ignored.
    */
  def editPairs(records: DataFrame, idCol: String, nameCol: String,
      q: Int = 3, k: Int = 2): DataFrame = {
    require(q >= 2, s"editPairs: gram size q must be >= 2, got $q")
    require(k >= 0, s"editPairs: distance threshold k must be >= 0, got $k")
    val prefixLen = q * k + 1
    val recs = records
      .select(col(idCol).as("__id"), col(nameCol).as("__nm"))
      .filter(col("__nm").isNotNull)
      .withColumn("__len", length(col("__nm")))
    // distinct q-grams per record; a name shorter than q contributes the
    // whole name as its single gram (it is degenerate below anyway)
    val grams = recs.select(col("__id"), col("__nm"), col("__len"),
      explode(array_distinct(expr(
        s"transform(sequence(1, greatest(__len - ${q - 1}, 1))," +
          s" i -> substring(__nm, i, $q))"))).as("__g"))
    val df = grams.groupBy("__g").agg(count(lit(1)).as("__df"))
    // rarest-first rank within each record; the window key is the record
    // id, so each partition holds at most |name| rows — no skew possible
    val ranked = grams.join(df, "__g")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__id").orderBy(col("__df"), col("__g"))))
    val nGrams = ranked.groupBy("__id").agg(max(col("__rk")).as("__ng"))
    val prefix = ranked.filter(col("__rk") <= prefixLen)
      .select(col("__id"), col("__nm"), col("__len"), col("__g"))
    val prefixCand = prefix.alias("x").join(prefix.alias("y"),
        col("x.__g") === col("y.__g") && col("x.__id") < col("y.__id") &&
          abs(col("x.__len") - col("y.__len")) <= k)
      .select(col("x.__id").as("__a"), col("x.__nm").as("__na"),
        col("y.__id").as("__b"), col("y.__nm").as("__nb"))
    // records outside the lemma (< prefixLen distinct grams): verify
    // against all length-compatible records. The set is pathologically
    // small (repetitive strings), so broadcast it.
    val degenerate = recs.join(
        nGrams.filter(col("__ng") < prefixLen).select("__id"), Seq("__id"), "left_semi")
    val degenCand = broadcast(degenerate.alias("x")).join(recs.alias("y"),
        col("x.__id") =!= col("y.__id") &&
          abs(col("x.__len") - col("y.__len")) <= k)
      .select(least(col("x.__id"), col("y.__id")).as("__a"),
        when(col("x.__id") < col("y.__id"), col("x.__nm")).otherwise(col("y.__nm")).as("__na"),
        greatest(col("x.__id"), col("y.__id")).as("__b"),
        when(col("x.__id") < col("y.__id"), col("y.__nm")).otherwise(col("x.__nm")).as("__nb"))
    prefixCand.union(degenCand)
      .groupBy("__a", "__b").agg(first(col("__na")).as("__na"), first(col("__nb")).as("__nb"))
      .withColumn("dist", levenshtein(col("__na"), col("__nb")))
      .filter(col("dist") <= k)
      .select(col("__a").as("a"), col("__b").as("b"), col("dist"))
  }

  /** Entity assignment: every record mapped to its entity id (the minimum
    * record id of its edit-distance-≤k connected component; singletons map
    * to themselves). Output: (idCol, entity_id).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
      q: Int = 3, k: Int = 2): DataFrame = {
    val pairs = editPairs(records, idCol, nameCol, q, k)
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
