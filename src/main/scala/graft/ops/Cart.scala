package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer CART: a depth-limited binary decision tree trained with
  * the misclassification-count split criterion — the fifth SQL-replayable
  * trained model (after PageRank, BPE, Lloyd's k-means and Naive Bayes),
  * so the whole train→classify loop sits under the DuckDB oracle gate
  * (q_cart_train / q_cart_classify).
  *
  * Reference scope: quality-classifier curation (reference `README.md`'s
  * filter-by-score workflow) — this trains the scorer itself inside the
  * engine instead of importing one.
  *
  * Why misclassification count and not Gini: the split objective stays a
  * BIGINT (`errors_left + errors_right`), so argmin ties are decided on
  * exact integers with a deterministic (error, feature, threshold) order
  * and DuckDB replays the training bit-for-bit. Gini/entropy compare
  * rationals with per-node denominators — cross-engine float rounding
  * would make the gate flaky for ties without buying test-fixture
  * accuracy.
  *
  * Training is one pass per LEVEL (not per node — all nodes of a level
  * train in the same jobs):
  *   1. melt rows to (node, feature, binned value, label) — explode over
  *      a `features.size`-element array, map-side partial agg collapses
  *      to per-(node, feature, bin) class counts before the shuffle;
  *   2. prefix sums over bins via a window PARTITIONED BY (node, feature)
  *      and ordered by bin — each partition holds at most `maxBins` rows
  *      (see below), so no partitionless window and no skew;
  *   3. per-node argmin via one `min_by` hash aggregation (the
  *      q_contrastive lesson: no row_number window for a top-1);
  *   4. the ≤ 2^depth chosen splits come to the driver (the O(k·dim)
  *      Lloyd convention) and re-enter the plan as a broadcast join.
  *
  * `maxBins` is the scale throttle (Spark ML uses the same knob): values
  * are bucketed as `mn + ((v - mn) / w) * w + (w - 1)` with
  * `w = ceil(range / maxBins)` from one global min/max pass — pure
  * integer arithmetic the oracle mirrors, and candidate thresholds (bin
  * upper edges) stay exact split points. At 100 TB the per-level shuffle
  * is therefore bounded by nodes × features × maxBins rows of counts,
  * independent of row count; with binning off (`maxBins = 0`) a
  * high-cardinality feature would sort all its distinct values in one
  * window task.
  *
  * A node splits only when the best candidate STRICTLY reduces its
  * misclassification count (pure nodes never split: every candidate ties
  * the parent at 0). Unsplit nodes become leaves early; leaf prediction
  * is the majority label, ties to 0.
  */
object Cart {

  /** One trained node. Internal: `feature`/`threshold` set (`v <= thr`
    * goes to child 2·node, else 2·node+1), `pred` = -1. Leaf:
    * feature = null, threshold = -1, `pred` = majority label.
    * `n`/`n_pos` are the node's training totals, `err` its
    * misclassification count under its own majority vote.
    */
  final case class TreeNode(node: Long, feature: String, threshold: Long,
      n: Long, nPos: Long, err: Long, pred: Long)

  /** Train a depth-≤`depth` tree on integer `features` and 0/1 `labelCol`.
    * Returns the model as a driver-side list (KB-sized: ≤ 2^(depth+1)
    * nodes), ordered by node id.
    */
  def train(df: DataFrame, features: Seq[String], labelCol: String,
      depth: Int, maxBins: Int): Seq[TreeNode] = {
    require(features.nonEmpty, "cart: need at least one feature")
    require(depth >= 1, s"cart: depth must be >= 1, got $depth")
    require(maxBins == 0 || maxBins >= 2,
      s"cart: maxBins must be 0 (off) or >= 2, got $maxBins")

    // one global min/max pass -> per-feature bin width (O(features) driver row)
    val mmRow = df.agg(
      count(lit(1)).as("__n"),
      features.flatMap(f => Seq(
        min(col(f).cast("long")).as(s"__mn_$f"),
        max(col(f).cast("long")).as(s"__mx_$f"))): _*).head()
    require(mmRow.getLong(0) > 0, "cart: empty training set")
    val width: Map[String, Long] = features.map { f =>
      val mn = mmRow.getAs[Long](s"__mn_$f")
      val mx = mmRow.getAs[Long](s"__mx_$f")
      val w = if (maxBins == 0) 1L
        else math.max(1L, (mx - mn + maxBins) / maxBins) // ceil(range+1 / bins)
      f -> w
    }.toMap
    val lo: Map[String, Long] =
      features.map(f => f -> mmRow.getAs[Long](s"__mn_$f")).toMap

    def bin(f: String): Column = {
      val (m, w) = (lo(f), width(f))
      if (w == 1L) col(f).cast("long")
      // integral `div`, not double `/`+cast: beyond 2^53 the double
      // rounds (v - m) and lands boundary values in the adjacent bin,
      // diverging from the oracle's exact `//`
      else expr(s"${m}L + ((CAST(`$f` AS BIGINT) - ${m}L) div ${w}L) * ${w}L" +
        s" + ${w - 1L}L")
    }

    var assigned = df.select(
      (features.map(f => col(f).cast("long").as(f)) :+
        col(labelCol).cast("long").as("__y") :+ lit(1L).as("__node")): _*)
    val nodes = scala.collection.mutable.ArrayBuffer.empty[TreeNode]
    val open = scala.collection.mutable.Set(1L) // nodes still trainable

    for (_ <- 1 to depth if open.nonEmpty) {
      // melt only rows of nodes still OPEN: finalized leaves would be
      // exploded ×|features| and scored only for the driver to discard
      // them — at depth > 2 most rows sit in leaves (leafStats reads the
      // unfiltered frame, so leaf totals are unaffected)
      val melted = assigned
        .filter(col("__node").isin(open.toSeq: _*))
        .select(col("__node"), col("__y"),
          explode(array(features.map(f =>
            struct(lit(f).as("f"), bin(f).as("vb"))): _*)).as("m"))
        .groupBy(col("__node"), col("m.f").as("f"), col("m.vb").as("vb"))
        .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
      val byBin = Window.partitionBy("__node", "f").orderBy("vb")
      val all = Window.partitionBy("__node", "f")
      val scored = melted
        .withColumn("cn", sum(col("n")).over(byBin))
        .withColumn("cp", sum(col("pos")).over(byBin))
        .withColumn("tn", sum(col("n")).over(all))
        .withColumn("tp", sum(col("pos")).over(all))
        .filter(col("cn") < col("tn")) // last bin splits nothing off
        .withColumn("e",
          (col("cn") - greatest(col("cp"), col("cn") - col("cp"))) +
          ((col("tn") - col("cn")) - greatest(col("tp") - col("cp"),
            (col("tn") - col("cn")) - (col("tp") - col("cp")))))
      val best = scored.groupBy("__node")
        .agg(min_by(struct(col("f"), col("vb"), col("e")),
            struct(col("e"), col("f"), col("vb"))).as("b"),
          max(col("tn")).as("tn"), max(col("tp")).as("tp"))
        .select(col("__node"), col("b.f").as("f"), col("b.vb").as("vb"),
          col("b.e").as("e"), col("tn"), col("tp"))
        .collect()

      // a node splits iff its best candidate strictly beats the node's
      // own majority vote; otherwise it leaves `open` as a leaf. Nodes
      // with no candidate row at all (every feature one bin) never
      // appear in `best` and fall out the same way.
      val splits = scala.collection.mutable.Map.empty[Long, (String, Long)]
      best.foreach { r =>
        val (node, f, vb, e) = (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))
        val (tn, tp) = (r.getLong(4), r.getLong(5))
        val eNode = tn - math.max(tp, tn - tp)
        if (open(node) && e < eNode) {
          nodes += TreeNode(node, f, vb, tn, tp, eNode, -1L)
          splits(node) = (f, vb)
        }
      }
      open.clear()
      if (splits.nonEmpty) {
        splits.keys.foreach { n => open += 2 * n; open += 2 * n + 1 }
        val chain = splits.foldLeft(col("__node")) {
          case (acc, (node, (f, thr))) =>
            when(col("__node") === node,
              lit(2 * node) + (col(f) > thr).cast("long")).otherwise(acc)
        }
        // materialize ONCE per level: the next level's melt AND the final
        // leafStats both re-read this frame, and levels stack windows
        assigned = assigned.withColumn("__node", chain).localCheckpoint(true)
      }
    }

    // leaf stats for every node still assigned rows but not split
    val leafStats = assigned.groupBy("__node")
      .agg(count(lit(1)).as("tn"), sum(col("__y")).as("tp"))
      .collect()
    val splitIds = nodes.map(_.node).toSet
    leafStats.foreach { r =>
      val (node, tn, tp) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (!splitIds.contains(node))
        nodes += TreeNode(node, null, -1L, tn, tp,
          tn - math.max(tp, tn - tp), if (2 * tp > tn) 1L else 0L)
    }
    nodes.sortBy(_.node).toSeq
  }

  /** Model as a DataFrame (node, feature, threshold, n, n_pos, err, pred)
    * — the q_cart_train gate surface.
    */
  def treeDF(spark: org.apache.spark.sql.SparkSession,
      tree: Seq[TreeNode]): DataFrame = {
    val rows = tree.map(t => Row(t.node, t.feature, t.threshold, t.n,
      t.nPos, t.err, t.pred))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("feature",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("threshold",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_pos",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("err",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("pred",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Route `df` through the tree: appends `pred` (the leaf's majority
    * label). Pure nested `when` chains built from the KB-sized model —
    * codegen'd, no join, no shuffle.
    */
  def classify(df: DataFrame, tree: Seq[TreeNode]): DataFrame =
    df.withColumn("pred", route(tree, _.pred))

  /** Route `df` through the tree: appends `leaf` (the reached leaf's node
    * id) — the granularity for per-leaf diagnostics like calibration.
    */
  def routeLeaf(df: DataFrame, tree: Seq[TreeNode]): DataFrame =
    df.withColumn("leaf", route(tree, _.node))

  /** The shared when-chain: descend from the root, emit `value` of the
    * reached leaf.
    */
  private def route(tree: Seq[TreeNode], value: TreeNode => Long): Column = {
    val byId = tree.map(t => t.node -> t).toMap
    def descend(node: Long): Column = byId(node) match {
      case t if t.feature == null => lit(value(t))
      case t => when(col(t.feature).cast("long") <= t.threshold,
          descend(2 * t.node)).otherwise(descend(2 * t.node + 1))
    }
    descend(1L)
  }
}
