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
    * nodes), ordered by node id. One-subset form of [[trainMany]].
    */
  def train(df: DataFrame, features: Seq[String], labelCol: String,
      depth: Int, maxBins: Int): Seq[TreeNode] =
    trainMany(df, Seq(lit(true)), features, labelCol, depth, maxBins).head

  /** Train one tree per SUBSET of `df` — subsets given as boolean member
    * columns — in a single level-synchronous sweep (optimization round 15,
    * guide §1.2 "remove unnecessary passes"): the forest/CV/eval gates
    * train 3–4 trees over overlapping row subsets (the main even-id tree
    * plus per-bag out-of-bag complements, or the k CV folds), and k
    * separate [[train]] calls scan the corpus and run the level jobs k
    * times. Here the subset index rides the aggregation key — melt rows to
    * (subset, node, feature, bin) — so every level is ONE pass over the
    * frame regardless of k: per level, one counts-shuffle job and one
    * shared localCheckpoint instead of k of each. Aggregated counts per
    * (subset, node, feature, bin) equal each subset's own counts exactly
    * (a row contributes to subset b iff its member column is true), per-
    * subset min/max binning comes from one grouped pass, and the argmin
    * tie order is unchanged — so the trees are bit-identical to k [[train]]
    * calls (CartSpec pins it) and the DuckDB training replay still matches.
    * Shuffle rows stay bounded by subsets × nodes × features × bins counts
    * at any corpus size. Work per row is membership-proportional, exactly
    * as before — the saving is passes/jobs, which at 100 TB is k fewer
    * corpus scans per level.
    */
  def trainMany(df: DataFrame, subsets: Seq[Column], features: Seq[String],
      labelCol: String, depth: Int, maxBins: Int): Seq[Seq[TreeNode]] = {
    require(features.nonEmpty, "cart: need at least one feature")
    require(depth >= 1, s"cart: depth must be >= 1, got $depth")
    require(maxBins == 0 || maxBins >= 2,
      s"cart: maxBins must be 0 (off) or >= 2, got $maxBins")
    require(subsets.nonEmpty, "cart: need at least one subset")
    val k = subsets.size

    // rows carry the subset indices they belong to; a per-tree node
    // column tracks each tree's routing (node 1 = root)
    val bags = filter(
      array(subsets.zipWithIndex.map { case (c, i) =>
        when(c, lit(i)).otherwise(lit(-1))
      }: _*), x => x >= 0)
    var assigned = df.select(
      (features.map(f => col(f).cast("long").as(f)) :+
        col(labelCol).cast("long").as("__y") :+ bags.as("__bags")) ++
        (0 until k).map(b => lit(1L).as(s"__node_$b")): _*)

    // one grouped min/max pass -> per-(subset, feature) bin width
    val mmRows = assigned
      .select(explode(col("__bags")).as("__b"), col("*"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"),
        features.flatMap(f => Seq(
          min(col(f)).as(s"__mn_$f"),
          max(col(f)).as(s"__mx_$f"))): _*)
      .collect()
      .map(r => r.getInt(0) -> r).toMap
    (0 until k).foreach { b =>
      require(mmRows.get(b).exists(_.getAs[Long]("__n") > 0),
        s"cart: empty training set (subset $b)")
    }
    val width: Map[(Int, String), Long] = (for (b <- 0 until k; f <- features)
      yield {
        val mn = mmRows(b).getAs[Long](s"__mn_$f")
        val mx = mmRows(b).getAs[Long](s"__mx_$f")
        val w = if (maxBins == 0) 1L
          else math.max(1L, (mx - mn + maxBins) / maxBins) // ceil(range+1 / bins)
        (b, f) -> w
      }).toMap
    val lo: Map[(Int, String), Long] = (for (b <- 0 until k; f <- features)
      yield (b, f) -> mmRows(b).getAs[Long](s"__mn_$f")).toMap

    def bin(b: Int, f: String): Column = {
      val (m, w) = (lo((b, f)), width((b, f)))
      if (w == 1L) col(f)
      // integral `div`, not double `/`+cast: beyond 2^53 the double
      // rounds (v - m) and lands boundary values in the adjacent bin,
      // diverging from the oracle's exact `//`
      else expr(s"${m}L + ((`$f` - ${m}L) div ${w}L) * ${w}L" +
        s" + ${w - 1L}L")
    }
    // per-subset expression dispatched on the exploded subset index
    def byBag(g: Int => Column): Column =
      (0 until k).foldLeft(lit(null).cast("long")) { (acc, b) =>
        when(col("__b") === b, g(b)).otherwise(acc)
      }

    val nodes = Array.fill(k)(scala.collection.mutable.ArrayBuffer.empty[TreeNode])
    val open = Array.fill(k)(scala.collection.mutable.Set(1L)) // still trainable

    for (_ <- 1 to depth if open.exists(_.nonEmpty)) {
      // melt only (subset, node) pairs still OPEN: finalized leaves would
      // be exploded ×|features| and scored only for the driver to discard
      // them (leafStats reads the unfiltered frame, so leaf totals are
      // unaffected)
      val openPred = (0 until k).map { b =>
        col("__b") === b &&
          (if (open(b).isEmpty) lit(false)
           else col(s"__node_$b").isin(open(b).toSeq: _*))
      }.reduce(_ || _)
      val melted = assigned
        .select(explode(col("__bags")).as("__b"), col("*"))
        .filter(openPred)
        .select(col("__b"), byBag(b => col(s"__node_$b")).as("__node"),
          col("__y"),
          explode(array(features.map(f =>
            struct(lit(f).as("f"), byBag(b => bin(b, f)).as("vb"))): _*)).as("m"))
        .groupBy(col("__b"), col("__node"), col("m.f").as("f"),
          col("m.vb").as("vb"))
        .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
      val byBin = Window.partitionBy("__b", "__node", "f").orderBy("vb")
      val all = Window.partitionBy("__b", "__node", "f")
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
      val best = scored.groupBy("__b", "__node")
        .agg(min_by(struct(col("f"), col("vb"), col("e")),
            struct(col("e"), col("f"), col("vb"))).as("b"),
          max(col("tn")).as("tn"), max(col("tp")).as("tp"))
        .select(col("__b"), col("__node"), col("b.f").as("f"),
          col("b.vb").as("vb"), col("b.e").as("e"), col("tn"), col("tp"))
        .collect()

      // a node splits iff its best candidate strictly beats the node's
      // own majority vote; otherwise it leaves `open` as a leaf. Nodes
      // with no candidate row at all (every feature one bin) never
      // appear in `best` and fall out the same way.
      val splits = Array.fill(k)(
        scala.collection.mutable.Map.empty[Long, (String, Long)])
      best.foreach { r =>
        val (bg, node, f, vb, e) = (r.getInt(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4))
        val (tn, tp) = (r.getLong(5), r.getLong(6))
        val eNode = tn - math.max(tp, tn - tp)
        if (open(bg)(node) && e < eNode) {
          nodes(bg) += TreeNode(node, f, vb, tn, tp, eNode, -1L)
          splits(bg)(node) = (f, vb)
        }
      }
      (0 until k).foreach(b => open(b).clear())
      if (splits.exists(_.nonEmpty)) {
        val updates = (0 until k).flatMap { b =>
          if (splits(b).isEmpty) None
          else {
            splits(b).keys.foreach { n => open(b) += 2 * n; open(b) += 2 * n + 1 }
            val chain = splits(b).foldLeft(col(s"__node_$b")) {
              case (acc, (node, (f, thr))) =>
                when(col(s"__node_$b") === node,
                  lit(2 * node) + (col(f) > thr).cast("long")).otherwise(acc)
            }
            Some(s"__node_$b" -> chain)
          }
        }
        // materialize ONCE per level for ALL subsets: the next level's
        // melt AND the final leafStats re-read this frame, and levels
        // stack windows
        assigned = assigned
          .withColumns(updates.toMap)
          .localCheckpoint(true)
      }
    }

    // leaf stats for every (subset, node) still assigned rows but not
    // split — one grouped pass over the exploded membership
    val leafStats = assigned
      .select(explode(col("__bags")).as("__b"), col("*"))
      .groupBy(col("__b"), byBag(b => col(s"__node_$b")).as("__node"))
      .agg(count(lit(1)).as("tn"), sum(col("__y")).as("tp"))
      .collect()
    val splitIds = (0 until k).map(b => nodes(b).map(_.node).toSet)
    leafStats.foreach { r =>
      val (bg, node, tn, tp) = (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      if (!splitIds(bg).contains(node))
        nodes(bg) += TreeNode(node, null, -1L, tn, tp,
          tn - math.max(tp, tn - tp), if (2 * tp > tn) 1L else 0L)
    }
    (0 until k).map(b => nodes(b).sortBy(_.node).toSeq)
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
