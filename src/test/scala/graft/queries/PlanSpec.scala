package graft.queries

import graft.SparkEntry
import graft.SparkSuite

/** Physical-plan assertions: the properties that make these queries hold up
  * at 100 TB (filter pushdown into the parquet scan, column pruning,
  * broadcast joins for small dims, top-k instead of full sort, partial
  * aggregation). Executable evidence for the `.explain` review the brief
  * demands — if an optimization regresses, this suite fails.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("filter is pushed into the parquet scan and columns are pruned") {
    val p = plan("q_filter_eq")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]"),
      s"no pushdown in:\n$p")
    assert(p.contains("ReadSchema") && p.contains("c_custkey") && !p.contains("c_acctbal"),
      "scan should read only the projected columns")
  }

  test("range filter pushes both bounds") {
    val p = plan("q_between")
    // PushedFilters renders truncated; DataFilters carries the full list
    assert(p.contains("(o_totalprice#") && p.contains(">= 1000.0") &&
      p.contains("<= 5000.0") && p.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThanOrEqual"),
      s"missing pushed bounds in:\n$p")
  }

  test("small dimension joins broadcast (no shuffle of the big side)") {
    val p = plan("q_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    val p2 = plan("q_sql_join")
    assert(p2.contains("BroadcastHashJoin"), s"raw-SQL join should broadcast dims:\n$p2")
  }

  test("sort+limit compiles to distributed top-k, not a global sort") {
    val p = plan("q_sort_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("group-by aggregates partially before the shuffle (map-side combine)") {
    val p = plan("q_groupby_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"expected partial aggregation:\n$p")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
  }

  test("knn broadcasts the single query vector, scans corpus once") {
    val p = plan("q_knn")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "must not cartesian-shuffle the corpus")
  }

  test("binned range join plans as an equi join, never nested-loop/cartesian") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not fall back to O(n*m):\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equi join on the bin:\n$p")
  }

  test("rank-1 window filter pushes down as WindowGroupLimit") {
    // rn = 1 must plan a per-partition group limit (bounded heap) before the
    // full Window sort, not rank every row then filter
    val p = plan("q_window_rank")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit pushdown:\n$p")
  }

  test("q5 six-table join: only the lineitem⋈orders join shuffles") {
    // customer/supplier/nation/region all broadcast, so the single
    // sort-merge join (lineitem⋈orders) plus the final aggregation are the
    // only exchanges — the shape that survives a 100× scale-up
    val p = plan("q_tpch_q5")
    assert(p.split("BroadcastHashJoin").length - 1 >= 4,
      s"expected 4 broadcast dim joins:\n$p")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 shuffle exchanges, got $exchanges:\n$p")
  }

  test("promo-share join broadcasts the part dimension") {
    val p = plan("q_tpch_q14")
    assert(p.contains("BroadcastHashJoin"), s"part dim should broadcast:\n$p")
  }

  test("q18 aggregate-then-semi-join: hot set and customer broadcast, top-k not global sort") {
    val p = plan("q_tpch_q18")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      s"hot set + customer should both broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"limit should plan as top-k:\n$p")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"only the lineitem aggregation may shuffle, got $exchanges:\n$p")
  }

  test("stratified sample plans per-group top-k (WindowGroupLimit), decontamination broadcasts the benchmark") {
    val p = plan("q_stratified_sample")
    assert(p.contains("WindowGroupLimit"), s"rk<=3 should push a group limit:\n$p")
    // hint-free since round 8 (r7 verdict item 5): AQE must still choose the
    // broadcast on its own, and the analyzed plan must carry no ResolvedHint
    // so a corpus-sized "benchmark" can't OOM a forced build side
    val df2 = SparkEntry.queries("q_decontaminate")(spark, sfDir)
    assert(!df2.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no forced broadcast hint in the decontamination path")
    val p2 = df2.queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"), s"benchmark side should broadcast:\n$p2")
    val lib = graft.ops.Curation.decontaminate(
      spark.read.parquet(s"$sfDir/documents.parquet").filter("doc_id >= 50"),
      spark.read.parquet(s"$sfDir/documents.parquet").filter("doc_id < 50"),
      "doc_id", "text")
    assert(!lib.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no forced broadcast hint in Curation.decontaminate")
  }

  test("no unpartitioned Window over an unbounded input in any query plan") {
    // A Window with an empty partitionSpec funnels every row through one
    // partition — the classic scale choke point. Sweep the optimized logical
    // plan of EVERY SparkEntry query. The only sanctioned shape is a global
    // window whose input is already bounded by a Limit (q_iloc_slice windows
    // over a 1010-row top-k), which the optimizer keeps as a Limit child.
    import org.apache.spark.sql.catalyst.plans.logical
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: logical.Window if w.partitionSpec.isEmpty &&
          w.collectFirst { case l: logical.GlobalLimit => l }.isEmpty => w
        case w: logical.WindowGroupLimit if w.partitionSpec.isEmpty &&
          w.collectFirst { case l: logical.GlobalLimit => l }.isEmpty => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned unbounded Window in: ${offenders.mkString(", ")}")
  }

  test("new pipeline ops keep scale-safe shapes: vocab broadcasts, semdedup equi-joins") {
    val p = plan("q_word_freq_score")
    assert(p.contains("BroadcastHashJoin"), s"vocabulary should broadcast:\n$p")
    val p2 = plan("q_semdedup")
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
      s"semdedup must stay equi-join only (bucket + id joins):\n$p2")
    val p3 = plan("q_containment")
    assert(!p3.contains("CartesianProduct"),
      s"containment must pair only via the fingerprint index:\n$p3")
  }

  test("q_mode plans as agg-max + broadcast join, not a global window") {
    val p = plan("q_mode")
    assert(!p.contains("Window"), s"q_mode must not use a window:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"1-row max should broadcast:\n$p")
  }

  test("lang-id stopword counting stays codegen'd: explode + In, no interpreted HOF") {
    val p = plan("q_lang_id")
    // the pre-round-6 plan was filter(w, _.isin(...)) — an ArrayFilter HOF
    // whose lambda evaluates interpreted per token (the suite's slowest
    // query); the fix explodes to a flat column so the membership test is
    // a codegen'd In and the per-doc count is a partial hash aggregate
    assert(!p.contains("array_filter") && !p.contains("ArrayFilter"),
      s"stopword test regressed to an interpreted HOF:\n$p")
    assert(p.contains("Generate explode"), s"expected explode:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("q4 correlated EXISTS plans as a single semi join of the fact table") {
    val p = plan("q_tpch_q4")
    assert(p.contains("LeftSemi"), s"expected left-semi join:\n$p")
  }

  test("q22 NOT IN plans as broadcast scalar + anti join, no subquery per row") {
    val p = plan("q_tpch_q22")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row aggregate should broadcast:\n$p")
  }

  test("salted join plans as a shuffled join on (key, salt), not broadcast") {
    val p = plan("q_salted_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"salting is pointless under a broadcast join:\n$p")
    assert(p.contains("__salt"), s"join keys should include the salt:\n$p")
  }

  test("reservoir sample aggregates bounded buffers partially (no full-row shuffle)") {
    val p = plan("q_reservoir_sample")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final object hash aggregate:\n$p")
  }

  test("verified-MinHash candidate restriction is a hint-free semi-join (AQE decides, scale-safe)") {
    // r6 verdict item 2: the candidate-doc id set is unbounded on a
    // near-dup-heavy corpus, so a FORCED broadcast(ids) is a cluster-killer.
    // The contract now: left_semi with no hint — the analyzed plan carries
    // no ResolvedHint anywhere in the verify path, and AQE still broadcasts
    // the (tiny, at bench scale) set on its own.
    val df = SparkEntry.queries("q_dedup_verified")(spark, sfDir)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"),
      "no forced broadcast hint in the dedup verify path")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("LeftSemi"),
      s"candidate restriction should be a semi-join:\n${optimized.take(2000)}")
    // same contract for the library form
    val lib = graft.ops.Dedup.minhashVerifiedPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
    assert(!lib.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no forced broadcast hint in Dedup.minhashVerifiedPairs")
  }

  test("export queries: seeded shuffle is top-k; shard rank has no Window at all") {
    val p = plan("q_shuffle_order")
    assert(p.contains("TakeOrderedAndProject"),
      s"seeded-shuffle head should plan as distributed top-k:\n$p")
    // global rank comes from the two-phase RDD scheme — the physical plan
    // must contain no Window operator of any kind
    val p2 = plan("q_shard_assign")
    assert(!p2.contains("Window"),
      s"shard rank must not use a window operator:\n$p2")
  }

  test("whole-stage codegen covers the hot aggregation path") {
    val qe = graft.SparkEntry.queries("q_groupby_agg")(spark, sfDir).queryExecution
    val p = qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(p.contains("WholeStageCodegen"), s"expected codegen spans:\n${p.take(2000)}")
  }
}
