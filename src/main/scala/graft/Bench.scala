package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first measured query doesn't absorb
    // context + codegen startup cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    // three runs per query, report the min: steady-state timing (first run
    // absorbs codegen + cache materialization; this host also shows sporadic
    // multi-second contention spikes that a single sample would misattribute).
    // Rounds 4/5 both burned a review cycle on 2-4x "regressions" on
    // unchanged code that were single-sample VM noise outside the old
    // min-of-3 ANN/dedup cluster — min-of-3 everywhere ends that ambiguity
    // for ~1.5x bench wall time.
    // Cache-consuming query groups run LAST and their persisted helper
    // frames are unpersisted right after the group — round-3 showed the
    // session-lifetime caches as broad memory pressure on unrelated queries.
    // Schedule order is shuffled WITHIN each cache group, seeded by round:
    // a sustained host-contention window then hits a different query set
    // each round instead of pinning the same alphabetical block (round 6's
    // q_tpch_q3/q5/q6 + q_events_hourly spike cluster was consecutive in
    // the sorted schedule). Seed = SPARK_GRAFT_ROUND if set, else the count
    // of BENCH_r*.json files in cwd — deterministic within a round.
    val roundSeed: Long = sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toLongOption)
      .getOrElse {
        try {
          val d = new java.io.File(".").listFiles()
          if (d == null) 0L
          else d.count(f => f.getName.matches("BENCH_r\\d+\\.json")).toLong
        } catch { case _: Throwable => 0L }
      }
    val rng = new scala.util.Random(roundSeed)
    // samples: name -> the 3 run times sorted ascending (min, med, max)
    val samples = SparkEntry.schedule.flatMap { case (names, after) =>
      val rs = rng.shuffle(names).map { name =>
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }
        name -> Seq.fill(3)(once()).sorted
      }
      after()
      rs
    }.toMap
    val results = samples.map { case (k, v) => k -> v.head }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query [min, med, max] — makes a contention spike self-evident
    // (max >> min on unchanged code) instead of a round-over-round mystery
    val disp = samples.toSeq.sortBy(_._1).map { case (k, v) =>
      f""""$k":[${v(0)}%.3f,${v(1)}%.3f,${v(2)}%.3f]"""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"dispersion":$disp,"seed":$roundSeed,"sf":"$sfDir"}"""
    // Durable full-detail copy: every query at full precision, fixed path.
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(json)
    // The driver parses only the LAST ~2000 chars of captured stdout
    // (BENCH_r03.json's "tail" starts mid-line): the full ~3 KB line above
    // can never fit, so the FINAL line is a compact headline JSON —
    // total + the flagship query cluster at ms precision — guaranteed to
    // sit whole inside the window. Full per-query detail: bench_last.json.
    val headline = Seq(
      "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q10",
      "q_tpch_q12", "q_tpch_q14", "q_groupby_agg", "q_sql_join",
      "q_dedup_exact", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash",
      "q_dedup_verified", "q_knn", "q_ann_lsh", "q_ann_ivf",
      "q_ann_ivf_exhaustive", "q_sim_pairs", "q_asof_join", "q_asof_grouped",
      "q_range_join", "q_iloc_slice", "q_events_hourly",
      "q_stratified_sample", "q_pack_sequences", "q_decontaminate",
      "q_semdedup", "q_semdedup_cells", "q_containment", "q_topk_freq",
      "q_dedup_components", "q_dedup_apply", "q_dedup_e2e", "q_dedup_cc_minhash",
      "q_reservoir_sample", "q_salted_join", "q_decontaminate_bloom")
    val hq = headline.flatMap(n => results.get(n).map(v => f""""$n":$v%.3f"""))
      .mkString("{", ",", "}")
    // worst-spread queries as name:[min,max] — a max >> min row IS the
    // host-contention evidence (the min is the steady-state number the
    // round-over-round comparison should use)
    val spread = samples.toSeq
      .filter { case (_, v) => v(2) > v(0) * 1.5 + 0.05 }
      .sortBy { case (_, v) => -(v(2) / (v(0) max 1e-9)) }
      .take(6)
      .map { case (k, v) => f""""$k":[${v(0)}%.2f,${v(2)}%.2f]""" }
      .mkString("{", ",", "}")
    // DuckDB absolute yardstick (BENCH.md round 7): scripts/duckbench.py
    // times each headline query's oracle SQL on the same sf0.1 parquet and
    // writes BASELINE_DUCKDB.json; pass it through so the per-round record
    // carries the duckdb column. Negative value = hit the 120 s cap (the
    // all-pairs oracle forms). Absent file → omitted.
    val duck: String =
      try {
        // the baseline was measured at sf0.1 — attach it only when the dir
        // IS sf0.1 (basename match, not substring: "/tmp/sf0.1_x10" is a
        // different scale and must not inherit these numbers)
        if (sfDir.stripSuffix("/").split('/').lastOption != Some("sf0.1"))
          throw new RuntimeException("sf mismatch")
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("BASELINE_DUCKDB.json")), "UTF-8")
        val kv = """"([A-Za-z0-9_]+)":\s*(-?[0-9.]+)""".r
        val entries = kv.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble)
          .filter { case (k, _) => results.contains(k) }
          .map { case (k, v) => f""""$k":$v%.2f""" }.toSeq
        if (entries.isEmpty) "" else entries.mkString(""","duckdb":{""", ",", "}")
      } catch { case _: Throwable => "" }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$hq,"spread_minmax":$spread$duck%s,"n_queries":${results.size}%d,"seed":$roundSeed%d,"full":"bench_last.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
