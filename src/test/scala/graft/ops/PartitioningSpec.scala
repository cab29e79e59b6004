package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PartitioningSpec extends SparkSuite {

  test("bucketed tables join without an Exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Partitioning.saveBucketed(li, "li_b", "l_orderkey", 8, Seq("l_orderkey"))
      Partitioning.saveBucketed(o, "o_b", "o_orderkey", 8, Seq("o_orderkey"))
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("external-path bucketed tables (the q_bucketed_join shape) also join exchange-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val root = java.nio.file.Files.createTempDirectory("bkt_ext_")
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      Partitioning.saveBucketed(li, "li_be", "l_orderkey", 8,
        Seq("l_orderkey"), path = Some(root.resolve("li").toString))
      Partitioning.saveBucketed(o, "o_be", "o_orderkey", 8,
        Seq("o_orderkey"), path = Some(root.resolve("o").toString))
      val joined = spark.table("li_be")
        .join(spark.table("o_be"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      // the bytes really live under the external path, not the warehouse
      assert(root.resolve("li").toFile.listFiles()
        .exists(_.getName.endsWith(".parquet")))
      assert(joined.count() == li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_be")
      spark.sql("DROP TABLE IF EXISTS o_be")
    }
  }

  test("IVF index persisted bucketed by cell: probe joins without shuffling the corpus side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 3).select("vec_id", "embedding")
      val idx = Similarity.ivfIndex(corpus, "vec_id", "embedding", nCells = 8)

      // the 100 TB layout: assignments on disk, bucketed by cell id
      Partitioning.saveBucketed(idx.assigned, "ivf_cells", "__cell", 8)
      val fromDisk = idx.copy(assigned = spark.table("ivf_cells"))

      val probe = Similarity.ivfTopK(fromDisk, queries, "vec_id", "qid",
        "embedding", k = 5, nProbe = 8)
      // bucketed corpus side needs no Exchange: in the plan text the join's
      // first child (the ivf_cells scan, printed directly below it) must
      // reach the bucket-aware FileScan without an intervening shuffle
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      val joinToScan = plan.substring(
        plan.indexOf("SortMergeJoin"), plan.indexOf("ivf_cells"))
      assert(!joinToScan.contains("Exchange"),
        s"corpus side of the probe join should not shuffle:\n$plan")

      val inMem = Similarity.ivfTopK(idx, queries, "vec_id", "qid",
        "embedding", k = 5, nProbe = 8)
      val a = probe.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = inMem.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b && a.size == 15)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS ivf_cells")
    }
  }

  test("saltedJoin equals the plain join and spreads the hot key") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "v", "tag")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = Partitioning.saltedJoin(big, small, "k", saltFactor = 8)
      .select("k", "v", "tag")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain && salted.nonEmpty)
    // the hot key's rows really occupy multiple sub-keys
    val salts = big.withColumn("__salt", (rand(42) * 8).cast("int"))
      .filter(col("k") === 7L).select("__salt").distinct().count()
    assert(salts >= 3, s"expected the hot key spread over >=3 of 8 sub-keys, got $salts")
    // a salt that cannot spread is rejected
    intercept[IllegalArgumentException](
      Partitioning.saltedJoin(big, small, "k", saltFactor = 1))
  }

  test("sortedLayout range-partitions and sorts within partitions") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val laid = Partitioning.sortedLayout(li, Seq("l_orderkey", "l_linenumber"), 4)
    import org.apache.spark.sql.Row
    val perPartSorted = laid.select("l_orderkey", "l_linenumber").rdd
      .mapPartitions { it =>
        val rows = it.map { case Row(a: Long, b: Int) => (a, b) }.toSeq
        Iterator.single(rows == rows.sorted)
      }.collect()
    assert(perPartSorted.forall(identity))
  }

  test("zValue interleaves bits") {
    import org.apache.spark.sql.functions._
    val r = spark.range(1).select(
      Partitioning.zValue(lit(3L), lit(1L)),
      Partitioning.zValue(lit(0L), lit(0L)),
      Partitioning.zValue(lit(65535L), lit(0L)),
      Partitioning.zValue(lit(0L), lit(65535L))).head()
    assert(r.getLong(0) == 7L)            // a=0b11 -> 0b0101; b=0b01 -> 0b0010
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 0x55555555L)   // all even bits
    assert(r.getLong(3) == 0xAAAAAAAAL)   // all odd bits
  }

  test("z-order layout bounds every file in BOTH dimensions; linear sort does not") {
    import org.apache.spark.sql.functions._
    val events = {
      graft.queries.Q.ensureNanosReadable(spark)
      spark.read.parquet(s"$sfDir/events.parquet").select("user_id", "value")
    }
    val nParts = 16
    val zdir = java.nio.file.Files.createTempDirectory("graftz").toString
    val ldir = java.nio.file.Files.createTempDirectory("graftl").toString
    Partitioning.zOrderLayout(events, "user_id", "value", nParts)
      .write.mode("overwrite").parquet(zdir)
    Partitioning.sortedLayout(events, Seq("user_id"), nParts)
      .write.mode("overwrite").parquet(ldir)

    // per-file min/max of `value` — exactly the stats parquet footers carry
    // and scans prune with
    def valueRanges(dir: String): Array[(Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min("value"), max("value"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))

    val vMin = events.agg(min("value")).head().getDouble(0)
    // value-only box: the bottom decile of the DATA (value is skewed, so 10%
    // of the range would cover ~half the rows and prove nothing)
    val boxHi = events.stat.approxQuantile("value", Array(0.1), 0.0).head

    val zr = valueRanges(zdir)
    val lr = valueRanges(ldir)
    val zHit = zr.count { case (lo, hi) => lo <= boxHi && hi >= vMin }
    val lHit = lr.count { case (lo, hi) => lo <= boxHi && hi >= vMin }
    // user_id-sorted files each span ~the whole value domain: no pruning
    assert(lHit == lr.length, s"expected no pruning under linear layout ($lHit/${lr.length})")
    // z-ordered files are value-bounded: most files skip the box entirely
    assert(zHit <= zr.length / 2, s"expected <=half the z files to intersect ($zHit/${zr.length})")
  }

  test("hilbert: bijective on the grid, consecutive indices ALWAYS adjacent (z is not)") {
    import graft.functions.HilbertIndex
    // enumerate the full 16x16 grid (bits=4): the curve must visit every
    // cell exactly once, and each step must move to a 4-neighbor — the
    // locality property the layout exists for. The Z curve provably
    // violates it (distance-3 jump at the 2x2 seam), asserted alongside
    // so the spec documents WHY hilbert earns its extra arithmetic.
    val cells = for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong, HilbertIndex.compute(x, y, 4))
    assert(cells.map(_._3).sorted == (0L until 256L), "must be a bijection")
    val byD = cells.map { case (x, y, d) => d -> (x, y) }.toMap
    for (d <- 0L until 255L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} jumps from ($x1,$y1) to ($x2,$y2)")
    }
    def zOf(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 4) z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      z
    }
    val zByD = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield zOf(x, y) -> (x, y)).toMap
    val zJumps = (0L until 255L).count { d =>
      val (x1, y1) = zByD(d); val (x2, y2) = zByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "the Z curve should jump at seams — that is the contrast")
    // codegen parity + fail-loud domain
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val df = cells.map { case (x, y, _) => (x, y) }.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        Partitioning.hilbertValue(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bits=16 vs the bits=4 reference: the 16x16 subgrid of the 2^16 grid
    // is NOT the same curve, so compare against compute(…, 16) instead
    for (((x, y), h) <- got)
      assert(h == HilbertIndex.compute(x, y, 16), s"codegen mismatch at ($x,$y)")
    val e = intercept[Exception] {
      Seq((70000L, 1L)).toDF("x", "y")
        .select(Partitioning.hilbertValue(col("x"), col("y"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("hilbert layout prunes the value box at least as well as z-order") {
    import org.apache.spark.sql.functions._
    val events = {
      graft.queries.Q.ensureNanosReadable(spark)
      spark.read.parquet(s"$sfDir/events.parquet").select("user_id", "value")
    }
    val nParts = 16
    val hdir = java.nio.file.Files.createTempDirectory("grafth").toString
    val zdir = java.nio.file.Files.createTempDirectory("graftz2").toString
    Partitioning.hilbertLayout(events, "user_id", "value", nParts)
      .write.mode("overwrite").parquet(hdir)
    Partitioning.zOrderLayout(events, "user_id", "value", nParts)
      .write.mode("overwrite").parquet(zdir)
    def valueRanges(dir: String): Array[(Double, Double)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min("value"), max("value"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val vMin = events.agg(min("value")).head().getDouble(0)
    val boxHi = events.stat.approxQuantile("value", Array(0.1), 0.0).head
    val hHit = valueRanges(hdir).count { case (lo, hi) => lo <= boxHi && hi >= vMin }
    val zr = valueRanges(zdir)
    val zHit = zr.count { case (lo, hi) => lo <= boxHi && hi >= vMin }
    assert(hHit <= zHit + 1, // +1: file-boundary noise at this tiny scale
      s"hilbert should prune at least as well as z ($hHit vs $zHit of ${zr.length})")
    assert(hHit <= zr.length / 2,
      s"hilbert files should be value-bounded ($hHit/${zr.length})")
  }

  test("row-group pruning measured through the reader: value-box scan reads fewer rows under z layout") {
    import org.apache.spark.sql.functions._
    val events = {
      graft.queries.Q.ensureNanosReadable(spark)
      spark.read.parquet(s"$sfDir/events.parquet").select("user_id", "value")
    }
    val nParts = 16
    val zdir = java.nio.file.Files.createTempDirectory("graftzrg").toString
    val ldir = java.nio.file.Files.createTempDirectory("graftlrg").toString
    Partitioning.zOrderLayout(events, "user_id", "value", nParts)
      .write.mode("overwrite").parquet(zdir)
    Partitioning.sortedLayout(events, Seq("user_id"), nParts)
      .write.mode("overwrite").parquet(ldir)
    val total = events.count()
    val boxHi = events.stat.approxQuantile("value", Array(0.1), 0.0).head

    // rows EMITTED BY THE SCAN (parquet row-group stats pruning + pushed
    // filter), not rows surviving the exact Filter — this is the metric
    // file layout actually moves. AQE off so the executed plan is direct.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scanned(dir: String): (Long, Long) = {
        val df = spark.read.parquet(dir).where(col("value") <= boxHi).select("value")
        val kept = df.collect().length.toLong
        val scans = df.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        (scans.map(_.metrics("numOutputRows").value).sum, kept)
      }
      val (zScanned, zKept) = scanned(zdir)
      val (lScanned, lKept) = scanned(ldir)
      assert(zKept == lKept, "both layouts return the same result")
      // linear layout sorted on user_id: every file's value range spans the
      // domain, no row group prunes, the reader materializes everything
      assert(lScanned == total, s"expected full scan under linear layout ($lScanned/$total)")
      // z layout: row groups outside the value box never leave the footer
      assert(zScanned <= total / 2,
        s"expected <=half the rows materialized under z layout ($zScanned/$total)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
}
