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
    val plain = big.join(small, "k")
    val salted = Partitioning.saltedJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.agg(sum("v")).head.getLong(0) == plain.agg(sum("v")).head.getLong(0))
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
}
