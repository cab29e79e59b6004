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
