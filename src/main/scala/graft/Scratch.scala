package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names = Seq("q_range_join", "q_dedup_verified", "q_tpch_q1", "q_tpch_q12", "q_tpch_q14")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"  $name%-20s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
