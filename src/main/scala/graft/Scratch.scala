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

    val names = Seq("q_dedup_ngram", "q_dedup_minhash", "q_ann_lsh",
      "q_ann_ivf", "q_sim_pairs", "q_knn")
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
