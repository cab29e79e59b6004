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
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      val build = (t1 - t0) / 1e9
      val exec = (t2 - t1) / 1e9
      if (build + exec > 1.0)
        println(f"SLOW $name: build $build%.2f s, exec $exec%.2f s")
    }
    spark.stop()
  }
}
