package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

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

    val jit = ManagementFactory.getCompilationMXBean
    def codeCacheMb: Double = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.contains("CodeHeap")).map(_.getUsage.getUsed / 1e6).sum

    val results = SparkEntry.queries.map { case (name, fn) =>
      val j0 = jit.getTotalCompilationTime
      val t0 = System.nanoTime()
      try fn(spark, d).count() catch { case e: Throwable => println(s"ERR $name: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      val dj = jit.getTotalCompilationTime - j0
      if (dt > 1.0) println(f"SLOW $name: $dt%.2f s (jit ${dj}ms, codecache ${codeCacheMb}%.0f MB)")
      name -> dt
    }
    println(f"TOTAL ${results.values.sum}%.1f s, final codecache ${codeCacheMb}%.0f MB")
    spark.stop()
  }
}
