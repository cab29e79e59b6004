package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named queries into
  * `plans/r15/<query>_<tag>.txt` — the optimization round's before/after
  * plan evidence. Usage:
  * `sbt "Test/runMain graft.OptPlans <tag> q_a,q_b[,...]"` (test scope)
  * (SPARK_GRAFT_SF_DIR defaults to sf0.1 like Bench; the session mirrors
  * Bench's conf so the plans are the ones the bench actually runs.)
  */
object OptPlans {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
        val txt = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"[plans] wrote $outDir/${name}_$tag.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[plans] $name FAILED: ${e.getMessage}")
      }
      graft.queries.TextOps.clearCaches()
      graft.queries.VectorOps.clearCaches()
    }
    spark.stop()
  }
}
