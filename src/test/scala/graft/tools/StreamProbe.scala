package graft

import org.apache.spark.sql.SparkSession

/** Temporary measurement tool (optimization round): runs one named query
  * while a daemon thread samples executor-task stacks every second, so the
  * per-task seconds inside streaming micro-batches can be attributed.
  * Delete or keep — not part of the driver contract.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_PROBE_CONF").foreach { kvs =>
      kvs.split(";").map(_.split("=", 2)).foreach {
        case Array(k, v) => spark.conf.set(k, v); println(s"[probe] set $k=$v")
        case _ => ()
      }
    }
    val sampler = new Thread(() => {
      while (true) {
        Thread.sleep(1000)
        val counts = scala.collection.mutable.Map.empty[String, Int]
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if ((t.getName.startsWith("Executor task launch") ||
              t.getName.startsWith("stream execution thread") ||
              t.getName == "main") && st.nonEmpty) {
            // signature: topmost 3 interesting frames
            val sig = st.iterator
              .filter(f => f.getClassName.startsWith("org.apache") ||
                f.getClassName.startsWith("graft") ||
                f.getClassName.startsWith("java.io") ||
                f.getClassName.startsWith("java.util.zip") ||
                f.getClassName.startsWith("sun.nio"))
              .take(4)
              .map(f => s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}:${f.getLineNumber}")
              .mkString(" <- ")
            val tag = if (t.getName.startsWith("Executor")) "exec"
              else if (t.getName == "main") "main" else "strm"
            counts(s"[$tag] $sig") = counts.getOrElse(s"[$tag] $sig", 0) + 1
          }
        }
        if (counts.nonEmpty) {
          println("---- sample ----")
          counts.toSeq.sortBy(-_._2).take(8)
            .foreach { case (s, n) => println(f"  $n%3d  $s") }
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
