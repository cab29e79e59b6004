package graft

import org.apache.spark.sql.SparkSession

/** Task-metrics capture shared by [[Bench]] and [[ScaleBench]]: one
  * listener summing shuffle-WRITE bytes and input (scan) records, plus
  * the listener-bus drain both harnesses need so a sample's last tasks
  * land in ITS measurement window, not the next one's. Shuffle bytes are
  * a property of the PLAN — immune to the host contention that makes
  * wall-clock comparisons need a rerun pass; records-read is the
  * decisive metric for incremental-vs-recompute A/Bs whose work is
  * map-side (shuffle ~0 on both sides). The drain reaches a private API
  * via reflection with a sleep fallback — this is measurement code.
  */
final class ShuffleMeter(spark: SparkSession) {

  val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
  val inputRecords = new java.util.concurrent.atomic.AtomicLong(0L)

  spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputRecords.addAndGet(m.inputMetrics.recordsRead)
        ()
      }
    }
  })

  def drain(): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods.find(x =>
        x.getName == "waitUntilEmpty" && x.getParameterCount == 0)
        .foreach(_.invoke(bus))
    } catch { case scala.util.control.NonFatal(_) => Thread.sleep(200) }
}
