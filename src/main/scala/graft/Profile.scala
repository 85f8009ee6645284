package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (optimization rounds): run the named queries through the
  * bench's noop-sink methodology and print, for each, wall seconds plus
  * the scheduler-level shape — job count, stage count, task count, total
  * shuffle bytes read/written — so overhead-bound queries (many tiny
  * jobs) are distinguishable from compute-bound ones at a glance.
  *
  * Usage: runMain graft.Profile <sfDir> [query ...]   (default: all)
  * Same env contract as Bench (SPARK_GRAFT_CPUS).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // same warmup as Bench so first-query init cost stays out
    spark.range(1000000).selectExpr("sum(id) s").write.mode("overwrite").format("noop").save()
    try {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      r.join(org.apache.spark.sql.functions.broadcast(r.limit(1)), Seq("r_regionkey"))
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Exception => () }
    println(f"${"query"}%-28s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"shufR_MB"}%9s ${"shufW_MB"}%9s")
    names.foreach { n =>
      // settle the (async) listener bus so counts attribute to the right
      // query — there is no public flush, a short sleep suffices for a
      // dev-only profiling readout
      Thread.sleep(300)
      val (j0, s0, t0, r0, w0) = (jobs.get, stages.get, tasks.get, shufR.get, shufW.get)
      val ns0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[profile] $n failed: $e") }
      val sec = (System.nanoTime() - ns0) / 1e9
      Thread.sleep(300)
      println(f"$n%-28s $sec%7.2f ${jobs.get - j0}%5d ${stages.get - s0}%7d ${tasks.get - t0}%6d ${(shufR.get - r0) / 1e6}%9.1f ${(shufW.get - w0) / 1e6}%9.1f")
      System.gc()
    }
    spark.stop()
  }
}
