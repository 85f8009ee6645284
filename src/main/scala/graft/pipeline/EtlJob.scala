package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.Sessions

/** Runnable end-to-end replacement for the reference's 3-task Airflow DAG
  * (dags/etl_dags.py:103 — produce >> consume >> upload), with parquet
  * directories standing in for MySQL/Kafka/S3 (the sandbox has no broker;
  * swap [[KafkaIO]]/[[JdbcIO]] calls in on a real deployment):
  *
  *   E1 produce: seeded generator → wire frame (projection, decimal→
  *      double, JSON) → "topic".
  *   E2 consume: streaming drain of the topic with AvailableNow +
  *      checkpoint (the drain-then-stop semantics the reference's
  *      never-terminating loop wanted) → decimal re-round → "sink".
  *   E3 upload: sink → single-JSON-array export (reference K3 semantics).
  *
  * The chain runs under [[EtlDag]] with the reference DAG's declared
  * policy (retries=1, downstream skip on exhausted retries,
  * dags/etl_dags.py:70-77); `@daily` is one [[EtlDag.runScheduled]] tick
  * per day on a real deployment.
  *
  * Usage: runMain graft.pipeline.EtlJob [nRows] [workDir]
  */
object EtlJob {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000L)
    val work = args.lift(1).getOrElse(Files.createTempDirectory("graft_etl").toString)
    val (topic, sink, ckpt, export) =
      (s"$work/topic", s"$work/sink", s"$work/ckpt", s"$work/etl_output")
    val spark = Sessions.local("graft-etl")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    val produce = EtlTask("produce", () =>
      CustomerPipeline.toKafkaFrame(CustomerPipeline.generate(spark, n))
        .write.mode("overwrite").parquet(topic))

    // consume: drain backlog exactly once, then stop. The batch write is
    // IDEMPOTENT — overwrite keyed by batchId — because foreachBatch is
    // at-least-once on restart: with EtlDag retrying this task, a crash
    // between the parquet append and the checkpoint commit would replay
    // the batch and silently duplicate rows in an append-mode sink.
    val consume = EtlTask("consume", () => {
      val stream = spark.readStream
        .schema(spark.read.parquet(topic).schema)
        .parquet(topic)
      val q = KafkaIO.drainTo(stream, ckpt) { (batch, id) =>
        CustomerPipeline.fromKafkaFrame(batch)
          .write.mode("overwrite").parquet(s"$sink/batch=$id")
      }.start()
      q.awaitTermination()
    })

    // upload: single JSON array object, like the reference's
    // put_object of etl_output.json (exportJsonArray projects the
    // customer schema by name, so the sink's batch=N layout column
    // never reaches the export)
    val upload = EtlTask("upload", () =>
      CustomerPipeline.exportJsonArray(spark.read.parquet(sink))
        .coalesce(1).write.mode("overwrite").text(export))

    val report = new EtlDag(Seq(produce, consume, upload), retries = 1).runOnce()
    report.tasks.foreach(r => println(
      s"[etl] task=${r.name} attempts=${r.attempts} " +
        s"${if (r.skipped) "SKIPPED" else if (r.succeeded) "ok" else "FAILED"}"))
    if (!report.succeeded) { spark.stop(); sys.exit(1) }

    val rows = spark.read.parquet(sink).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val sample = spark.read.parquet(sink).drop("batch")
      .orderBy(col("id")).limit(3).collect()
    println(f"[etl] $rows rows through produce->consume->export in $secs%.1fs " +
      f"(${rows / secs}%.0f rows/s end-to-end); sink=$sink export=$export")
    sample.foreach(r => println(s"[etl] sample: $r"))
    spark.stop()
  }
}
