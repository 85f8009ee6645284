package graft.pipeline

import scala.concurrent.duration.{Duration, FiniteDuration}
import scala.util.control.NonFatal

/** Minimal orchestration semantics for [[EtlJob]], matching the policy the
  * reference declares on its DAG (dags/etl_dags.py:64-78,103): a linear
  * task chain (`produce >> consume >> upload`), per-task `retries = 1`,
  * and a fixed-cadence (`@daily`) schedule. The reference delegates all of
  * this to an external scheduler process; here the DAG SEMANTICS (order,
  * retry, upstream-failure skip) are library code — deterministic and
  * unit-testable — while the timer stays injectable, so production wires
  * one cron/k8s tick to [[EtlDag.runOnce]] (or calls
  * [[EtlDag.runScheduled]] with a real sleeper) and the sandbox tests
  * drive the same loop with a fake clock.
  */
final case class EtlTask(name: String, run: () => Unit)

/** Outcome of one task within a run: `attempts` counts executions
  * (≤ retries + 1); `skipped` mirrors Airflow's upstream_failed — the
  * task never ran because an earlier task exhausted its retries.
  */
final case class TaskResult(name: String, attempts: Int, succeeded: Boolean,
    skipped: Boolean, error: Option[Throwable])

final case class EtlRunReport(tasks: Seq[TaskResult]) {
  def succeeded: Boolean = tasks.forall(_.succeeded)
}

final class EtlDag(tasks: Seq[EtlTask], retries: Int = 1) {
  require(retries >= 0, "retries must be non-negative")

  /** One DAG run: tasks in declaration order, each retried up to
    * `retries` times; the first task to exhaust its retries fails the run
    * and every downstream task is recorded as skipped (never executed).
    */
  def runOnce(): EtlRunReport = {
    val results = Seq.newBuilder[TaskResult]
    var failed = false
    tasks.foreach { t =>
      if (failed) results += TaskResult(t.name, 0, succeeded = false,
        skipped = true, error = None)
      else {
        var attempts = 0
        var lastError: Option[Throwable] = None
        var ok = false
        while (!ok && attempts <= retries) {
          attempts += 1
          try { t.run(); ok = true; lastError = None }
          catch { case NonFatal(e) => lastError = Some(e) }
        }
        failed = !ok
        results += TaskResult(t.name, attempts, succeeded = ok,
          skipped = false, error = lastError)
      }
    }
    EtlRunReport(results.result())
  }

  /** Fixed-cadence loop (`@daily` ⇒ `every = 1.day`): `ticks` runs,
    * sleeping `every` between them through the injected sleeper. A failed
    * run does NOT stop the schedule — the next tick starts fresh, the
    * reference scheduler's behavior. Returns every run's report.
    */
  def runScheduled(every: FiniteDuration, ticks: Int,
      sleep: Duration => Unit): Seq[EtlRunReport] =
    (1 to ticks).map { i =>
      val report = runOnce()
      if (i < ticks) sleep(every)
      report
    }
}
