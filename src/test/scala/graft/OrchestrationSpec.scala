package graft

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{EtlDag, EtlRunReport, EtlTask}

/** The reference DAG's declared policy (retries=1, linear order, @daily),
  * pinned as library semantics: retry-then-succeed, exhaust-then-skip-
  * downstream, and a schedule loop that survives failed runs. Pure JVM —
  * no Spark session needed.
  */
class OrchestrationSpec extends AnyFunSuite {

  private def counter(): (() => Int, () => Unit) = {
    var n = 0
    (() => n, () => { n += 1 })
  }

  test("a task that fails once succeeds on its retry (retries=1)") {
    var calls = 0
    val flaky = EtlTask("consume", () => {
      calls += 1
      if (calls == 1) sys.error("broker hiccup")
    })
    val report = new EtlDag(Seq(flaky), retries = 1).runOnce()
    assert(report.succeeded)
    assert(report.tasks.head.attempts === 2)
  }

  test("exhausted retries fail the run and skip downstream tasks") {
    val (upCount, upRun) = counter()
    val always = EtlTask("produce", () => sys.error("db down"))
    val down = EtlTask("upload", upRun)
    val report = new EtlDag(Seq(always, down), retries = 1).runOnce()
    assert(!report.succeeded)
    val Seq(p, u) = report.tasks
    assert(p.attempts === 2 && !p.succeeded && p.error.isDefined)
    assert(u.skipped && u.attempts === 0)
    assert(upCount() === 0, "downstream must never execute")
  }

  test("tasks run in declaration order, once each on the happy path") {
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val dag = new EtlDag(Seq("produce", "consume", "upload").map(n =>
      EtlTask(n, () => order += n)))
    assert(dag.runOnce().succeeded)
    assert(order.toSeq === Seq("produce", "consume", "upload"))
  }

  test("@daily schedule: N ticks, cadence through the injected sleeper, failed runs don't stop it") {
    var runs = 0
    val slept = scala.collection.mutable.ArrayBuffer.empty[Duration]
    // retries=0 ⇒ run 2's single attempt fails the whole run
    val dag = new EtlDag(Seq(EtlTask("produce", () => {
      runs += 1
      if (runs == 2) sys.error("transient")
    })), retries = 0)
    val reports: Seq[EtlRunReport] =
      dag.runScheduled(1.day, ticks = 3, sleep = slept += _)
    assert(reports.length === 3)
    assert(slept.toSeq === Seq(1.day, 1.day), "sleeps BETWEEN runs only")
    assert(reports.map(_.succeeded) === Seq(true, false, true),
      "a failed run must not stop the schedule")
  }
}
