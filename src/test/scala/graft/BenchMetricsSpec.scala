package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.BenchMetrics
import graft.tools.BenchMetrics.Snap

/** The taint-diagnosis shape classifier (r14 — VERDICT r13 item 2):
  * synthetic battery-vs-isolated counter deltas must land in the
  * right inflation family, because the artifact's `taint_diag` line
  * is what the judge (and a future debugging session) reads INSTEAD
  * of re-running the battery. Each case is a caricature of a shape
  * observed in a real round. */
class BenchMetricsSpec extends AnyFunSuite {

  private def snap(tasks: Long = 100, stages: Long = 5, runMs: Long = 1000,
                   cpuFrac: Double = 0.95, gcMs: Long = 0,
                   shufWriteB: Long = 50L << 20,
                   inputB: Long = 200L << 20, jitMs: Long = 0,
                   codeCacheMb: Double = 50.0): Snap =
    Snap(tasks = tasks, stages = stages, runMs = runMs,
      cpuNs = (runMs * cpuFrac * 1e6).toLong, gcMs = gcMs,
      shufReadB = 0, shufWriteB = shufWriteB, spillB = 0,
      inputB = inputB, jitMs = jitMs, classes = 0, ioReadB = 0,
      codeCacheMb = codeCacheMb, metaspaceMb = 100.0)

  private def shapeOf(diag: String): String =
    diag.split("shape: ").last

  test("q148's r13 shape: many× task-seconds at full CPU across more tasks = work_drift") {
    // battery did 26.9× the task-seconds with 3× the tasks at
    // cpu_frac ~1.0 — more EXECUTION, not slower execution
    val iso = snap()
    val bat = snap(tasks = 300, stages = 15, runMs = 26900,
      shufWriteB = 200L << 20)
    assert(shapeOf(BenchMetrics.diagnose(13.8, bat, 0.66, iso)) ==
      "work_drift")
  }

  test("same task/stage/byte shape but more task-seconds at full CPU = work_drift_in_task") {
    // a per-JVM memo rebuilt INSIDE tasks: same plan, each task chews
    // more
    val iso = snap()
    val bat = snap(runMs = 4000)
    assert(shapeOf(BenchMetrics.diagnose(4.0, bat, 1.0, iso)) ==
      "work_drift_in_task")
  }

  test("q218's r14 shape: same task shape, jit 2x and a LOWER code-cache level = jit_pressure") {
    // r14's biggest adjudicated bucket: identical tasks/stages/bytes,
    // cpu_frac ~0.95, jit_ms ~2x, code cache 140 MB vs 210 MB isolated
    // — JIT recompilation / code-cache eviction under the battery, not
    // plan drift (VERDICT r14 item 1)
    val iso = snap(jitMs = 30000, codeCacheMb = 210.0)
    val bat = snap(runMs = 6700, jitMs = 62000, codeCacheMb = 140.0)
    assert(shapeOf(BenchMetrics.diagnose(16.2, bat, 2.4, iso)) ==
      "jit_pressure")
    // the same inflation with the JIT layer quiet stays work_drift_in_task
    val batQuiet = snap(runMs = 6700, jitMs = 31000, codeCacheMb = 210.0)
    assert(shapeOf(BenchMetrics.diagnose(16.2, batQuiet, 2.4, iso)) ==
      "work_drift_in_task")
    // a GROWN code cache (more compiled code, no eviction) is not
    // pressure either — eviction is the distinguishing sign
    val batGrown = snap(runMs = 6700, jitMs = 62000, codeCacheMb = 230.0)
    assert(shapeOf(BenchMetrics.diagnose(16.2, batGrown, 2.4, iso)) ==
      "work_drift_in_task")
  }

  test("task-seconds inflated with the CPU fraction collapsed = contention") {
    val iso = snap(cpuFrac = 0.95)
    val bat = snap(runMs = 3000, cpuFrac = 0.40)
    assert(shapeOf(BenchMetrics.diagnose(3.0, bat, 1.0, iso)) ==
      "contention")
  }

  test("wall inflated while task-seconds did not = stall_outside_tasks") {
    val iso = snap()
    val bat = snap(runMs = 1100)
    assert(shapeOf(BenchMetrics.diagnose(4.0, bat, 1.0, iso)) ==
      "stall_outside_tasks")
  }

  test("the in-task GC delta dominating the run delta = gc") {
    val iso = snap(gcMs = 50)
    val bat = snap(runMs = 3000, gcMs = 1500)
    assert(shapeOf(BenchMetrics.diagnose(3.0, bat, 1.0, iso)) == "gc")
  }

  test("nothing inflated = unremarkable; the numbers ride along either way") {
    val iso = snap()
    val bat = snap(runMs = 1100)
    val diag = BenchMetrics.diagnose(1.1, bat, 1.0, iso)
    assert(shapeOf(diag) == "unremarkable")
    // the work-shape diff the judge asked for is in the line itself
    assert(diag.contains("tasks 100 vs 100"))
    assert(diag.contains("stages 5 vs 5"))
    assert(diag.contains("shuf_write_mb"))
  }
}
