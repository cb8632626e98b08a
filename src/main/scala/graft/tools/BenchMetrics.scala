package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-pass resource accounting for [[graft.Bench]] — the
  * instrumentation VERDICT r12 item 1 asked for: the battery-context
  * timing inflation (q47 at 5–9 s in some full ~330-query batteries vs
  * 0.8 s isolated, with clean canaries, zero GC and no bisectable
  * reproduction) cannot be diagnosed from wall clock alone, because
  * wall clock doesn't say WHERE the time went. This splits every timed
  * pass into the layers that can each independently inflate:
  *
  *   - **task layer** (a [[SparkListener]] summing TaskMetrics):
  *     task count, executor run/CPU time, in-task GC, shuffle
  *     read/write bytes, memory/disk spill, input bytes. If run-time
  *     inflates with wall, the slowness is inside tasks; if the
  *     CPU/run fraction collapses, tasks are WAITING (scheduling, page
  *     faults, lock contention) rather than computing.
  *   - **JVM layer**: JIT compilation-time delta
  *     (CompilationMXBean — deopt/recompile storms from 330 queries'
  *     generated classes show up here), loaded-class delta, and the
  *     code-cache + metaspace occupancy LEVEL at pass end (a full code
  *     cache turns the sweeper on and de-JITs hot methods — the
  *     classic whole-process slowdown that leaves every other counter
  *     clean).
  *   - **OS layer**: `/proc/self/io` `read_bytes` delta — REAL block
  *     reads, i.e. page-cache misses. In local mode driver == all
  *     executors, so the process-wide number covers the whole pass. A
  *     battery that evicts the parquet page cache makes a mid-battery
  *     query re-read from disk what its isolated twin reads from RAM.
  *
  * Usage: one [[TaskAgg]] listener per SparkSession (registered by
  * Bench's buildSession); [[snapshot]] before/after each pass,
  * [[Snap.minus]] for the delta. Listener-bus delivery is async, so
  * [[quiesce]] polls the task counter to steadiness (bounded, ~10 ms
  * typical) before the closing snapshot — wall time is already taken
  * by then, so the poll never pollutes the timing it explains. */
object BenchMetrics {

  /** Task-metrics accumulator — register one per SparkSession. */
  final class TaskAgg extends SparkListener {
    val tasks = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val runMs = new AtomicLong(0)
    val cpuNs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val shufReadB = new AtomicLong(0)
    val shufWriteB = new AtomicLong(0)
    val spillB = new AtomicLong(0)
    val inputB = new AtomicLong(0)

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        tasks.incrementAndGet()
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillB.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        inputB.addAndGet(m.inputMetrics.bytesRead)
      }
    }
  }

  /** One cross-layer counter snapshot. Level fields (codeCacheMb,
    * metaspaceMb) are occupancy at snapshot time, not deltas —
    * [[Snap.minus]] keeps the LATER level. */
  final case class Snap(tasks: Long, stages: Long, runMs: Long,
                        cpuNs: Long, gcMs: Long,
                        shufReadB: Long, shufWriteB: Long, spillB: Long,
                        inputB: Long, jitMs: Long, classes: Long,
                        ioReadB: Long, codeCacheMb: Double,
                        metaspaceMb: Double) {
    def minus(prev: Snap): Snap = Snap(
      tasks - prev.tasks, stages - prev.stages, runMs - prev.runMs,
      cpuNs - prev.cpuNs,
      gcMs - prev.gcMs, shufReadB - prev.shufReadB,
      shufWriteB - prev.shufWriteB, spillB - prev.spillB,
      inputB - prev.inputB, jitMs - prev.jitMs, classes - prev.classes,
      ioReadB - prev.ioReadB, codeCacheMb, metaspaceMb)

    /** Fraction of executor run time that was ON-CPU — the single most
      * diagnostic ratio: ≈1 means tasks computed; low means tasks
      * waited (IO, scheduler, page faults, locks). -1 when no task ran. */
    def cpuFrac: Double =
      if (runMs <= 0) -1.0
      else math.min(9.99, (cpuNs / 1e6) / runMs.toDouble)

    /** Compact JSON array (see [[legend]]). */
    def json: String = {
      def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
      def r3(d: Double): Double = math.round(d * 1000) / 1000.0
      Seq(tasks.toString, stages.toString, runMs.toString,
        math.round(cpuNs / 1e6).toString, gcMs.toString,
        mb(shufReadB).toString, mb(shufWriteB).toString,
        mb(spillB).toString, mb(inputB).toString, jitMs.toString,
        classes.toString, mb(ioReadB).toString,
        r3(codeCacheMb).toString, r3(metaspaceMb).toString,
        r3(cpuFrac).toString).mkString("[", ",", "]")
    }
  }

  /** Field order of [[Snap.json]], stamped once into the artifact. */
  val legend: String = Seq("tasks", "stages", "run_ms", "cpu_ms",
    "task_gc_ms",
    "shuf_read_mb", "shuf_write_mb", "spill_mb", "input_mb", "jit_ms",
    "classes_loaded", "io_read_mb", "codecache_used_mb",
    "metaspace_used_mb", "cpu_frac")
    .map("\"" + _ + "\"").mkString("[", ",", "]")

  private def procSelfIoReadBytes(): Long =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/self/io")).asScala
        .collectFirst { case l if l.startsWith("read_bytes:") =>
          l.split(":")(1).trim.toLong }
        .getOrElse(-1L)
    } catch { case scala.util.control.NonFatal(_) => -1L }

  private def poolUsedMb(nameContains: String*): Double = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(p => nameContains.exists(p.getName.contains))
      .map(p => Option(p.getUsage).map(_.getUsed).getOrElse(0L))
      .sum / 1048576.0
  }

  def snapshot(agg: TaskAgg): Snap = {
    val comp = java.lang.management.ManagementFactory.getCompilationMXBean
    val jit = if (comp != null && comp.isCompilationTimeMonitoringSupported)
      comp.getTotalCompilationTime else -1L
    val cls = java.lang.management.ManagementFactory.getClassLoadingMXBean
      .getTotalLoadedClassCount
    Snap(agg.tasks.get(), agg.stages.get(), agg.runMs.get(),
      agg.cpuNs.get(), agg.gcMs.get(),
      agg.shufReadB.get(), agg.shufWriteB.get(), agg.spillB.get(),
      agg.inputB.get(), jit, cls, procSelfIoReadBytes(),
      poolUsedMb("CodeHeap", "Code Cache"), poolUsedMb("Metaspace"))
  }

  /** Wait (bounded) for the async listener bus to drain the pass's
    * task-end events: poll the task counter until two consecutive
    * 10 ms reads agree, cap 100 ms. Call AFTER the wall-clock stamp. */
  def quiesce(agg: TaskAgg): Unit = {
    var last = agg.tasks.get()
    var i = 0
    while (i < 10) {
      Thread.sleep(10)
      val cur = agg.tasks.get()
      if (cur == last) return
      last = cur
      i += 1
    }
  }

  /** One-line battery-vs-isolation diagnosis for a flagged row — the
    * sentence `taint_reason` could never carry: which layer inflated.
    * `b` is the battery min pass's delta, `iso` the isolated one.
    *
    * r14 (VERDICT r13 item 2): beside the per-layer numbers the line
    * now carries the WORK-SHAPE diff — task count, stage count and
    * shuffle-write bytes battery-vs-isolated — and closes with a
    * `shape:` verdict separating the two inflation families the
    * layer numbers alone could not (q148 in r13: 26.9× the
    * task-seconds at cpu_frac ~1.0 — more EXECUTION, not slower
    * execution):
    *   - `work_drift` — more task-seconds at healthy CPU fraction
    *     AND more tasks/stages/shuffle bytes: the battery execution
    *     genuinely did different work (AQE re-plan under a recycled
    *     session, re-derived shared materialization, memo miss);
    *   - `jit_pressure` — more task-seconds at healthy CPU across the
    *     SAME task/stage/byte shape, with the JIT layer implicating
    *     itself: compilation time ≥1.5× the isolated pass AND a LOWER
    *     code-cache level (the sweeper evicted compiled methods under
    *     a 350-query battery's class pressure, so hot paths re-ran
    *     interpreted/recompiling — r14's q218/q197/q201/q194 family:
    *     identical tasks/stages/bytes, cpu_frac ≈0.95, jit_ms ≈2×,
    *     code cache 130–155 MB vs 210+ MB isolated). Diagnostic, not
    *     a plan problem — do not "fix" the query (VERDICT r14 item 1);
    *   - `work_drift_in_task` — more task-seconds at healthy CPU
    *     across the SAME task/stage/byte shape with the JIT layer
    *     quiet: the same plan chewed more per task (a per-JVM memo
    *     rebuilt inside tasks);
    *   - `contention` — task-seconds inflated with the CPU fraction
    *     collapsed: tasks waited (external load, scheduler, faults);
    *   - `stall_outside_tasks` — wall inflated but task-seconds
    *     didn't: the gap sits between jobs (driver, GC pauses between
    *     stages, listener/planning), not in execution;
    *   - `gc` — the in-task GC delta dominates the inflation. */
  def diagnose(wallB: Double, b: Snap, wallI: Double, iso: Snap): String = {
    def ratio(x: Double, y: Double): String =
      if (y <= 0) "n/a" else f"${x / y}%.1fx"
    val parts = Seq(
      s"wall ${ratio(wallB, wallI)}",
      s"task_run ${ratio(b.runMs.toDouble, iso.runMs.toDouble)}",
      s"tasks ${b.tasks} vs ${iso.tasks}",
      s"stages ${b.stages} vs ${iso.stages}",
      f"shuf_write_mb ${b.shufWriteB / 1048576.0}%.1f vs ${iso.shufWriteB / 1048576.0}%.1f",
      f"cpu_frac ${b.cpuFrac}%.2f vs ${iso.cpuFrac}%.2f",
      s"jit_ms ${b.jitMs} vs ${iso.jitMs}",
      s"task_gc_ms ${b.gcMs} vs ${iso.gcMs}",
      f"io_read_mb ${b.ioReadB / 1048576.0}%.1f vs ${iso.ioReadB / 1048576.0}%.1f",
      f"codecache_mb ${b.codeCacheMb}%.0f vs ${iso.codeCacheMb}%.0f")
    def r(x: Long, y: Long): Double = if (y <= 0) -1.0 else x.toDouble / y
    val runR = r(b.runMs, iso.runMs)
    val wallR = if (wallI <= 0) -1.0 else wallB / wallI
    val moreWork = r(b.tasks, iso.tasks) >= 1.5 ||
      r(b.stages, iso.stages) >= 1.5 ||
      r(b.shufWriteB, iso.shufWriteB) >= 1.5 ||
      r(b.inputB, iso.inputB) >= 1.5
    val cpuHealthy = b.cpuFrac >= 0.8 ||
      (iso.cpuFrac > 0 && b.cpuFrac >= 0.85 * iso.cpuFrac)
    val gcDominant = b.gcMs - iso.gcMs > 0 &&
      (b.gcMs - iso.gcMs) >= 0.4 * math.max(b.runMs - iso.runMs, 1L)
    // the JIT layer implicating itself (r15): compile time inflated
    // AND the code-cache LEVEL dropped — eviction, not growth
    val jitPressure = r(b.jitMs, iso.jitMs) >= 1.5 &&
      iso.codeCacheMb > 0 && b.codeCacheMb <= 0.85 * iso.codeCacheMb
    val shape =
      if (runR < 0 || wallR < 0) "n/a"
      else if (gcDominant && runR >= 1.5) "gc"
      else if (runR >= 2.0 && cpuHealthy && moreWork) "work_drift"
      else if (runR >= 2.0 && cpuHealthy && jitPressure) "jit_pressure"
      else if (runR >= 2.0 && cpuHealthy) "work_drift_in_task"
      else if (runR >= 1.5) "contention"
      else if (wallR >= 1.5) "stall_outside_tasks"
      else "unremarkable"
    (parts :+ s"shape: $shape").mkString("; ")
  }
}
