package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.CodegenErrorCapture

/** Whole-stage-codegen health sweep (VERDICT r7 item 6): EXECUTE every
  * registered query at sf0.001 and fail if any execution logs a
  * codegen compile error. Spark makes this failure silent by design —
  * Janino rejects the generated `processNext()`, `WholeStageCodegenExec`
  * logs one ERROR and falls back to interpreted eval, results stay
  * correct and 10–50× slower (r7 caught the PQ ADC LUT build doing
  * exactly this on every execution of a serving path; the encode-side
  * twin cost 16 s vs 1.1 s at sf0.1 before its restructure). Plans
  * must be BUILT AND RUN here: compilation happens lazily at first
  * execution, so a plan-shape assertion alone cannot see it.
  *
  * The per-query attribution (count delta around each `.count()`)
  * names the offender instead of leaving a 200-query battery to
  * bisect. sbt runs suites sequentially in the one forked test JVM
  * (`testForkedParallel` default), so deltas cannot cross-talk. */
class CodegenHealthSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query's execution logs a codegen compile error") {
    val offenders = scala.collection.mutable.ListBuffer[(String, Int)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val (_, errs) = CodegenErrorCapture.measuring {
        fn(spark, sfDir).count()
      }
      if (errs > 0) offenders += ((name, errs))
    }
    assert(offenders.isEmpty,
      s"codegen compile errors (query -> count): ${offenders.toList}; " +
        s"samples: ${CodegenErrorCapture.sampleMessages().mkString(" || ")}")
  }
}
