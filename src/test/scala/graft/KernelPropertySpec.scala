package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.JaccardUtil
import graft.operators.Multimodal

/** Randomized property checks over the pure JVM kernels — no Spark
  * session, hundreds of cases per property in milliseconds. Seeds are
  * fixed, so failures are reproducible, not flaky. */
class KernelPropertySpec extends AnyFunSuite {

  private def naiveJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val union = (sa ++ sb).size
    if (union == 0) 0.0 else (sa & sb).size.toDouble / union
  }

  test("JaccardUtil.jaccard == naive set Jaccard over 500 random cases") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 500) {
      // small value domain forces overlaps; sizes include 0 and 1
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(30).toLong)
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(30).toLong)
      val got = JaccardUtil.jaccard(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(got == naiveJaccard(a, b), s"a=$a b=$b")
    }
  }

  test("jaccardPresorted == jaccard when inputs are sorted, over 500 random cases") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 500) {
      val a = Seq.fill(rnd.nextInt(60))(rnd.nextInt(30).toLong).sorted
      val b = Seq.fill(rnd.nextInt(60))(rnd.nextInt(30).toLong).sorted
      val general = JaccardUtil.jaccard(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val presorted = JaccardUtil.jaccardPresorted(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      assert(presorted == general, s"a=$a b=$b")
    }
  }

  test("stubKernel: deterministic, dim-sized, [0,1) floats on random bytes") {
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 100) {
      val bytes = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      val f1 = Multimodal.stubKernel(8)(bytes)
      val f2 = Multimodal.stubKernel(8)(bytes)
      assert(f1.toSeq == f2.toSeq)
      assert(f1.length == 8 && f1.forall(v => v >= 0f && v < 1f))
    }
  }
}
