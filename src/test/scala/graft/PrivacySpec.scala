package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Privacy

/** k-anonymity suppression semantics (the column-expression scrubbers
  * are gated by the q71 oracle). */
class PrivacySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("kAnonymize: small quasi groups suppress, large ones survive") {
    val df = Seq(
      ("en", "web", 1L), ("en", "web", 2L), ("en", "web", 3L),
      ("fr", "web", 4L),                    // singleton group
      ("en", "book", 5L), ("en", "book", 6L)
    ).toDF("lang", "source", "id")
    val k2 = Privacy.kAnonymize(df, Seq("lang", "source"), k = 2)
      .as[(String, String, Long)].collect()
      .map { case (l, s, i) => i -> ((l, s)) }.toMap
    assert(k2(4L) == (("*", "*")), k2.toString)
    assert(k2(1L) == (("en", "web")) && k2(5L) == (("en", "book")))
    // k=1: nothing suppressed; non-quasi columns untouched
    val k1 = Privacy.kAnonymize(df, Seq("lang", "source"), k = 1)
      .as[(String, String, Long)].collect().toSet
    assert(k1 == df.as[(String, String, Long)].collect().toSet)
    // k beyond every group: all rows collapse into the mask tuple
    val k9 = Privacy.kAnonymize(df, Seq("lang", "source"), k = 9)
      .select($"lang", $"source").distinct()
      .as[(String, String)].collect().toSeq
    assert(k9 == Seq(("*", "*")))
    // null quasi values fail CLOSED: the row suppresses
    val withNull = Seq((Option("en"), Option("web"), 1L),
      (Option("en"), Option("web"), 2L), (Option.empty[String], Option("web"), 3L))
      .toDF("lang", "source", "id")
    val nn = Privacy.kAnonymize(withNull, Seq("lang", "source"), k = 1)
      .as[(String, String, Long)].collect()
      .map { case (l, s, i) => i -> ((l, s)) }.toMap
    assert(nn(3L) == (("*", "*")), nn.toString)
    assert(nn(1L) == (("en", "web")))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(df, Seq.empty, k = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymize(df, Seq("lang"), k = 0)
    }
  }
}
