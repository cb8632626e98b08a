package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.{cosine, cosineFast, toDoubleVec}

/** The native CosineSimilarity expression vs the HOF reference form:
  * bit-identical results (same sequential accumulation), matching
  * null/edge semantics, and availability in the SQL dialect through
  * GraftExtensions. */
class ExpressionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("cosineFast is bit-identical to the HOF cosine on random vectors") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 300).map { i =>
      (i.toLong, Seq.fill(24)(rnd.nextGaussian()), Seq.fill(24)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        cosine($"a", $"b").as("hof"), cosineFast($"a", $"b").as("native"))
      .filter($"hof" =!= $"native" ||
        $"hof".isNull =!= $"native".isNull)
      .count()
    assert(diff == 0)
  }

  test("edge semantics: zero norm → 0.0, length mismatch → null, null elem → null") {
    val zero = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(cosineFast($"a", $"b")).as[Double].head()
    assert(zero == 0.0)
    val mism = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(cosineFast($"a", $"b")).as[Option[Double]].head()
    assert(mism.isEmpty)
    val nullElem = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
      .select(cosineFast($"a".cast("array<double>"), $"b".cast("array<double>")))
      .as[Option[Double]].head()
    assert(nullElem.isEmpty)
  }

  test("l2Norm/l2Distance: Pythagorean ground truth") {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(3.0, 0.0), Seq(0.0, 4.0))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.l2Norm(col("a")).as("na"),
      VectorFunctions.l2Distance(col("a"), col("b")).as("d")).head()
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("cosine_sim is registered in the SQL dialect via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.5D, 0.0D)) AS s").as[Double].head()
    assert(r == 1.0)
    val orth = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS s").as[Double].head()
    assert(orth == 0.0)
  }

  test("jaccard_sim equals the array_intersect/array_union composition") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong).distinct
      val b = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong).distinct
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        call_function("jaccard_sim", $"a", $"b").as("native"),
        (size(array_intersect($"a", $"b")).cast("double") /
          size(array_union($"a", $"b")).cast("double")).as("builtin"))
      .filter($"native" =!= $"builtin").count()
    assert(diff == 0)
    // set semantics on duplicated inputs; empty∪empty → 0.0
    val dup = Seq((Seq(1L, 1L, 2L), Seq(2L, 2L, 3L))).toDF("a", "b")
      .select(call_function("jaccard_sim", $"a", $"b")).as[Double].head()
    assert(dup == 1.0 / 3.0)
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(call_function("jaccard_sim", $"a", $"b")).as[Double].head()
    assert(empty == 0.0)
  }

  test("jaccard_sim_sorted equals jaccard_sim when the caller pre-sorts") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong)
      val b = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong)
      (a, b)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        call_function("jaccard_sim_sorted",
          array_sort($"a"), array_sort($"b")).as("sorted"),
        call_function("jaccard_sim", $"a", $"b").as("general"))
      .filter($"sorted" =!= $"general").count()
    assert(diff == 0)
    // same corner conventions as the general form
    val empty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(call_function("jaccard_sim_sorted", $"a", $"b")).as[Double].head()
    assert(empty == 0.0)
  }

  test("cosineFast agrees with DuckDB-style sequential dot product on floats") {
    // float→double widening then sequential fold — the q45/q53 shape
    val v1 = Seq(0.25f, -1.5f, 3.75f, 0.125f)
    val v2 = Seq(1.0f, 2.0f, -0.5f, 4.0f)
    val df = Seq((v1, v2)).toDF("a", "b")
    val got = df.select(cosineFast(toDoubleVec($"a"), toDoubleVec($"b")))
      .as[Double].head()
    val dot = v1.zip(v2).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(v2.map(x => x.toDouble * x.toDouble).sum)
    assert(got == dot / (na * nb))
  }

  test("nfc_clean: composes combining sequences, strips C0/C1, keeps structure and NFC-stable chars") {
    val cases = Seq(
      (1L, "plain ascii stays"),
      (2L, "é composes"),               // e + combining acute → é
      (3L, "Å ring"),                   // A + combining ring → Å
      (4L, "bel gone c1 gone"),
      (5L, "tab\tand\nnewline\rstay"),
      (6L, "ligature ﬁ survives NFC"),   // NFKC would fold it — must not
      (7L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = cases
      .select($"id", call_function("nfc_clean", $"s").as("c"))
      .orderBy($"id").select($"c").as[String].collect().toSeq
    assert(got == Seq(
      "plain ascii stays",
      "é composes",
      "Å ring",
      "bel gone c1 gone",
      "tab\tand\nnewline\rstay",
      "ligature ﬁ survives NFC",
      null))
    // interpreted path (eval) must equal the codegen'd column path
    import org.apache.spark.unsafe.types.UTF8String
    for ((_, s) <- cases.collect().map(r => (r.getLong(0), r.getString(1)))
         if s != null) {
      val viaKernel = graft.expressions.NfcClean
        .clean(UTF8String.fromString(s)).toString
      val viaSql = spark.sql(
        s"SELECT nfc_clean('${s.replace("'", "''")}')").head.getString(0)
      assert(viaKernel == viaSql, s"kernel/codegen drift on ${s.take(20)}")
    }
    // type check fires
    val e = intercept[Exception] {
      Seq(1).toDF("n").select(call_function("nfc_clean", $"n")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage.take(200))
  }

  test("no_inline: identity values, and the fenced projection blocks predicate pushdown") {
    import org.apache.spark.sql.functions.{call_function, lower, split}
    val df = Seq((1L, "Alpha Beta"), (2L, "Gamma"), (3L, null))
      .toDF("id", "s")
    // identity: values (incl. null) pass through unchanged
    val plain = df.select($"id", lower($"s").as("v")).collect().toSeq
    val fenced = df.select($"id", call_function("no_inline", lower($"s")).as("v"))
      .collect().toSeq
    assert(plain.sortBy(_.getLong(0)).toString ==
      fenced.sortBy(_.getLong(0)).toString)
    // pushdown fence: without it, Filter(cond(alias)) over Project is
    // rewritten by substituting the alias's defining expression into
    // the condition (the optimizer-level lambda-CSE trap, q103).
    // A parquet scan, not a local relation — ConvertToLocalRelation
    // would evaluate the whole plan away at optimize time.
    def filterLines(fence: Boolean): Seq[String] = {
      val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      val tok = split(lower($"text"), " ", -1)
      val proj = if (fence) call_function("no_inline", tok) else tok
      docs.select($"doc_id", proj.as("_tk"))
        .filter(org.apache.spark.sql.functions.size($"_tk") > 1)
        .queryExecution.optimizedPlan.toString
        .linesIterator.filter(_.contains("Filter")).toSeq
    }
    assert(filterLines(fence = false).exists(_.contains("split(")),
      "sanity: unfenced alias is substituted into the pushed filter")
    assert(!filterLines(fence = true).exists(_.contains("split(")),
      "fenced projection must keep the filter above the alias")
  }
}
