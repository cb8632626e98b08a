package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** The shuffle-shaping levers actually shape plans: salted joins
  * produce identical results while spreading hot keys, and bucketed
  * tables join with zero exchanges. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key") {
    // 90% of fact rows share key 1
    val fact = (0L until 2000L)
      .map(i => (if (i % 10 == 0) i % 7 + 2 else 1L, i, s"p$i"))
      .toDF("k", "row_id", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "dim_val")
    val plain = fact.join(dim, Seq("k"))
      .select($"row_id", $"dim_val").as[(Long, String)].collect().toSet
    val salted = ScaleOps.saltedJoin(fact, dim, "k", $"row_id", numSalts = 8)
      .select($"row_id", $"dim_val").as[(Long, String)].collect().toSet
    assert(salted == plain)
    // the salt genuinely participates in the join partitioning
    val plan = ScaleOps.saltedJoin(fact, dim, "k", $"row_id", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt"), "salt column missing from the plan")
  }

  test("intervalJoin equals the nested-loop reference; boundaries half-open; pairs unique") {
    val rnd = new scala.util.Random(59)
    // points 0..9999; intervals of mixed length incl. multi-cell
    // spans, exact-boundary endpoints, and degenerate (empty) ones
    val points = (0 until 400)
      .map(i => (i.toLong, rnd.nextInt(10000).toLong)).toDF("pid", "p")
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(9500).toLong
      val len = rnd.nextInt(3) match {
        case 0 => 0L                       // degenerate: matches nothing
        case 1 => rnd.nextInt(40).toLong   // sub-cell
        case _ => 300L + rnd.nextInt(900)  // spans multiple 256-cells
      }
      (i.toLong, s, s + len)
    } :+ ((60L, 256L, 512L))               // exact cell-aligned window
    val ivDf = ivs.toDF("iid", "s", "e")
    val got = ScaleOps.intervalJoin(points, ivDf, "p", "s", "e",
        bucketWidth = 256L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    val pts = points.as[(Long, Long)].collect().toSeq
    val want = for {
      (pid, p) <- pts
      (iid, s, e) <- ivs
      if p >= s && p < e
    } yield (pid, iid)
    assert(got.sorted == want.sorted,
      "bucketed join must equal the nested-loop definition exactly")
    assert(got.size == got.toSet.size, "a qualifying pair must appear once")
    // point AT start is in; point AT end is out (half-open)
    val bp = Seq((0L, 256L), (1L, 512L)).toDF("pid", "p")
    val bi = Seq((0L, 256L, 512L)).toDF("iid", "s", "e")
    val bGot = ScaleOps.intervalJoin(bp, bi, "p", "s", "e", 256L)
      .select($"pid").as[Long].collect().toSeq
    assert(bGot == Seq(0L))
    // the plan is an equi-join on the cell — never a nested loop
    val plan = ScaleOps.intervalJoin(points, ivDf, "p", "s", "e", 256L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n${plan.take(500)}")
    intercept[IllegalArgumentException] {
      ScaleOps.intervalJoin(points, ivDf, "p", "s", "e", 0L)
    }
  }

  test("skewReport: exact counts, ppm shares, ceiling salts, board order") {
    // 60 'hot', 30 'warm', 10 'cold' rows: total 100
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      Seq.fill(10)("cold")).zipWithIndex.toDF("k", "i")
    val got = ScaleOps.skewReport(df, "k", targetRowsPerTask = 25L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("hot", 60L, 600000L, 3L), // ceil(60/25) = 3
      ("warm", 30L, 300000L, 2L),
      ("cold", 10L, 100000L, 1L)), got)
    // topN bounds the board; ties break key-asc
    val tied = (Seq.fill(5)("b") ++ Seq.fill(5)("a")).zipWithIndex
      .toDF("k", "i")
    val t = ScaleOps.skewReport(tied, "k", 100L, topN = 1)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(t == Seq(("a", 5L, 500000L, 1L)), t)
    // the census/scalar decomposition never plans a Window
    val plan = ScaleOps.skewReport(df, "k", 25L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"skewReport planned a window:\n$plan")
    intercept[IllegalArgumentException] { ScaleOps.skewReport(df, "k", 0L) }
    intercept[IllegalArgumentException] {
      ScaleOps.skewReport(df, "k", 1L, topN = 0) }
  }

  test("bucketed tables join with no shuffle exchange") {
    val a = (0L until 1000L).map(i => (i % 100, i)).toDF("k", "va")
    val b = (0L until 1000L).map(i => (i % 100, i * 2)).toDF("k", "vb")
    ScaleOps.writeBucketed(a, "graft_bucket_a", "k", 8)
    ScaleOps.writeBucketed(b, "graft_bucket_b", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 10000) // 100 keys × 10 × 10
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("associationRules: hand-computed confidence and staged lift") {
    // baskets: {1:A,B}, {2:A,B}, {3:A,C}, {4:B} with a dup row; N=4
    // c(A)=3 c(B)=3 c(C)=1; c(A,B)=2 both directions; c(A,C)=1
    val b = Seq((1L, "A"), (1L, "B"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B")).toDF("bid", "item")
    val got = graft.operators.Association
      .associationRules(b, "bid", "item", minPairSupport = 2L, topN = 10)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    // A->B: conf = 2e6 div 3 = 666666; lift = 666666*4 div 3 = 888888
    // B->A: conf = 666666; lift = 888888 — ties break (ante, cons)
    assert(got == Seq(
      ("A", "B", 2L, 3L, 3L, 666666L, 888888L),
      ("B", "A", 2L, 3L, 3L, 666666L, 888888L)), got)
    // support floor prunes the A-C pair entirely
    assert(!got.exists(r => r._1 == "C" || r._2 == "C"))
    intercept[IllegalArgumentException] {
      graft.operators.Association.associationRules(b, "bid", "item", 0L, 5) }
    intercept[IllegalArgumentException] {
      graft.operators.Association.associationRules(b, "bid", "item", 1L, 0) }
  }

  test("scd2Join picks the version covering each fact date; outside-span facts drop") {
    val hist = Seq(
      (1L, "v1", 100L, 200L), (1L, "v2", 200L, 300L),
      (2L, "w1", 0L, 1000L)
    ).toDF("k", "ver", "f", "t")
    val facts = Seq((1L, 150L), (1L, 200L), (1L, 299L), (1L, 300L),
      (2L, 500L), (3L, 150L)).toDF("k", "d")
    val got = ScaleOps.scd2Join(facts, hist, "k", "d", "f", "t")
      .select($"k", $"d", $"ver").as[(Long, Long, String)]
      .collect().toSet
    assert(got === Set((1L, 150L, "v1"), (1L, 200L, "v2"),
      (1L, 299L, "v2"), (2L, 500L, "w1")))
  }

  test("scd2Overlaps flags overlapping versions and passes a clean history") {
    val clean = Seq((1L, 100L, 200L), (1L, 200L, 300L),
      (2L, 0L, 50L)).toDF("k", "f", "t")
    assert(ScaleOps.scd2Overlaps(clean, "k", "f", "t").count() === 0)
    val dirty = clean.union(Seq((1L, 150L, 250L)).toDF("k", "f", "t"))
    assert(ScaleOps.scd2Overlaps(dirty, "k", "f", "t").count() > 0)
  }

  test("compactSmallFiles: content preserved, big files copied byte-identical, debris collapsed") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_spec_").toString
    val inDir = root + "/in"
    // one BIG file (50k rows) + 8 kilobyte debris files, landed as
    // separate writes the way a streaming ingest accumulates them
    val bigTmp = root + "/bigtmp"
    (0L until 50000L).map(i => (i, s"payload_$i")).toDF("id", "p")
      .coalesce(1).write.parquet(bigTmp)
    val smallTmp = root + "/smalltmp"
    (100000L until 100160L).map(i => (i, s"tiny_$i")).toDF("id", "p")
      .repartition(8).write.parquet(smallTmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(inDir))
    var n = 0
    Seq(bigTmp, smallTmp).foreach { src =>
      fs.listStatus(new org.apache.hadoop.fs.Path(src))
        .filter(_.getPath.getName.endsWith(".parquet")).foreach { st =>
          n += 1
          org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
            new org.apache.hadoop.fs.Path(inDir, f"part-$n%05d.parquet"),
            false, spark.sparkContext.hadoopConfiguration)
        }
    }
    val bigLen = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .map(_.getLen).max
    val outDir = root + "/out"
    val report = ScaleOps.compactSmallFiles(spark, inDir, outDir,
      smallBytes = bigLen, targetBytes = 1L << 22).collect().head
    assert(report.getLong(0) === 8L) // debris compacted
    assert(report.getLong(1) === 1L) // big file copied
    assert(report.getLong(2) < 9L)   // layout collapsed
    // content equality
    val before = spark.read.parquet(inDir)
      .collect().map(_.toSeq).toSet
    val after = spark.read.parquet(outDir)
      .collect().map(_.toSeq).toSet
    assert(after === before)
    // the big file rode along byte-identical, never re-encoded
    val bigOut = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen)
    assert(bigOut.contains(bigLen))
  }

  test("zOrder2: hand-computed interleaves") {
    val rows = Seq((3L, 1L), (0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L))
      .toDF("a", "b")
      .select(ScaleOps.zOrder2(col("a"), col("b"), 10).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(a,b): bit i of a -> 2i, bit i of b -> 2i+1
    // (3,1): a bits {0,1} -> 1+4=5; b bit {0} -> 2 => 7
    assert(rows === Seq(7L, 0L, 1L, 2L, (1L << 20) - 1))
  }

  test("zOrderWrite: per-file z-ranges are disjoint and ordered") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zorder_").toString
    val df = (0 until 4096).map(i => (i % 64, (i * 7) % 64))
      .toDF("x", "y")
    ScaleOps.zOrderWrite(df, dir, "x", "y", bits = 6, numFiles = 8)
    val z = ScaleOps.zOrder2(pmod(col("x").cast("long"), lit(64L)),
      pmod(col("y").cast("long"), lit(64L)), 6)
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), z.as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(perFile.length > 1)
    perFile.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB)
      case _ =>
    }
    // pruning proxy: a narrow z-band intersects few files' ranges
    val (zLo, zHi) = (perFile.head._1, perFile.head._2)
    val touched = perFile.count { case (lo, hi) => hi >= zLo && lo <= zHi }
    assert(touched < perFile.length)
  }
}
