package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DatasetOps

/** Properties of the dataset-assembly operators: hash-split stability
  * (the whole point over rand()) and planted-contamination recovery. */
class DatasetOpsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("tableFingerprint: layout-invariant, one changed row flips exactly one bucket, null sentinel") {
    val base = (0L until 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    def fp(df: org.apache.spark.sql.DataFrame) = DatasetOps
      .tableFingerprint(df, Seq(col("id"), col("v")), nBuckets = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = fp(base)
    assert(a.map(_._2).sum == 2000L)
    // identical content, different physical layout → identical fingerprint
    assert(fp(base.repartition(13)) == a)
    // one mutated row flips EXACTLY one bucket's checksum (possibly
    // moving the row between buckets: at most two buckets differ)
    val mutated = base.withColumn("v",
      when($"id" === 777L, lit("CHANGED")).otherwise($"v"))
    val b = fp(mutated)
    val diff = a.zip(b).count { case (x, y) => x != y }
    assert(diff >= 1 && diff <= 2, s"changed buckets: $diff")
    // (NULL, 'x') must not collide with ('x', NULL) — the concat_ws
    // null-skip trap the sentinel exists for
    val p = Seq((Option.empty[String], Some("x")), (Some("x"), Option.empty[String]))
      .toDF("a", "b")
    val q = DatasetOps.tableFingerprint(p, Seq(col("a"), col("b")),
        nBuckets = 1)
      .as[(Long, Long, Long)].collect().head
    val qq = DatasetOps.tableFingerprint(p.limit(1), Seq(col("a"), col("b")),
        nBuckets = 1).as[(Long, Long, Long)].collect().head
    assert(q._2 == 2L && q._3 != qq._3 * 2,
      "the two null-position rows must hash differently")
  }

  test("hashSplit: deterministic, repartition-invariant, fractions in range") {
    val ids = (0L until 5000L).toDF("id")
    val a = DatasetOps.hashSplit(ids, "id")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val b = DatasetOps.hashSplit(ids.repartition(13), "id")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(a == b, "split membership must not depend on physical layout")
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 5000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.02, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.05) < 0.01, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.05) < 0.01, s"test ${frac("test")}")
  }

  test("temperatureMix flattens shares toward √n at constant corpus size, deterministically") {
    // skewed corpus: 800 / 150 / 50 docs per stratum
    val rows = (0 until 800).map(i => (i.toLong, "big")) ++
      (800 until 950).map(i => (i.toLong, "mid")) ++
      (950 until 1000).map(i => (i.toLong, "rare"))
    val df = rows.toDF("id", "s")
    val mixed = DatasetOps.temperatureMix(df, "s", "id")
    val after = mixed.groupBy($"s").count().as[(String, Long)].collect().toMap
    val total = after.values.sum
    // corpus size preserved up to the fractional-draw remainder
    assert(math.abs(total - 1000L) <= 30, s"total drifted: $total")
    // α=0.5 targets: w = √n → shares 28.28/12.25/7.07 of 47.6
    assert(after("big") < 800, s"head stratum must downsample: ${after("big")}")
    assert(after("rare") > 50, s"tail stratum must upsample: ${after("rare")}")
    assert(after("mid") > 150, s"mid stratum should gain share: ${after("mid")}")
    // membership is a pure function of the id — reshuffling changes nothing
    val reparted = DatasetOps.temperatureMix(df.repartition(7), "s", "id")
      .groupBy($"s").count().as[(String, Long)].collect().toMap
    assert(reparted == after)
    // replica indices are 1..copies per doc
    val badCopies = mixed.groupBy($"id").agg(
      count(lit(1)).as("c"), max($"copy").as("m"))
      .filter($"c" =!= $"m").count()
    assert(badCopies == 0, "copy must be a dense 1-based replica index")
  }

  test("contaminatedIds finds exactly the docs sharing a 5-gram with the benchmark") {
    val bench = Seq((1000L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "something about the quick brown fox jumps high today"), // shares a 5-gram
      (2L, "quick brown fox jumps over everything else entirely"),  // shares a 5-gram
      (3L, "completely unrelated text with no shared phrases at all"),
      (4L, "the quick brown dog sits still"))                       // 4-gram overlap only
      .toDF("doc_id", "text")
    val hit = DatasetOps.contaminatedIds(corpus, bench, "doc_id", "text")
      .as[Long].collect().toSet
    assert(hit == Set(1L, 2L), s"got $hit")
  }

  test("contaminationScores: planted overlap fractions, short docs score 0") {
    val bench = Seq((1000L, "a b c d e f")).toDF("doc_id", "text")
    // bench grams: "a b c d e", "b c d e f"
    val corpus = Seq(
      (1L, "a b c d e x y z"), // grams: abcde bcdex cdexy dexyz → 1/4 hit
      (2L, "p q r s t u"),     // 2 grams, 0 hits
      (3L, "a b c"))           // <5 tokens → no grams
      .toDF("doc_id", "text")
    val got = DatasetOps.contaminationScores(corpus, bench, "doc_id", "text")
      .select($"doc_id", $"n_grams", $"n_hit", $"contamination")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 1L, 0.25)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 0L, 0.0)), s"got ${got(2L)}")
    assert(got(3L) == ((3L, 0L, 0L, 0.0)), s"got ${got(3L)}")
  }

  test("qualityGateExact keeps ceil(n·frac) per group, ties to lowest id; sketch tier is a score-prefix") {
    // group a: 10 docs scoring 1..10 → ceil(10·0.3)=3 kept (IEEE:
    // 10·0.3 rounds to exactly 3.0 — the oracle replays the same
    // double product, so the engines agree on the boundary); group b:
    // 5 docs → ceil(1.5)=2 kept
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 5).map(i => ("b", i.toLong, i.toDouble)))
      .toDF("grp", "id", "score")
    val exact = DatasetOps.qualityGateExact(df, "grp", "score", "id", 0.3)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(exact == Set(("a", 8L), ("a", 9L), ("a", 10L),
      ("b", 4L), ("b", 5L)))
    // tie-break: equal scores keep the LOWEST id
    val tied = Seq(("t", 1L, 5.0), ("t", 2L, 5.0), ("t", 3L, 5.0),
      ("t", 4L, 5.0)).toDF("grp", "id", "score")
    val keptTied = DatasetOps.qualityGateExact(tied, "grp", "score", "id", 0.5)
      .select($"id").as[Long].collect().toSet
    assert(keptTied == Set(1L, 2L))
    // sketch tier: the cut is an actual member score, so the kept set
    // is ALWAYS a prefix of the score order, and its size drifts from
    // the exact tier by at most one rank (percentile-position rounding)
    val sketch = DatasetOps.qualityGateSketch(df, "grp", "score", 0.3)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    for (g <- Seq("a", "b")) {
      val kept = sketch.filter(_._1 == g).map(_._2)
      val nExact = exact.count(_._1 == g)
      assert(math.abs(kept.size - nExact) <= 1,
        s"group $g: sketch kept ${kept.size}, exact $nExact")
      val minKept = kept.min
      val aboveCut = df.filter($"grp" === g && $"score" >= minKept.toDouble)
        .count()
      assert(aboveCut == kept.size,
        s"group $g: sketch keep-set must be a score prefix")
    }
  }

  test("writeTrainingShards: per-shard dirs, offset-sorted files, nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      val docs = (0L until 400L)
        .map(i => (i, s"tok ${"w " * (i % 17).toInt}end"))
        .toDF("doc_id", "text")
      val packed = DatasetOps.packSequences(docs, "doc_id",
        graft.functions.TextFunctions.tokenCount($"text"),
        seqLen = 64, nShards = 8)
      DatasetOps.writeTrainingShards(
        packed.select($"doc_id", $"shard", $"n_tokens", $"offset", $"bin"), dir)
      val back = spark.read.parquet(dir)
      // complete: every (doc, shard, offset) survives the landing
      val expect = packed.select($"doc_id", $"shard", $"offset")
        .as[(Long, Long, Long)].collect().toSet
      val got = back.select($"doc_id", $"shard", $"offset")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expect)
      // every FILE is internally offset-sorted (what the trainer streams)
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
      assert(files.nonEmpty)
      for (f <- files) {
        val offs = spark.read.parquet(f).select($"offset")
          .as[Long].collect().toSeq
        assert(offs == offs.sorted, s"unsorted shard file $f")
      }
    } finally {
      graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(dir))
    }
  }

  test("quality_gate TVF matches the Scala operator and validates keep_frac") {
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 5).map(i => ("b", i.toLong, i.toDouble)))
      .toDF("grp", "id", "score")
    df.createOrReplaceTempView("graft_qgate_tvf")
    val viaSql = spark.sql(
      "SELECT grp, id FROM quality_gate('graft_qgate_tvf', 'grp', 'score', 'id', 0.3)")
      .as[(String, Long)].collect().toSet
    val viaScala = DatasetOps.qualityGateExact(df, "grp", "score", "id", 0.3)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(viaSql == viaScala)
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM quality_gate('graft_qgate_tvf', 'grp', 'score', 'id', 1.5)")
    }
    assert(e.getMessage.contains("keep_frac"), e.getMessage.take(200))
  }

  test("qualityGateExact equals a JVM brute-force reference over random tied groups") {
    val rnd = new scala.util.Random(31)
    // 60 groups, duplicate-heavy scores so ties are routine
    val rows = (0 until 60).flatMap { g =>
      val n = 1 + rnd.nextInt(25)
      (0 until n).map(i => (s"g$g", g * 100L + i, rnd.nextInt(6).toDouble))
    }
    val df = rows.toDF("grp", "id", "score")
    for (frac <- Seq(0.1, 0.3, 0.5, 0.9, 1.0)) {
      val got = DatasetOps.qualityGateExact(df, "grp", "score", "id", frac)
        .select($"grp", $"id").as[(String, Long)].collect().toSet
      val expect = rows.groupBy(_._1).flatMap { case (_, members) =>
        val k = math.ceil(members.size * frac).toInt
        members.sortBy(m => (-m._3, m._2)).take(k)
      }.map(m => (m._1, m._2)).toSet
      assert(got == expect, s"frac=$frac: ${got.diff(expect)} / ${expect.diff(got)}")
    }
  }

  test("quality gate null policy: null scores rejected by both tiers, null group keys gate as a group") {
    val df = Seq(
      (Option("a"), 1L, Option(10.0)),
      (Option("a"), 2L, Option(9.0)),
      (Option("a"), 3L, Option.empty[Double]),      // null score → out
      (Option.empty[String], 11L, Option(5.0)),     // the null-key group
      (Option.empty[String], 12L, Option(4.0)),
      (Option.empty[String], 13L, Option(3.0)),
      (Option.empty[String], 14L, Option.empty[Double]))
      .toDF("grp", "id", "score")
    val exact = DatasetOps.qualityGateExact(df, "grp", "score", "id", 0.5)
      .select($"id").as[Long].collect().toSet
    // group a: 2 scored docs → keep 1; null group: 3 scored → keep 2
    assert(exact == Set(1L, 11L, 12L), s"got $exact")
    val sketch = DatasetOps.qualityGateSketch(df, "grp", "score", 0.5)
      .select($"id").as[Long].collect().toSet
    // null-score rows never pass; the null-key group must NOT vanish
    // (the cut join is null-safe), and each group's keeps are a prefix
    assert(!sketch.contains(3L) && !sketch.contains(14L), s"got $sketch")
    assert(sketch.intersect(Set(11L, 12L, 13L)).nonEmpty,
      s"null-key group vanished from the sketch tier: $sketch")
    assert(sketch.contains(11L), "prefix property: best null-group doc must be kept")
  }

  test("chunkDocs: window/stride arithmetic, end clip, empty-doc elision") {
    import graft.functions.TextFunctions.whitespaceTokens
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(4)),   // == window → exactly 1 chunk
      (2L, words(5)),   // window+1 → 2 chunks, 2nd starts at stride, short
      (3L, words(11)),  // 1 + ceil((11-4)/3) = 4 chunks, last clipped
      (4L, ""))         // no tokens → no rows
      .toDF("doc_id", "text")
      .select($"doc_id", whitespaceTokens($"text").as("_tk"))
    val got = DatasetOps.chunkDocs(d, "doc_id", $"_tk", window = 4, stride = 3)
      .select($"doc_id", $"chunk_idx", $"chunk_text", $"n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(got(1L).map(_._3) == Seq("w1 w2 w3 w4"))
    assert(got(2L).map(_._3) == Seq("w1 w2 w3 w4", "w4 w5"))
    assert(got(3L).map(_._3) == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10 w11"))
    assert(got(3L).map(_._4) == Seq(4L, 4L, 4L, 2L))
    assert(!got.contains(4L), "empty docs must emit no chunks")
  }

  test("packSequences equals a JVM md5 replay across a seqLen/nShards grid") {
    // full-row comparison against an independent Scala reference: the
    // md5 draw, shard deal, (u, id) order, prefix sum, and bin are all
    // recomputed on the JVM — any drift in the Spark expression chain
    // (or its oracle contract) fails loudly
    def md5u(salt: String, id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val rnd = new scala.util.Random(43)
    val docs = (0L until 300L).map(i => (i, 1L + rnd.nextInt(40)))
    val df = docs.toDF("id", "ntok")
    for ((seqLen, nShards) <- Seq((32, 2), (64, 4), (128, 7))) {
      val expected = docs
        .map { case (id, nt) => (id, md5u("pack", id), nt) }
        .groupBy { case (id, u, _) => u % nShards }
        .flatMap { case (shard, rows) =>
          var cum = 0L
          rows.sortBy { case (id, u, _) => (u, id) }.map { case (id, _, nt) =>
            val off = cum; cum += nt
            (id, shard, nt, off, off / seqLen)
          }
        }.toSet
      val got = DatasetOps.packSequences(df, "id", $"ntok", seqLen, nShards)
        .select($"id", $"shard", $"n_tokens", $"offset", $"bin")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"seqLen=$seqLen nShards=$nShards")
    }
  }

  test("chunkDocs: stride==window chunks concatenate back to the document") {
    import graft.functions.TextFunctions.whitespaceTokens
    val rnd = new scala.util.Random(47)
    val docs = (0L until 50L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(40))(s"t${rnd.nextInt(99)}").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
      .select($"doc_id", $"text", whitespaceTokens($"text").as("_tk"))
    val rebuilt = DatasetOps.chunkDocs(df, "doc_id", $"_tk",
        window = 8, stride = 8)
      .groupBy($"doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(
        struct($"chunk_idx", $"chunk_text"))).getField("chunk_text"))
        .as("re"))
      .as[(Long, String)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(rebuilt(id) == text, s"doc $id reassembly mismatch")
    }
  }

  test("packSequences: conserves tokens, gapless per-shard offsets, layout-invariant") {
    val docs = (0L until 400L).map(i => (i, 1 + (i * 7 % 50))).toDF("id", "ntok")
    val packed = DatasetOps.packSequences(docs, "id", $"ntok",
      seqLen = 64, nShards = 4)
    val rows = packed.select($"id", $"shard", $"n_tokens", $"offset", $"bin")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 400)
    // per shard: offsets sorted form an exact gapless prefix sum, and
    // every doc's bin is floor(offset / seqLen)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_._4)
      var expect = 0L
      sorted.foreach { case (_, _, ntok, off, bin) =>
        assert(off == expect, s"shard $shard: offset $off, expected $expect")
        assert(bin == off / 64, s"shard $shard: bin $bin for offset $off")
        expect += ntok
      }
    }
    // token conservation overall
    assert(rows.map(_._3).sum == (0L until 400L).map(i => 1 + (i * 7 % 50)).sum)
    // membership and offsets are pure functions of (id, ntok)
    val reparted = DatasetOps.packSequences(docs.repartition(13), "id", $"ntok",
      seqLen = 64, nShards = 4)
      .select($"id", $"shard", $"n_tokens", $"offset", $"bin")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(reparted.sortBy(_._1).sameElements(rows.sortBy(_._1)),
      "packing must not depend on physical layout")
  }

  test("maskRepeatedSpans: planted cross-doc span cut, within-doc repeat spared, overlaps merge") {
    // span of 12 tokens shared by docs 1 and 2 at different offsets →
    // with k=8 its 5 gram starts must MERGE to one 12-token interval
    // (not 5×8 marks); doc 3 repeats a span twice but shares it with
    // nobody; doc 4 is shorter than k
    val span = (0 until 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"$span epsilon zeta eta theta iota kappa"),
      (3L, s"solo0 solo1 solo2 solo3 solo4 solo5 solo6 solo7 filler " +
        "solo0 solo1 solo2 solo3 solo4 solo5 solo6 solo7"),
      (4L, "tiny doc under k tokens")
    ).toDF("doc_id", "text")
    val out = DatasetOps.maskRepeatedSpans(docs, "doc_id", "text", k = 8)
      .select($"doc_id", $"n_tokens", $"n_masked", $"cleaned")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 16L, 12L, "alpha beta gamma delta")))
    assert(out(2L) == ((2L, 18L, 12L, "epsilon zeta eta theta iota kappa")))
    assert(out(3L)._3 == 0L, "within-doc repeats are content, not chrome")
    assert(out(4L) == ((4L, 5L, 0L, "tiny doc under k tokens")))
  }

  test("capPerGroup: n smallest draws per group, append-stable, layout-invariant") {
    val base = (0L until 400L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val kept = DatasetOps.capPerGroup(base, "grp", "id", n = 25)
      .select($"id", $"grp").as[(Long, String)].collect().toSet
    assert(kept.size == 100, s"4 groups x 25 expected, got ${kept.size}")
    assert(kept.groupBy(_._2).forall(_._2.size == 25))
    // JVM md5 replay: membership IS the 25 smallest draws per group
    def draw(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cap:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = (0L until 400L).groupBy(i => s"g${i % 4}").flatMap {
      case (g, ids) => ids.sortBy(i => (draw(i), i)).take(25).map(i => (i, g))
    }.toSet
    assert(kept == expected, "membership must be the md5-smallest draws")
    // layout invariance
    val reparted = DatasetOps.capPerGroup(base.repartition(13), "grp", "id", 25)
      .select($"id", $"grp").as[(Long, String)].collect().toSet
    assert(reparted == kept)
    // append stability: new rows only DISPLACE from the top of the
    // draw order — survivors of the union are still draw-minimal, and
    // any base row kept in the union was kept before
    val extra = (400L until 500L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val keptU = DatasetOps.capPerGroup(base.union(extra), "grp", "id", 25)
      .select($"id", $"grp").as[(Long, String)].collect().toSet
    assert(keptU.filter(_._1 < 400L).subsetOf(kept),
      "an appended doc must never PROMOTE a previously-cut doc")
  }

  test("kFoldAssign: exact partition, layout- and append-stable") {
    val df = (0L until 500L).toDF("id")
    val folds = DatasetOps.kFoldAssign(df, "id", k = 5)
    assert(folds.filter(col("fold") < 0 || col("fold") >= 5).count() === 0)
    assert(folds.count() === 500L)
    val byId = folds.select($"id", $"fold").as[(Long, Long)]
      .collect().toMap
    val reparted = DatasetOps.kFoldAssign(df.repartition(9), "id", 5)
      .select($"id", $"fold").as[(Long, Long)].collect().toMap
    assert(reparted === byId)
    // appending rows never moves an existing row's fold
    val appended = DatasetOps.kFoldAssign(
      (0L until 800L).toDF("id"), "id", 5)
      .select($"id", $"fold").as[(Long, Long)].collect().toMap
    assert(byId.forall { case (i, f) => appended(i) == f })
    intercept[IllegalArgumentException] {
      DatasetOps.kFoldAssign(df, "id", 1) }
  }

  test("oversampleToParity: every class reaches the majority count exactly") {
    // classes of 40 / 23 / 7 -> target 40
    val df = ((0L until 40L).map((_, "big")) ++
      (100L until 123L).map((_, "mid")) ++
      (200L until 207L).map((_, "small"))).toDF("id", "lab")
    val out = DatasetOps.oversampleToParity(df, "id", "lab",
      nShards = 8)
    val census = out.groupBy("lab")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("id")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(census("big") === (40L, 40L))
    assert(census("mid") === (40L, 23L))
    assert(census("small") === (40L, 7L))
    // per-row copies are full or full+1, never more
    val copies = out.groupBy("id", "lab").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(copies.filter(_._1 == "mid").forall(c => c._2 == 1L || c._2 == 2L))
    assert(copies.filter(_._1 == "small").forall(c => c._2 == 5L || c._2 == 6L))
    // layout invariance
    val out2 = DatasetOps.oversampleToParity(df.repartition(7), "id",
      "lab", nShards = 8)
      .groupBy("id").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = out.groupBy("id").agg(count(lit(1)).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out2 === base)
    // copy_idx enumerates 1..copies
    val idx = out.filter(col("id") === 200L)
      .select("copy_idx").as[Long].collect().sorted
    assert(idx === (1L to idx.length).toArray)
  }

  test("weightedPrioritySample: weight-monotone, deterministic, heap-planned") {
    // two groups; ids 0..99 weight 1, ids 100..199 weight 100000
    val df = (0L until 200L)
      .map(i => (i, if (i < 100) "g0" else "g1",
        if (i % 2 == 0) 1L else 100000L))
      .toDF("id", "grp", "w")
    val got = DatasetOps.weightedPrioritySample(df, "grp", "id", "w", k = 10)
      .select($"id", $"grp").as[(Long, String)].collect().toSet
    assert(got.size == 20 && got.groupBy(_._2).forall(_._2.size == 10))
    // JVM replay of the race
    def draw(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"wsamp:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def prio(id: Long, w: Long): Long = draw(id) * 1000000L / w
    val expected = (0L until 200L)
      .map(i => (i, if (i < 100) "g0" else "g1",
        if (i % 2 == 0) 1L else 100000L))
      .groupBy(_._2).flatMap { case (g, rows) =>
        rows.sortBy(r => (prio(r._1, r._3), r._1)).take(10)
          .map(r => (r._1, g))
      }.toSet
    assert(got == expected)
    // with a 100000:1 weight ratio the heavy rows should dominate
    assert(got.count(_._1 % 2 == 1) >= 18,
      s"heavy-weight rows should win almost every slot: $got")
    // zero/null weights never sample
    val withZero = df.union(Seq((999L, "g0", 0L)).toDF("id", "grp", "w"))
    assert(!DatasetOps.weightedPrioritySample(withZero, "grp", "id", "w", 10)
      .select($"id").as[Long].collect().contains(999L))
    // plans the bounded heap, not a Window
    val plan = DatasetOps.weightedPrioritySample(df, "grp", "id", "w", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected heap plan, got:\n$plan")
    assert(plan.contains("TopKPerGroup"), plan)
  }

  test("mask_spans TVF matches the Scala operator and validates its arguments") {
    val span = (0 until 10).map(i => s"sp$i").mkString(" ")
    Seq((1L, s"a b $span c"), (2L, s"$span d e f g h"), (3L, "lone doc text here"))
      .toDF("doc_id", "text").createOrReplaceTempView("graft_maskspan_tvf")
    try {
      val viaSql = spark.sql(
        """SELECT doc_id, n_tokens, n_masked, cleaned
          FROM mask_spans('graft_maskspan_tvf', 'doc_id', 'text', 8)
          ORDER BY doc_id""")
        .as[(Long, Long, Long, String)].collect().toSeq
      val viaScala = DatasetOps.maskRepeatedSpans(
          spark.table("graft_maskspan_tvf"), "doc_id", "text", k = 8)
        .orderBy($"doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(viaSql == viaScala)
      assert(viaSql.head._3 == 10L, "planted span must be cut through the TVF path")
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM mask_spans('graft_maskspan_tvf', 'doc_id', 'text', 1)")
      }
      assert(err.getMessage.contains("k must be >= 2"), err.getMessage)
    } finally spark.catalog.dropTempView("graft_maskspan_tvf")
  }

  test("maskRepeatedSpans equals a JVM brute-force reference over random corpora") {
    val rnd = new scala.util.Random(113)
    for (trial <- 0 until 6) {
      val k = 3 + rnd.nextInt(3) // 3..5
      // small token alphabet so cross-doc gram collisions actually occur
      val corpus = (0L until 12L).map { id =>
        val n = 2 + rnd.nextInt(18)
        (id, (0 until n).map(_ => s"t${rnd.nextInt(8)}").mkString(" "))
      }
      val expected = {
        val toks = corpus.map { case (id, tx) =>
          id -> tx.split("\\s+").filter(_.nonEmpty).toVector
        }.toMap
        val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
        for ((id, tk) <- toks; i <- 0 to tk.length - k)
          gramDocs.updateWith(tk.slice(i, i + k).mkString(" "))(
            s => Some(s.getOrElse(Set.empty) + id))
        toks.map { case (id, tk) =>
          val masked = Array.fill(tk.length)(false)
          for (i <- 0 to tk.length - k
               if gramDocs(tk.slice(i, i + k).mkString(" ")).size >= 2;
               j <- i until i + k) masked(j) = true
          val kept = tk.indices.filterNot(masked).map(tk)
          (id, tk.length.toLong, masked.count(identity).toLong,
            kept.mkString(" "))
        }.toSet
      }
      val got = DatasetOps.maskRepeatedSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", k)
        .select($"doc_id", $"n_tokens", $"n_masked", $"cleaned")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == expected, s"trial $trial (k=$k) diverged from brute force")
    }
  }

  test("importanceScores: target-like docs outscore disjoint ones, short docs score 0") {
    val target = Seq(
      (100L, "quantum physics explains entangled states"),
      (101L, "quantum physics predicts entangled states decay"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "quantum physics explains entangled states clearly"), // target-like
      (2L, "football season starts with a derby win"),           // disjoint
      (3L, "quantum physics again quantum physics again"),       // repeated hit
      (4L, "tiny"))                                              // < k tokens
      .toDF("doc_id", "text")
    val rows = DatasetOps.importanceScores(corpus, target, "doc_id", "text")
      .select($"doc_id", $"n_grams", $"score", $"avg_ratio")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), "every corpus id must appear")
    // doc 4 has one token → zero bigrams → all-zero row
    assert(rows(4L) == ((4L, 0L, 0L, 0L)))
    // a shared-bigram doc must outscore a disjoint one, per-gram
    assert(rows(1L)._4 > rows(2L)._4,
      s"target-like ${rows(1L)} must outscore disjoint ${rows(2L)}")
    // every disjoint gram contributes the smoothed floor 10⁶·1/(cs+1)
    assert(rows(2L)._4 === 500000L,
      s"disjoint doc's ratios must all be the +1-smoothing floor: ${rows(2L)}")
    // occurrences, not distinct grams: doc 3's repeats each count
    assert(rows(3L)._2 === 5L, s"bigram occurrences must count: ${rows(3L)}")
    // membership is a pure function of the content — layout-invariant
    val reparted = DatasetOps.importanceScores(
        corpus.repartition(7), target.repartition(3), "doc_id", "text")
      .select($"doc_id", $"n_grams", $"score", $"avg_ratio")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(reparted == rows)
  }

  test("importanceScores: hot-gram skew fixture equals JVM replay; background count is never a window") {
    // the VERDICT r6 scale profile: ONE bigram carrying ~a third of all
    // gram occurrences (web text's "of the"). Correctness must hold and
    // the plan must not concentrate the hot gram — the r6 shape was a
    // Window.partitionBy(raw gram hash), which pins every occurrence of
    // the hot gram to one task at 100 TB; the two-level (doc, gram)
    // count must keep the plan Window-free.
    val hot = "of the " * 8 // 8 "of the" + 7 "the of" bigrams per hot doc
    val corpus = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, hot + s"u$i v$i")
      else (i, s"alpha$i beta$i gamma$i delta$i")
    }.toDF("doc_id", "text")
    val target = Seq((1000L, "of the target sample"),
      (1001L, "beta3 gamma3 extras")).toDF("doc_id", "text")
    val got = DatasetOps.importanceScores(corpus, target, "doc_id", "text")
      .select($"doc_id", $"n_grams", $"score", $"avg_ratio")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // JVM replay of the integer contract
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(s: String) =
      toks(s).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    val corpusDocs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, hot + s"u$i v$i")
      else (i, s"alpha$i beta$i gamma$i delta$i")
    }
    val cs = corpusDocs.flatMap(d => grams(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = Seq("of the target sample", "beta3 gamma3 extras")
      .flatMap(grams).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = corpusDocs.map { case (id, t) =>
      val gs = grams(t)
      val score = gs.map(g =>
        1000000L * (ct.getOrElse(g, 0L) + 1L) / (cs(g) + 1L)).sum
      val n = gs.size.toLong
      id -> ((id, n, score, if (n > 0) score / n else 0L))
    }.toMap
    assert(got == want)
    // the hot gram is ~30% of occurrences — sanity-pin the fixture
    val total = cs.values.sum.toDouble
    assert(cs("of the") / total > 0.25, s"fixture lost its skew: $cs")
    val plan = DatasetOps.importanceScores(corpus, target, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"gram-hash window reappeared (the r6 scale-killer):\n${plan.take(3000)}")
  }

  test("lengthBucketBatches: bucket homogeneity, full batches, layout invariance") {
    val rnd = new scala.util.Random(117)
    val docs = (0L until 400L).map { id =>
      (id, (0 until (1 + rnd.nextInt(200))).map(i => s"w$i").mkString(" "))
    }.toDF("doc_id", "text")
    val out = DatasetOps.lengthBucketBatches(docs, "doc_id",
        graft.functions.TextFunctions.tokenCount($"text"),
        batchSize = 8, minBucket = 16, maxBucket = 128, nShards = 4)
      .select($"doc_id", $"n_tokens", $"bucket", $"shard", $"batch_idx",
        $"pos")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 400, "every doc must be batched")
    // bucket is the power-of-two ceiling, floored/capped
    for ((_, n, b, _, _, _) <- out) {
      assert(Set(16L, 32L, 64L, 128L)(b), s"bucket $b")
      assert(n <= b || b == 128L, s"doc of $n tokens in bucket $b")
      assert(b == 16L || b == 128L || n > b / 2,
        s"doc of $n tokens belongs in bucket ${b / 2}, not $b")
    }
    // batches are bucket-homogeneous by construction (the batch key is
    // (bucket, shard, batch_idx)); positions within a batch are a
    // dense 0..size-1 run and only each shard's LAST batch may be
    // short
    val byBatch = out.groupBy(r => (r._3, r._4, r._5))
    val maxBatch =
      out.groupBy(r => (r._3, r._4)).view.mapValues(_.map(_._5).max).toMap
    for (((bucket, shard, bi), rows) <- byBatch) {
      assert(rows.map(_._6).sorted.toSeq == (0L until rows.length.toLong),
        s"batch ($bucket, $shard, $bi) positions not dense")
      if (bi < maxBatch((bucket, shard)))
        assert(rows.length == 8, s"non-final batch ($bucket, $shard, $bi) short")
      else assert(rows.length <= 8, s"batch ($bucket, $shard, $bi) overfull")
    }
    // deterministic in content: physical layout changes nothing
    val reparted = DatasetOps.lengthBucketBatches(docs.repartition(11),
        "doc_id", graft.functions.TextFunctions.tokenCount($"text"),
        batchSize = 8, minBucket = 16, maxBucket = 128, nShards = 4)
      .select($"doc_id", $"n_tokens", $"bucket", $"shard", $"batch_idx",
        $"pos")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(reparted.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("importance_score and length_batches TVFs match Scala and validate arguments") {
    Seq((1L, "quantum physics explains entangled states"),
      (2L, "football season starts with a derby win"),
      (3L, "quantum physics predicts decay"))
      .toDF("doc_id", "text").createOrReplaceTempView("graft_imp_corpus")
    Seq((100L, "quantum physics explains states"))
      .toDF("doc_id", "text").createOrReplaceTempView("graft_imp_target")
    try {
      val viaSql = spark.sql(
        """SELECT doc_id, n_grams, score, avg_ratio
          FROM importance_score('graft_imp_corpus', 'graft_imp_target',
            'doc_id', 'text')
          ORDER BY doc_id""")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val viaScala = DatasetOps.importanceScores(
          spark.table("graft_imp_corpus"), spark.table("graft_imp_target"),
          "doc_id", "text")
        .orderBy($"doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(viaSql == viaScala)
      val errK = intercept[Exception] {
        spark.sql("""SELECT * FROM importance_score('graft_imp_corpus',
          'graft_imp_target', 'doc_id', 'text', 0)""")
      }
      assert(errK.getMessage.contains("k must be >= 1"), errK.getMessage)

      val viaSqlB = spark.sql(
        """SELECT doc_id, n_tokens, bucket, shard, batch_idx, pos
          FROM length_batches('graft_imp_corpus', 'doc_id', 'text', 2, 4, 16, 2)
          ORDER BY doc_id""")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      val viaScalaB = DatasetOps.lengthBucketBatches(
          spark.table("graft_imp_corpus"), "doc_id",
          graft.functions.TextFunctions.tokenCount($"text"),
          batchSize = 2, minBucket = 4, maxBucket = 16, nShards = 2)
        .select($"doc_id", $"n_tokens", $"bucket", $"shard", $"batch_idx",
          $"pos")
        .orderBy($"doc_id")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(viaSqlB == viaScalaB)
      // the power-of-two require surfaces as an analysis-time error
      val errB = intercept[Exception] {
        spark.sql("""SELECT * FROM length_batches('graft_imp_corpus',
          'doc_id', 'text', 2, 3, 16, 2)""")
      }
      assert(errB.getMessage.contains("power of two"), errB.getMessage)
    } finally {
      spark.catalog.dropTempView("graft_imp_corpus")
      spark.catalog.dropTempView("graft_imp_target")
    }
  }

  // -- token-budget selection --------------------------------------------

  /** The selection rule's JVM reference: global (score DESC, draw,
    * id) order, maximal prefix with cumulative tokens ≤ budget. */
  private def budgetRef(docs: Seq[(Long, Long, Long)],
                        budget: Long): Set[Long] = {
    def draw(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"budget:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val ordered = docs.sortBy { case (id, s, _) => (-s, draw(id), id) }
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    ordered.zip(cums).takeWhile(_._2 <= budget).map(_._1._1).toSet
  }

  test("selectTokenBudget equals the global prefix rule across budgets, incl. zero-token docs") {
    val rnd = new scala.util.Random(47)
    // 5 score classes, token costs 0..29 (zeros exercise the
    // monotone-prefix edge at the boundary)
    val docs = (0L until 500L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(30).toLong))
    val df = docs.toDF("id", "score", "toks")
    val total = docs.map(_._3).sum
    for (budget <- Seq(0L, 1L, total / 10, total / 3, (2 * total) / 3,
        total - 1, total, total + 100)) {
      val got = DatasetOps.selectTokenBudget(df, "id", "score", "toks",
        budget).select($"id").as[Long].collect()
      assert(got.length == got.toSet.size, s"duplicate rows at $budget")
      assert(got.toSet == budgetRef(docs, budget),
        s"budget=$budget: selection drifted from the global prefix rule")
    }
  }

  test("selectTokenBudget: layout-invariant, null rows dropped, no global window") {
    val rnd = new scala.util.Random(48)
    val docs = (0L until 300L).map(i =>
      (i, rnd.nextInt(3).toLong, 1L + rnd.nextInt(20).toLong))
    val df = docs.toDF("id", "score", "toks")
    val budget = docs.map(_._3).sum / 2
    val a = DatasetOps.selectTokenBudget(df, "id", "score", "toks", budget)
      .select($"id").as[Long].collect().toSet
    val b = DatasetOps.selectTokenBudget(df.repartition(13), "id", "score",
      "toks", budget).select($"id").as[Long].collect().toSet
    assert(a == b, "membership must not depend on physical layout")
    // null score or token rows never pass (the quality-gate policy)
    val withNulls = df.unionByName(Seq((900L, null, "5"), (901L, "2", null))
      .toDF("id", "score", "toks")
      .select($"id", $"score".cast("long"), $"toks".cast("long")))
    val c = DatasetOps.selectTokenBudget(withNulls, "id", "score", "toks",
      budget).select($"id").as[Long].collect().toSet
    assert(!c.contains(900L) && !c.contains(901L))
    // the only window is the boundary-bucket stratum window — never a
    // global (all-foldable-partition) one (the planscan criterion)
    val sel = DatasetOps.selectTokenBudget(df, "id", "score", "toks", budget)
    sel.collect()
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          ad +: allNodes(ad.executedPlan)
        case n => Seq(n)
      }
    val global = allNodes(sel.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty || w.partitionSpec.forall(_.foldable) => w
    }
    assert(global.isEmpty, s"global window in the plan: $global")
    intercept[IllegalArgumentException] {
      DatasetOps.selectTokenBudget(df, "id", "score", "toks", -1L)
    }
  }

  test("classifierScores: JVM md5 replay, empty docs, shuffle-free plan") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "THE Quick  brown\tfox"), // case/whitespace-normalizes to #1
      (3L, "one"),                   // single token: no bigrams
      (4L, ""),                      // empty: n_feats 0, score 0, keep
      (5L, "lorem ipsum dolor sit amet lorem ipsum")
    ).toDF("doc_id", "text")
    val got = DatasetOps.classifierScores(docs, "doc_id", "text",
        threshold = -20L)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Boolean)].collect()

    // the reference fold: md5 via MessageDigest, the oracle's exact path
    def md5u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def score(text: String): (Long, Long) = {
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val feats = tk.map("clf:u:" + _) ++
        tk.sliding(2).filter(_.size == 2).map(p => "clf:b:" + p.mkString(" "))
      val s = feats.map { f =>
        val b = md5u32(f) % 262144L
        md5u32(s"w:clf:$b") % 2001L - 1000L
      }.sum
      (feats.size.toLong, s)
    }
    for ((id, nf, sc, keep) <- got) {
      val text = Seq("", "the quick brown fox", "THE Quick  brown\tfox",
        "one", "", "lorem ipsum dolor sit amet lorem ipsum")(id.toInt)
      val (en, es) = score(text)
      assert(nf == en, s"doc $id n_feats: got $nf want $en")
      assert(sc == es, s"doc $id score: got $sc want $es")
      assert(keep == (es >= -20L * en), s"doc $id keep")
    }
    // docs 1 and 2 tokenize identically → identical features and score
    assert(got(0)._3 == got(1)._3 && got(0)._2 == got(1)._2)
    // the filter must cost ONE narrow scan: no shuffle in the plan
    val plan = DatasetOps.classifierScores(docs, "doc_id", "text")
    plan.collect()
    val exchanges = plan.queryExecution.executedPlan.toString()
    assert(!exchanges.contains("Exchange"),
      s"classifierScores must be shuffle-free:\n$exchanges")
    intercept[IllegalArgumentException] {
      DatasetOps.classifierScores(docs, "doc_id", "text", buckets = 0)
    }
  }

  test("applyChangelogAsOf: latest-wins per key, later versions invisible") {
    val base = Seq((1L, "p1"), (2L, "p2"), (3L, "p3"), (4L, "p4"))
      .toDF("id", "payload")
    val chg = Seq(
      (1L, 1L, "U", "a1"), (1L, 2L, "U", "b1"), // two updates: v2 wins
      (2L, 1L, "D", ""),                        // deleted at v1
      (3L, 3L, "U", "c3"),                      // future: invisible at 2
      (4L, 1L, "U", "a4"), (4L, 2L, "D", ""),   // update then delete
      (5L, 1L, "I", "i5")                       // insert
    ).toDF("id", "version", "op", "payload")
    def at(v: Long): Map[Long, String] =
      DatasetOps.applyChangelogAsOf(base, chg, "id", "payload",
        "version", asOf = v).as[(Long, String)].collect().toMap
    assert(at(2L) == Map(1L -> "b1", 3L -> "p3", 5L -> "i5"))
    assert(at(3L) == Map(1L -> "b1", 3L -> "c3", 5L -> "i5"))
    assert(at(0L) == Map(1L -> "p1", 2L -> "p2", 3L -> "p3", 4L -> "p4"))
  }

  test("surprisalScores: rare tokens cost more bits, exactly") {
    // corpus: 'the' ×6, 'rare' ×1, 'mid' ×2 → N=9 (bitlen 4)
    // bits: the → 4-3=1; mid → 4-2=2; rare → 4-1=3
    val docs = Seq(
      (1L, "the the the rare"),   // 3·1 + 3 = 6 bits over 4 tokens
      (2L, "the the the mid mid"),// 3·1 + 2·2 = 7 bits over 5 tokens
      (3L, "")                    // empty
    ).toDF("doc_id", "text")
    val got = DatasetOps.surprisalScores(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 6L, 1500L),
      (2L, 5L, 7L, 1400L),
      (3L, 0L, 0L, 0L)), got.toString)
    // layout invariance: the census and totals survive repartitioning
    val re = DatasetOps.surprisalScores(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(re == got)
  }

  test("mixtureAllocation: water-filling invariants and both regimes") {
    // tokens per source: tiny=2, small=4, mid=10, big=20
    val docs = Seq(
      ("tiny", "a b"), ("small", "a b c d"),
      ("mid", ("t " * 10).trim), ("big", ("t " * 20).trim)
    ).toDF("source", "text")
    def run(budget: Long, capMilli: Long) =
      DatasetOps.mixtureAllocation(docs, "source", "text", budget, capMilli)
        .as[(String, Long, Long, Long, Boolean, Long)].collect()
        .map(r => r._1 -> r).toMap
    // cap 2 epochs → capacities 4/8/20/40; budget 30: tiny+small
    // saturate (4+8=12), mid+big share (30-12)/2 = 9 each
    val a = run(30L, 2000L)
    assert(a("tiny") == (("tiny", 2L, 4L, 4L, true, 2000L)), a.toString)
    assert(a("small") == (("small", 4L, 8L, 8L, true, 2000L)), a.toString)
    assert(a("mid") == (("mid", 10L, 20L, 9L, false, 900L)), a.toString)
    assert(a("big") == (("big", 20L, 40L, 9L, false, 450L)), a.toString)
    assert(a.values.map(_._4).sum <= 30L)
    // budget beyond total capacity: everyone saturates at the cap
    val b = run(1000L, 1500L)
    assert(b.values.forall(_._5), b.toString)
    assert(b.values.forall(r => r._4 == r._3), b.toString)
    // zero budget: nothing saturates, waterline 0
    val c = run(0L, 2000L)
    assert(c.values.forall(r => !r._5 && r._4 == 0L), c.toString)
    intercept[IllegalArgumentException] {
      DatasetOps.mixtureAllocation(docs, "source", "text", -1L, 2000L)
    }
    intercept[IllegalArgumentException] {
      DatasetOps.mixtureAllocation(docs, "source", "text", 10L, 0L)
    }
  }

  test("constraintReport: one-pass counts, fail-closed nulls, guards") {
    val df = Seq[(java.lang.Long, String)]((1L, "ok"), (2L, "bad"),
      (null, "ok"), (4L, null)).toDF("id", "st")
    val got = DatasetOps.constraintReport(df, Seq(
      "id_present" -> col("id").isNotNull,
      "st_ok" -> (col("st") === "ok"),
      "id_small" -> (col("id") <= 2L)))
      .as[(String, Long, Long, Long)].collect().toSeq
    // id_present: 1 violation (null id); st_ok: "bad" + null st = 2;
    // id_small: id=4 fails, null id fails CLOSED = 2
    assert(got == Seq(
      ("id_present", 4L, 1L, 250000L),
      ("id_small", 4L, 2L, 500000L),
      ("st_ok", 4L, 2L, 500000L)), got)
    // empty input: all rates zero, nothing divides by zero
    val empty = DatasetOps.constraintReport(df.filter(lit(false)),
      Seq("x" -> col("id").isNotNull))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(empty == Seq(("x", 0L, 0L, 0L)), empty)
    intercept[IllegalArgumentException] {
      DatasetOps.constraintReport(df, Nil) }
    intercept[IllegalArgumentException] {
      DatasetOps.constraintReport(df, Seq("a" -> lit(true), "a" -> lit(false))) }
  }

  test("bigramSurprisalScores: hand-computed conditional bits") {
    // cb: "a b"=2, "b a"=1, "a c"=1; cx: a=3, b=1
    // "a b": bitlen(3)-bitlen(2)=0; "a c": 2-1=1; "b a": 1-1=0
    val docs = Seq((1L, "a b a c"), (2L, "A  B"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val got = DatasetOps.bigramSurprisalScores(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 333L), // 1000*1 div 3
      (2L, 1L, 0L, 0L), // case/space-fold joins d1's "a b" census
      (3L, 0L, 0L, 0L), // single token: no conditional context
      (4L, 0L, 0L, 0L)), got)
  }

  test("politeFetchSchedule priority: host queue drains priority-first, rate unchanged") {
    val frontier = Seq(
      ("u1", "h.com", 5L), ("u2", "h.com", 9L), ("u3", "h.com", 1L),
      ("u4", "i.net", 7L)).toDF("url", "host", "prio")
    val delays = Seq(("h.com", 2L), ("i.net", 3L)).toDF("host", "delay_s")
    val got = DatasetOps.politeFetchSchedule(frontier, "url", "host",
        delays, nShards = 1, priorityCol = Some("prio"))
      .select($"url", $"src_rank", $"vtime")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // one shard: rank IS the position in the priority-desc order
    assert(got("u2")._1 == 1L && got("u1")._1 == 2L && got("u3")._1 == 3L,
      s"got $got")
    // vtime stride stays the host delay — priority never buys rate
    assert(got("u2")._2 == 2000000L && got("u1")._2 == 4000000L &&
      got("u3")._2 == 6000000L, s"got $got")
    assert(got("u4") == ((1L, 3000000L)), s"got $got")
    // default path (no priority) is untouched: same rows, md5 order
    val plain = DatasetOps.politeFetchSchedule(frontier, "url", "host",
        delays, nShards = 1)
      .select($"url").as[String].collect().toSet
    assert(plain == Set("u1", "u2", "u3", "u4"))
  }

  test("referenceLmScores: hand-computed smoothed bits, OOV floor, self-corpus contrast") {
    // reference: "a b a c" plus 36 distinct filler tokens → cb:
    // "a b"=1, "b a"=1, "a c"=1; cx: a=2, b=1; V = 39 (a,b,c + r0..r35)
    // — a vocabulary big enough that the add-one OOV floor COSTS
    // something (with V=3 an all-OOV spam doc priced the same as
    // under the self-corpus model, defeating the CCNet contrast below)
    val ref = Seq((100L, "a b a c"),
      (101L, (0 until 36).map(i => s"r$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),    // seen bigram: bitlen(2+39)-bitlen(1+1)=6-2=4
      (2L, "a z"),    // seen ctx, unseen bigram: bitlen(41)-bitlen(1)=5
      (3L, "q z"),    // unseen ctx: the 1/V floor — bitlen(39)-bitlen(1)=5
      (4L, "x"), (5L, "")) // no conditional evidence → unscored zeros
      .toDF("doc_id", "text")
    val got = DatasetOps.referenceLmScores(docs, ref, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"surprisal_bits",
        $"milli_bits_per_bigram")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 4L, 4000L),
      (2L, 1L, 5L, 5000L),
      (3L, 1L, 5L, 5000L),
      (4L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L)), got)
    // the CCNet point: against the self-corpus model, boilerplate
    // shared across crawl docs scores as predictable; against the
    // reference model it costs what the REFERENCE says it costs
    val boiler = (1L to 6L).map(i => (i, "spam spam spam buy now"))
    val crawl = (boiler :+ (7L -> "a b a c")).toDF("doc_id", "text")
    val selfScore = DatasetOps
      .bigramSurprisalScores(crawl, "doc_id", "text")
      .where($"doc_id" === 1L).select($"milli_bits_per_bigram")
      .as[Long].head()
    val refScore = DatasetOps
      .referenceLmScores(crawl, ref, "doc_id", "text")
      .where($"doc_id" === 1L).select($"milli_bits_per_bigram")
      .as[Long].head()
    assert(refScore > selfScore,
      s"reference LM must not reward crawl-frequent spam: ref=$refScore self=$selfScore")
  }

  test("histogram: integer bin edges, out-of-range bins, null exclusion") {
    // [0, 100) in 4 bins of width 25
    val df = Seq[java.lang.Long](0L, 24L, 25L, 99L, 100L, -5L, null, 50L)
      .toDF("v")
    val got = DatasetOps.histogram(df, "v", nBins = 4, lo = 0L, hi = 100L)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((-1L, 1L), (0L, 2L), (1L, 1L), (2L, 1L),
      (3L, 1L), (4L, 1L)), got)
    intercept[IllegalArgumentException] {
      DatasetOps.histogram(df, "v", 0, 0L, 100L) }
    intercept[IllegalArgumentException] {
      DatasetOps.histogram(df, "v", 4, 100L, 100L) }
    intercept[IllegalArgumentException] {
      DatasetOps.histogram(df, "v", 1000, 0L, Long.MaxValue - 1) }
  }

  test("leakageFreeSplit: clusters stay together; singletons match hashSplit") {
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 60L))
      .toDF("idA", "idB")
    val rows = DatasetOps.leakageFreeSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"split", $"split_group")
      .as[(Long, String, Long)].collect()
    val split = rows.map(r => r._1 -> r._2).toMap
    val group = rows.map(r => r._1 -> r._3).toMap
    // every pair-connected doc shares its component's split
    assert(split(1L) == split(2L) && split(2L) == split(3L))
    assert(split(10L) == split(11L) && split(50L) == split(60L))
    // the draw key is the min label of the component
    assert(group(3L) == 1L && group(11L) == 10L && group(60L) == 50L)
    // docs outside every pair draw exactly like plain hashSplit
    val plain = DatasetOps.hashSplit(docs.filter($"doc_id" === 100L), "doc_id")
      .select($"split").as[String].head()
    assert(split(100L) == plain && group(100L) == 100L)
    assert(rows.length == 200)
  }

  test("bloomBitmap/bloomHitCount: no false negatives; FP rate bounded; empty array is zero") {
    val members = (0 until 500).map(i => s"member:$i")
    val bits = DatasetOps.bloomBitmap(members.toDF("g"), "g")
    assert(bits.length == (1 << 18) / 64)
    val setBits = bits.map(java.lang.Long.bitCount).sum
    assert(setBits > 0 && setBits <= 1500, s"setBits=$setBits")
    // probe: every member hits (one-sided error — the gate contract);
    // non-members essentially never do at this fill ratio
    val probe = Seq(
      ("all_members", members.take(50)),
      ("none", (0 until 2000).map(i => s"other:$i")),
      ("mixed", Seq("member:3", "other:x", "member:7")),
      ("empty", Seq.empty[String]))
      .toDF("label", "gs")
      .withColumn("bits", typedLit(bits.toSeq))
      .withColumn("n_hits", DatasetOps.bloomHitCount("gs", "bits"))
      .select($"label", $"n_hits").as[(String, Int)].collect().toMap
    assert(probe("all_members") == 50, s"false negative: ${probe("all_members")}/50")
    assert(probe("none") <= 1, s"FP count ${probe("none")}/2000 over the ~1e-6 design rate")
    assert(probe("mixed") == 2)
    assert(probe("empty") == 0)
  }

  test("writeBloomIndex/readBloomIndex: bit-exact round trip; param mismatch refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomidx").toString
    try {
      val bits = DatasetOps.bloomBitmap(
        (0 until 300).map(i => s"g:$i").toDF("g"), "g")
      DatasetOps.writeBloomIndex(spark, dir, bits)
      val (back, m, k) = DatasetOps.readBloomIndex(spark, dir)
      assert(m == (1 << 18) && k == 3)
      assert(back.sameElements(bits), "round-tripped bitmap differs")
      val e = intercept[IllegalArgumentException] {
        DatasetOps.readBloomIndex(spark, dir, expectMBits = Some(1 << 16))
      }
      assert(e.getMessage.contains("m_bits"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        DatasetOps.writeBloomIndex(spark, dir, bits, mBits = 1 << 16)
      }
      assert(e2.getMessage.contains("words"), e2.getMessage)
    } finally {
      graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(dir))
    }
  }

  test("repetitionSignals: hand-computed top-2gram and dup-3gram coverage, overlap counted once, degenerate docs zeroed") {
    val docs = Seq(
      (1L, "a b a b a b"), // "a b"x3; both 3-grams duplicated -> full cover
      (2L, "x y z w"),     // all 2-grams unique; tie-break -> max gram "z w"
      (3L, "hi"),          // one word: no 2-grams at all
      (4L, "")             // no tokens
    ).toDF("doc_id", "text")
    val got = DatasetOps.repetitionSignals(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // (id, n_words, word_chars, top2_cnt, top2_ppm, dup3_ppm)
      (1L, 6L, 6L, 3L, 1000000L, 1000000L), // 3*2 chars / 6; cover = all 6
      (2L, 4L, 4L, 1L, 500000L, 0L),        // 1*2 / 4; no duplicated 3-gram
      (3L, 1L, 2L, 0L, 0L, 0L),
      (4L, 0L, 0L, 0L, 0L, 0L)), got.toString)
    // overlap counted ONCE: "c c c c c" has "c c c c? " -> 3-gram "c c c"
    // x3 occurrences covering positions 0..4; coverage is 5 chars, not 9
    val over = DatasetOps.repetitionSignals(
      Seq((9L, "c c c c c")).toDF("doc_id", "text"), "doc_id", "text")
      .select($"dup3_ppm").as[Long].head()
    assert(over == 1000000L, s"coverage must dedup overlaps, got $over")
  }

  test("shardManifest: per-physical-file counts and payload sums are exact, re-aggregation is split-invariant") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mfst_spec_").toString
    try {
      val a = Seq((1L, "aa"), (2L, "bbb")).toDF("id", "t")
      val b = Seq((3L, "cccc")).toDF("id", "t")
      a.coalesce(1).write.parquet(s"$dir/p1")
      b.coalesce(1).write.parquet(s"$dir/p2")
      val got = DatasetOps.shardManifest(
          spark.read.parquet(s"$dir/p1", s"$dir/p2"), length($"t"))
        .collect().map(r => (r.getString(0).contains("/p1/"),
          r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((true, 2L, 5L), (false, 1L, 4L)), got.toString)
      // split-invariance: many part-files per logical key re-aggregate
      // to the same totals (the q256 contract)
      val many = Seq.tabulate(20)(i => (i.toLong, "x" * (i % 3 + 1)))
        .toDF("id", "t").repartition(7)
      many.write.mode("overwrite").parquet(s"$dir/p3")
      val total = DatasetOps.shardManifest(
          spark.read.parquet(s"$dir/p3"), length($"t"))
        .agg(sum($"n_rows"), sum($"payload_sum"))
        .as[(Long, Long)].head()
      assert(total == ((20L, Seq.tabulate(20)(i => (i % 3 + 1).toLong).sum)))
    } finally {
      graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(dir))
    }
  }

  test("packingEfficiency: mass conserved, interior sequences full, boundary census") {
    val docsDf = (1L to 60L).map(i => (i, 3L + i % 7)).toDF("id", "n")
    val packed = DatasetOps.packSequences(docsDf, "id", col("n"),
      seqLen = 16, nShards = 3)
    val eff = DatasetOps.packingEfficiency(packed, 16)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // (shard, seq, n_docs, n_boundaries, fill, padding, fill_ppm)
    val totalTokens = (1L to 60L).map(i => 3L + i % 7).sum
    assert(eff.map(_._5).sum == totalTokens, "fill mass must conserve")
    // only each shard's FINAL sequence may be partial
    val lastSeq = eff.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    eff.filter(e => e._2 < lastSeq(e._1)).foreach { e =>
      assert(e._5 == 16L && e._6 == 0L && e._7 == 1000000L,
        s"interior sequence not full: $e")
    }
    // boundaries = docs touching the sequence minus one, never negative
    assert(eff.forall(e => e._4 == e._3 - 1 && e._4 >= 0))
    // zero-token docs occupy nothing and join no sequence
    val withZero = docsDf.union(Seq((999L, 0L)).toDF("id", "n"))
    val eff2 = DatasetOps.packingEfficiency(
      DatasetOps.packSequences(withZero, "id", col("n"), 16, 3), 16)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(eff2.map(_._5).sum == totalTokens)

    val be = DatasetOps.bucketBatchEfficiency(
      DatasetOps.lengthBucketBatches(docsDf, "id", col("n"),
        batchSize = 4, minBucket = 4, maxBucket = 16, nShards = 2))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // (bucket, shard, batch_idx, n_rows, capacity, fill, padding, ppm)
    assert(be.map(_._6).sum == totalTokens, "bucketed fill must conserve")
    assert(be.forall(b => b._5 == b._1 * b._4 && b._7 == b._5 - b._6))
    assert(be.forall(b => b._4 >= 1 && b._4 <= 4), "batchSize respected")
    assert(be.forall(b => b._8 > 0 && b._8 <= 1000000L))
  }

  test("packManifest artifact: byte-identical re-export, tamper refused loudly, sidecar gates truncation") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_manifest_spec_").toString
    try {
      val docsDf = (1L to 200L).map(i => (i, 3L + i % 7)).toDF("id", "n")
      def packed(df: org.apache.spark.sql.DataFrame) =
        DatasetOps.packSequences(df, "id", col("n"), seqLen = 16,
          nShards = 4)
      DatasetOps.writePackManifest(packed(docsDf), "id", s"$base/m1")
      // the read-back matches a direct census and covers every doc
      val got = DatasetOps.readPackManifest(spark, s"$base/m1")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got.map(_._2).sum == 200L)
      assert(got.map(_._3).sum == (1L to 200L).map(i => 3L + i % 7).sum)
      // IDEMPOTENT RE-EXPORT: a second export of the same corpus (in a
      // different layout) writes a BYTE-identical shards artifact
      DatasetOps.writePackManifest(packed(docsDf.repartition(7)), "id",
        s"$base/m2")
      def partBytes(dir: String): Seq[Byte] = {
        val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
          .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
        assert(files.length == 1, s"expected one part file in $dir")
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(files.head)).toSeq
      }
      assert(partBytes(s"$base/m1/shards") == partBytes(s"$base/m2/shards"),
        "re-export must be byte-identical")
      // the check passes against the honest export ...
      DatasetOps.checkPackManifest(spark, s"$base/m1", packed(docsDf), "id")
      // ... and refuses loudly on every tamper class, naming the shard
      val dropped = intercept[IllegalArgumentException] {
        DatasetOps.checkPackManifest(spark, s"$base/m1",
          packed(docsDf.filter($"id" =!= 17L)), "id")
      }
      assert(dropped.getMessage.contains("diverge"), dropped.getMessage)
      val swapped = intercept[IllegalArgumentException] {
        // same id set, one token count shifted — membership checksums
        // match, token mass flips
        DatasetOps.checkPackManifest(spark, s"$base/m1",
          packed(docsDf.withColumn("n",
            when($"id" === 17L, $"n" + 1L).otherwise($"n"))), "id")
      }
      assert(swapped.getMessage.contains("diverge"), swapped.getMessage)
      val substituted = intercept[IllegalArgumentException] {
        // same count and mass in the shard, different member — only
        // the checksum catches it
        DatasetOps.checkPackManifest(spark, s"$base/m1",
          packed(docsDf.withColumn("id",
            when($"id" === 17L, 10017L).otherwise($"id"))), "id")
      }
      assert(substituted.getMessage.contains("diverge"),
        substituted.getMessage)
      // a truncated shards table disagrees with the totals sidecar —
      // the reader itself refuses
      val rows = spark.read.parquet(s"$base/m1/shards")
      rows.filter($"shard" =!= 0L).coalesce(1)
        .write.mode("overwrite").parquet(s"$base/m3/shards")
      val metaSrc = spark.read.parquet(s"$base/m1/meta")
      metaSrc.coalesce(1).write.mode("overwrite").parquet(s"$base/m3/meta")
      val trunc = intercept[IllegalArgumentException] {
        DatasetOps.readPackManifest(spark, s"$base/m3")
      }
      assert(trunc.getMessage.contains("sidecar"), trunc.getMessage)
      intercept[IllegalArgumentException] {
        DatasetOps.readPackManifest(spark, s"$base/nowhere")
      }
      // EMPTY export (ADVICE r15): zero shard rows used to write NULL
      // totals, and the reader NPE'd on getLong instead of behaving —
      // an empty corpus is a legal artifact that must round-trip
      DatasetOps.writePackManifest(packed(docsDf.filter($"id" < 0L)),
        "id", s"$base/m4")
      val empty = DatasetOps.readPackManifest(spark, s"$base/m4")
        .collect()
      assert(empty.isEmpty, "empty manifest must read back empty")
      DatasetOps.checkPackManifest(spark, s"$base/m4",
        packed(docsDf.filter($"id" < 0L)), "id")
    } finally {
      graft.sources.AtomicCache.deleteRec(java.nio.file.Paths.get(base))
    }
  }
}