package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE merge induction vs a straight JVM reference implementation:
  * same census, argmax tie-break and greedy merge scan. */
class BpeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Reference BPE: word-type census → per-round pair count (every
    * adjacent occurrence, weighted by word count) → argmax by
    * (count DESC, l ASC, r ASC) → greedy leftmost non-overlapping
    * merge. */
  private def referenceMerges(texts: Seq[String], k: Int)
      : Seq[(Long, String, String, Long)] = {
    val census = scala.collection.mutable.Map.empty[Vector[String], Long]
    for (t <- texts; w <- t.toLowerCase.split("\\s+")
           if w.nonEmpty && w.forall(c => c >= '!' && c <= '~'))
      census.updateWith(w.map(_.toString).toVector)(c => Some(c.getOrElse(0L) + 1))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var words = census.toMap
    var rank = 1L
    var done = false
    while (rank <= k && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sy, n) <- words; i <- 0 until sy.length - 1)
        pairs.updateWith((sy(i), sy(i + 1)))(c => Some(c.getOrElse(0L) + n))
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), cnt) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, cnt))
        words = words.groupMapReduce { case (sy, _) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < sy.length) {
            if (i < sy.length - 1 && sy(i) == l && sy(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += sy(i); i += 1 }
          }
          merged.toVector
        }(_._2)(_ + _)
        rank += 1
      }
    }
    out.toSeq
  }

  test("learnBpeMerges equals the JVM reference on the classic corpus") {
    val texts = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest widest widest widest")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learnBpeMerges(docs, "text", nMerges = 6)
      .as[(Long, String, String, Long)].collect().toSeq
    val want = referenceMerges(texts, 6)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // merges actually compose: later merges can consume earlier ones
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1),
      s"no learned merge built on a previous one: $got")
  }

  test("overlap semantics: 'aaa' merges greedily to [aa, a]") {
    // pair (a,a) counts every adjacent occurrence (2 per 'aaa'), but
    // the merge scan is non-overlapping: round 2's top pair must be
    // (aa, a) — which only exists if round 1 merged greedily
    val docs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val got = Bpe.learnBpeMerges(docs, "text", nMerges = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", "a", 6L), (2L, "aa", "a", 3L)), got.toString)
  }

  test("non-ASCII words are excluded; early stop when pairs run out") {
    val docs = Seq((1L, "ab ab café café café"))
      .toDF("doc_id", "text")
    val got = Bpe.learnBpeMerges(docs, "text", nMerges = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    // only 'ab' survives the ASCII guard: one merge then exhaustion
    assert(got == Seq((1L, "a", "b", 2L)), got.toString)
    intercept[IllegalArgumentException] {
      Bpe.learnBpeMerges(docs, "text", nMerges = 0)
    }
    intercept[IllegalArgumentException] {
      Bpe.learnBpeMerges(docs, "text", nMerges = 65)
    }
  }

  test("bpeTokenCounts: encode replays training's greedy overlap rules") {
    val docs = Seq(
      (1L, "aaa aaa aaa"),     // merge (a,a) then (aa,a): 1 token each
      (2L, "aa café"),         // 'aa' → 1 token; non-ASCII word skipped
      (3L, "")                 // no words at all
    ).toDF("doc_id", "text")
    // learned on this corpus: rank1 (a,a), rank2 (aa,a)
    val m = Bpe.learnBpeMerges(docs, "text", nMerges = 2)
      .as[(Long, String, String, Long)].collect().toSeq.map(r => (r._2, r._3))
    assert(m == Seq(("a", "a"), ("aa", "a")))
    val got = Bpe.bpeTokenCounts(docs, "doc_id", "text", m)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 9L, 3L),  // each 'aaa' → [aaa] after both merges
      (2L, 2L, 1L, 2L, 1L),  // 'aa' → [aa]; café counted in n_words only
      (3L, 0L, 0L, 0L, 0L)), got.toString)
    // zero merges: every char is its own token
    val plain = Bpe.bpeTokenCounts(docs, "doc_id", "text", Nil)
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(plain.map(r => r._5) == Seq(9L, 2L, 0L))
    // merge symbols outside printable ASCII violate the census contract
    intercept[IllegalArgumentException] {
      Bpe.bpeTokenCounts(docs, "doc_id", "text", Seq(("a", "é")))
    }
  }

  test("layout invariance: repartitioned corpus learns identical merges") {
    val texts = (0 until 200).map(i =>
      s"tok$i the the quick quick brown fox ${"ab" * (i % 4 + 1)}")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = Bpe.learnBpeMerges(docs, "text", nMerges = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    val b = Bpe.learnBpeMerges(docs.repartition(13), "text", nMerges = 4)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(a == b)
    assert(a == referenceMerges(texts, 4))
  }
}
