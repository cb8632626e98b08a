package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BPE tokenizer induction over a corpus — the byte-pair-encoding
  * merge-learning loop (Sennrich et al. 2016) every LLM vocabulary is
  * built with: repeatedly count adjacent symbol pairs across the
  * corpus and merge the most frequent one.
  *
  * Scale shape (the reason BPE training is tractable at 100 TB): the
  * corpus collapses to a WORD-TYPE census first — one corpus-scale
  * map-side-combined aggregate, after which every merge round runs
  * over word types (Heaps-law bounded, ~10⁷–10⁸ rows for web text)
  * weighted by their counts, never over the corpus again. Each round
  * is one distributed pair census (map-side combined, 8-byte-ish pair
  * keys) + a 1-row argmax pickup (`orderBy.limit(1)` —
  * TakeOrderedAndProject's bounded heaps, then the ≤k-row collect
  * contract) + a narrow per-row merge apply. No windows, no joins.
  *
  * Determinism (what the q152 oracle replays bit-for-bit): integer
  * pair counts; argmax ties broken by (count DESC, left ASC,
  * right ASC) over ASCII-only symbols (both engines compare ASCII
  * identically); the merge apply is sequential leftmost
  * non-overlapping replacement — `replace()` semantics in every
  * engine, exactly the classic BPE merge scan ("aaaa" + merge a,a →
  * [aa, aa]; "aaa" → [aa, a]).
  *
  * Representation: a word's symbol sequence is one delimiter-framed
  * string — each symbol wrapped in U+001F on both sides
  * ("ab" → ␟a␟␟b␟) — so applying a merge IS a literal string
  * replacement (the pattern ␟l␟␟r␟ can never match across a symbol
  * boundary, and sequential replace is exactly the greedy merge
  * scan). The census keeps printable-ASCII words only: it pins
  * "character" to one code unit in every engine (regex `.` splits
  * surrogate pairs in the JVM but not in RE2 — and production BPE is
  * byte-level anyway), and it guarantees the delimiter can never
  * occur inside a symbol.
  */
object Bpe {
  private val Sep = "\u001f"

  /** Learn the first `nMerges` BPE merges from the corpus.
    *
    * Stops early (returns fewer rows) if the corpus runs out of
    * adjacent pairs before `nMerges` rounds.
    *
    * @return (merge_rank, lhs, rhs, pair_count) ordered by
    *         merge_rank; applying the merges in rank order to the
    *         initial character sequences reproduces the learned
    *         segmentation. */
  def learnBpeMerges(docs: DataFrame, textCol: String,
                     nMerges: Int): DataFrame = {
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges must be in [1, 64] (each round is a corpus-census job), " +
        s"got $nMerges")
    val base = docs
      .select(explode(TextFunctions.whitespaceTokens(col(textCol)))
        .as("w"))
      .filter(col("w").rlike("^[\\x21-\\x7e]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(regexp_replace(col("w"), "(.)", Sep + "$1" + Sep).as("w"),
        col("n"))
      .persist()
    try {
      var cur = base
      val merges = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, String, Long)]
      var rank = 1
      var exhausted = false
      while (rank <= nMerges && !exhausted) {
        val pairs = cur
          .select(col("n"),
            split(expr("substring(w, 2, length(w) - 2)"), Sep + Sep)
              .as("sy"))
          .filter(size(col("sy")) >= 2) // sequence(1, 0) would DESCEND
          .select(col("n"),
            explode(transform(sequence(lit(1), size(col("sy")) - 1),
              i => struct(element_at(col("sy"), i).as("l"),
                element_at(col("sy"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("n")).as("cnt"))
        val top = pairs
          .orderBy(col("cnt").desc, col("l"), col("r")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val Row(l: String, r: String, cnt: Long) = top(0)
          merges += ((rank.toLong, l, r, cnt))
          val pat = java.util.regex.Pattern
            .quote(Sep + l + Sep + Sep + r + Sep)
          val rep = java.util.regex.Matcher
            .quoteReplacement(Sep + l + r + Sep)
          cur = cur.select(
            regexp_replace(col("w"), lit(pat), lit(rep)).as("w"), col("n"))
          rank += 1
        }
      }
      val sp = docs.sparkSession
      import sp.implicits._
      merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_count")
        .orderBy(col("merge_rank"))
    } finally base.unpersist()
  }
}
