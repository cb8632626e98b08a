package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
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

  /** Apply learned merges to the corpus — the ENCODE half of BPE
    * (tokenizer application, the per-document counterpart of
    * [[learnBpeMerges]]): every printable-ASCII word is framed into
    * its character symbols and the merges are replayed IN RANK ORDER
    * as literal string replacements (same ␟-framing, same leftmost
    * non-overlapping `replace` semantics as training — an encode that
    * used different overlap rules than training would segment "aaa"
    * differently than the learner counted it).
    *
    * Scale shape: the merge list is vocabulary-sized, never
    * data-sized — it arrives as a driver-side constant folded into ONE
    * narrow per-row expression chain (`transform` over the word array,
    * `replace` per merge). The encode pass therefore scans and never
    * exchanges: zero shuffles at any corpus size, the property that
    * matters when tokenizing 100 TB. Token counts are recovered
    * arithmetically from the framing (a word's symbol count is half
    * its ␟ count), so no second pass splits the encoded strings.
    *
    * Non-ASCII words are counted (`n_words`) but not encoded — the
    * learner excluded them from the census (byte-level fallback is the
    * production answer; here the contract is "encode what was
    * trained on"), so they contribute to no token statistic.
    *
    * @return one row per input row: (idCol, n_words, n_ascii_words,
    *         n_chars_ascii, n_tokens) — `n_chars_ascii - n_tokens`
    *         is exactly the number of merge applications that fired. */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    requireMerges(merges)
    val words = TextFunctions.whitespaceTokens(col(textCol))
    val ascii = filter(words, w => w.rlike("^[\\x21-\\x7e]+$"))
    val longSum = (arr: Column) =>
      aggregate(arr, lit(0L), (acc, x) => acc + x)
    // the folded-replace encode is per-row heavy — spread a narrow
    // scan so the pass doesn't run in one task (r13)
    DatasetOps.spreadToCores(docs).select(col(idCol),
      size(words).cast(LongType).as("n_words"),
      size(ascii).cast(LongType).as("n_ascii_words"),
      longSum(transform(ascii, w => length(w).cast(LongType)))
        .as("n_chars_ascii"),
      longSum(transform(ascii, w => symbols(encode(w, merges))))
        .as("n_tokens"))
  }

  /** Token count of one STRING under learned `merges` — the
    * per-string core of [[bpeTokenCounts]], exposed so other
    * operators can price text in REAL tokens (the chat tier's
    * token-budget context fitting consumes it per turn). Same
    * contract: whitespace words, printable-ASCII words encoded by
    * replaying the merges in rank order, non-ASCII words cost 0
    * (the learner excluded them from the census). Pure narrow
    * column arithmetic — composable anywhere without a shuffle. */
  def encodedTokenCount(text: Column,
                        merges: Seq[(String, String)]): Column = {
    requireMerges(merges)
    val ascii = filter(TextFunctions.whitespaceTokens(text),
      w => w.rlike("^[\\x21-\\x7e]+$"))
    aggregate(transform(ascii, w => symbols(encode(w, merges))),
      lit(0L), (acc, x) => acc + x)
  }

  private def requireMerges(merges: Seq[(String, String)]): Unit = {
    require(merges.size <= 4096,
      s"merges is a learned vocabulary (expression-chain folded), " +
        s"got ${merges.size} > 4096")
    merges.foreach { case (l, r) =>
      require((l + r).forall(c => c >= 0x21 && c <= 0x7e),
        s"merge symbols must be printable ASCII (the census contract), " +
          s"got ($l, $r)") }
  }

  private def encode(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(regexp_replace(w, "(.)", Sep + "$1" + Sep)) {
      case (c, (l, r)) =>
        replace(c, lit(Sep + l + Sep + Sep + r + Sep),
          lit(Sep + l + r + Sep))
    }

  // symbol count = ␟-count / 2; the length diff is always even, so
  // the double division is exact and the long cast loses nothing
  private def symbols(e: Column): Column =
    ((length(e) - length(replace(e, lit(Sep), lit("")))) / lit(2))
      .cast(LongType)
}
