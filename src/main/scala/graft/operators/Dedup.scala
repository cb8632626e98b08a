package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._

/** Deduplication operators for LLM-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. The reference has no dedup surface;
  * these are the north-star operators (BASELINE.json) built
  * shuffle-consciously:
  *
  *  - exact dedup: ONE shuffle on the content hash (never on the
  *    content itself — at 100 TB you shuffle 8-byte keys, not bodies);
  *  - MinHash/LSH: signatures are narrow per-doc work; the only wide
  *    ops are the band-bucket exchange (keys are (band, 64-bit hash))
  *    and the candidate-pair verification join. Candidates ≪ all
  *    pairs, which is the whole point of LSH — O(n²) never appears;
  *  - SimHash: narrow signature + band-bucket exchange, same shape;
  *  - verification joins rebroadcast only candidate shingle sets.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per distinct value of
    * `textCol`. Grouping key is xxhash64(content) — collisions at
    * 64 bits are ~n²/2⁶⁵, acceptable for dedup; use
    * [[exactDedupStrict]] when byte-certainty is required. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact dedup grouping on the full content (correct under hash
    * collision, heavier shuffle). */
  def exactDedupStrict(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(textCol)).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signature column: for hash family i (0..n-1), the min
    * over shingles of xxhash64(i, shingle). Pure HOF — narrow. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** LSH band keys: hash of each r-row slice of the signature. */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Candidate duplicate pairs (idA < idB) that share ≥1 LSH band.
    * Input df must carry `idCol` and a shingle-array column
    * `shingleCol`. Returns (idA, idB) distinct. */
  def lshCandidatePairs(df: DataFrame, idCol: String, shingleCol: String,
                        numHashes: Int = 24, bands: Int = 6): DataFrame = {
    val rows = numHashes / bands
    val sig = df
      .filter(size(col(shingleCol)) > 0)
      .select(col(idCol), minhashSignature(col(shingleCol), numHashes).as("_sig"))
      .select(col(idCol),
        posexplode(bandKeys(col("_sig"), bands, rows)).as(Seq("_band", "_bhash")))
    val a = rows // suppress unused warning path; bands*rows == numHashes
    require(a * bands == numHashes, "numHashes must be divisible by bands")
    val left = sig.select(col("_band"), col("_bhash"), col(idCol).as("idA"))
    val right = sig.select(col("_band"), col("_bhash"), col(idCol).as("idB"))
    left.join(right, Seq("_band", "_bhash"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB")).distinct()
  }

  /** Exact Jaccard over distinct shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Full MinHash-LSH near-dup pipeline over a document table:
    * shingle → sign → band → candidate pairs → exact-Jaccard verify.
    * Returns verified pairs (idA, idB, jaccard ≥ threshold). */
  def minhashDupPairs(docs: DataFrame, textCol: String, idCol: String,
                      shingleWords: Int = 3, threshold: Double = 0.7,
                      numHashes: Int = 24, bands: Int = 6): DataFrame = {
    val sh = docs.select(col(idCol),
      wordShingles(whitespaceTokens(col(textCol)), shingleWords).as("_sh"))
    val cand = lshCandidatePairs(sh, idCol, "_sh", numHashes, bands)
    val shA = sh.select(col(idCol).as("idA"), col("_sh").as("_shA"))
    val shB = sh.select(col(idCol).as("idB"), col("_sh").as("_shB"))
    cand.join(shA, "idA").join(shB, "idB")
      .withColumn("jaccard",
        jaccard(array_distinct(col("_shA")), array_distinct(col("_shB"))))
      .filter(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), col("jaccard"))
  }

  /** 64-bit SimHash over a token array: bit k of the result is the
    * sign of Σ_tokens (±1 depending on bit k of xxhash64(token)).
    * Token hashes are materialized once into an array column; the 64
    * bit-sums are then independent narrow folds. */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bitCols: Seq[Column] = (0 until 64).map { k =>
      val bitSum = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum >= 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: docs whose signatures share a
    * 16-bit band, verified by hamming ≤ maxHamming. */
  def simhashDupPairs(docs: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol),
      simhash(whitespaceTokens(col(textCol))).as("_sim"))
    val banded = sigs.select(col(idCol), col("_sim"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("_sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("_band", "_bkey")))
    val left = banded.select(col("_band"), col("_bkey"),
      col(idCol).as("idA"), col("_sim").as("_simA"))
    val right = banded.select(col("_band"), col("_bkey"),
      col(idCol).as("idB"), col("_sim").as("_simB"))
    left.join(right, Seq("_band", "_bkey"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        hamming(col("_simA"), col("_simB")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
