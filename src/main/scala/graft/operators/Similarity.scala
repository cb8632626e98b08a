package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, per the north-star spec:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is
  *    broadcast (it is small by construction); the candidate scan is
  *    narrow and the per-query top-k is a window over rounded scores.
  *    At 100 TB this is the "scoring pass" shape: one read of the
  *    corpus, no shuffle of candidate vectors — only (query × k)
  *    result rows move.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing. Candidates and
  *    queries hash to signature buckets; cosine is computed only
  *    within a bucket. The bucket exchange shuffles 8-byte signatures,
  *    not vectors (vectors ride along once, hash-partitioned), and
  *    bucket sizes are ~n/2^planes — tunable to executor memory.
  *
  * Scores are rounded to 6dp BEFORE ranking so that rank order (and
  * the k-cutoff) is reproducible bit-for-bit across engines; ties
  * break on candidate id.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries    (qid, qvec: array<double>)
    * @param candidates (cid, cvec: array<double>)
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates.crossJoin(broadcast(queries))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosineFast(col("qvec"), col("cvec")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** LSH-bucketed ANN: exact cosine within matching signature
    * buckets only. Recall < 1 by design; nPlanes trades recall for
    * bucket size (cost). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              dim: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val qs = queries.withColumn("_sig", lshSignature(col("qvec"), planes))
    val cs = candidates.withColumn("_sig", lshSignature(col("cvec"), planes))
    val scored = cs.join(broadcast(qs), Seq("_sig"))
      .filter(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        round(cosineFast(col("qvec"), col("cvec")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("sim"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among pairs
    * sharing an LSH bucket (the scalable form of "embedding-cosine
    * near-dup" dedup). */
  def cosineNearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, dim: Int,
                         nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val sigs = vecs.select(col(idCol), col(vecCol).as("_v"))
      .withColumn("_sig", lshSignature(col("_v"), planes))
    val left = sigs.select(col("_sig"), col(idCol).as("idA"), col("_v").as("_vA"))
    val right = sigs.select(col("_sig"), col(idCol).as("idB"), col("_v").as("_vB"))
    left.join(right, Seq("_sig"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        round(cosineFast(col("_vA"), col("_vB")), 6).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct()
  }
}
