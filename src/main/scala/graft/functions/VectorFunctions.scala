package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `ArrayType` columns via higher-order
  * functions — `zip_with` + `aggregate` compile to Catalyst
  * expressions (no UDF serialization, no Python boundary).
  *
  * Precision contract: callers cast `array<float>` embeddings to
  * `array<double>` FIRST (float→double is exact), then every product
  * and the left-fold sum are computed in double — bit-identical to a
  * sequential C loop over the same values, which is what reference
  * implementations (and the DuckDB oracle's `list_dot_product`)
  * compute. That makes cosine scores reproducible across engines.
  *
  * Scale: all narrow, codegen-adjacent operations; the expensive part
  * of similarity search is pair enumeration, handled in
  * [[graft.operators.Similarity]] via broadcast + LSH bucketing.
  */
object VectorFunctions {

  /** Exact widening of a float vector to double. */
  def toDoubleVec(v: Column): Column = v.cast(ArrayType(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; 0.0 when either vector has zero norm.
    * HOF composition — kept as the dependency-free reference form and
    * the ground truth [[cosineFast]] is tested against. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Cosine similarity via the native codegen'd
    * [[graft.expressions.CosineSimilarity]] expression — one fused
    * loop, no per-pair array allocation, bit-identical results to
    * [[cosine]]. Requires the session to carry
    * [[graft.extensions.GraftExtensions]] (every graft session
    * factory does). */
  def cosineFast(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Symmetric int8 quantization scale: max|x| / 127. Zero for the
    * all-zero vector (callers guard the roundtrip). */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** Quantize→dequantize roundtrip under symmetric int8: each element
    * snaps to its nearest of 255 levels (floor(x/s + 0.5) — the same
    * pure-IEEE half-up used for ratio rounding, reproducible across
    * engines; max-abs scaling makes the index range exactly
    * [-127, 127], no clamp needed). The reconstruction error this
    * leaves is what a 4×-smaller ANN index costs in score fidelity —
    * q69 puts a measured bound on it. */
  def int8Roundtrip(v: Column, s: Column): Column =
    transform(v, x => floor(x / s + 0.5) * s)

  /** Sign bit of a projection onto a fixed hyperplane. */
  def projectionBit(v: Column, plane: Seq[Double]): Column =
    when(dot(v, typedLit(plane)) >= 0, lit(1L)).otherwise(lit(0L))

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: an
    * integer whose bit i is the sign of v·r_i. Planes are generated
    * from a fixed seed so signatures are deterministic. */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      shiftleft(projectionBit(v, p), i)
    }.reduce(_ bitwiseOR _)

  /** Deterministic unit-free hyperplanes for [[lshSignature]]. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Engine-PORTABLE pseudo-random vectors: component (i, d) is the
    * uint32 spelled by the first 8 hex chars of md5("tag:i:d"), mapped
    * to [-1, 1) by u/2³²·2−1 — every step exact in IEEE doubles, so
    * ANY engine with md5 rebuilds bit-identical planes/centroids (the
    * same portability trick as the synthetic order generator,
    * SyntheticOrderSource:15). This is what lets q46/q55 oracle the
    * FULL ANN operators in DuckDB — signature bucketing, probing, cell
    * assignment, ranking — rather than only their exact tiers: the
    * "randomness" is part of the replayed spec. Uniform cube
    * components instead of gaussians costs rotation invariance, which
    * sign-LSH and IVF seeding do not need. */
  def md5Vectors(n: Int, dim: Int, tag: String): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      (0 until dim).map { d =>
        val hex = md.digest(s"$tag:$i:$d".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 * 2.0 - 1.0
      }
    }
  }
}
