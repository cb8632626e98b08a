package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The multimodal surface on REAL byte arrays: magic-number sniffing,
  * byte-level metadata, the decode stub's shape, and frame slicing. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A,
    0x1A, 0x0A, 1, 2, 3, 4)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
    0xE0.toByte, 9, 9)
  private val riff = "RIFF1234WAVE".getBytes("US-ASCII")
  private val junk = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8)

  private lazy val df = Seq(
    (1L, png), (2L, jpeg), (3L, riff), (4L, junk)).toDF("id", "media")

  test("sniffFormat reads genuine magic numbers") {
    val got = Multimodal.withMedia(df, "media")
      .select($"id", $"media_meta.format").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff", 4L -> "unknown"))
  }

  test("extractMeta measures real bytes") {
    val m = Multimodal.withMedia(df, "media")
      .select($"id", $"media_meta.n_bytes", $"media_meta.head_hex")
      .as[(Long, Int, String)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(1L) == ((12, "89504E47")))
    assert(m(2L) == ((6, "FFD8FFE0")))
    assert(m(3L) == ((12, "52494646")))
  }

  test("stubDecodeFeatures: fixed dim, [0,1) floats, deterministic, content-sensitive") {
    val f = df.select($"id", Multimodal.stubDecodeFeatures($"media", 8).as("f"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(f.values.forall(_.size == 8))
    assert(f.values.flatten.forall(v => v >= 0f && v < 1f))
    assert(f(1L) != f(2L)) // different bytes → different features
    val again = df.select($"id", Multimodal.stubDecodeFeatures($"media", 8).as("f"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(f == again)
  }

  test("decodeBatch (mapPartitions contract) agrees with the expression stub") {
    val viaExpr = df.select($"id", Multimodal.stubDecodeFeatures($"media", 8).as("f"))
      .as[(Long, Seq[Float])].collect().toMap
    val viaBatch = Multimodal.decodeBatch(df, "id", "media", 8)()
      .as[(Long, Seq[Float])].collect().toMap
    assert(viaBatch == viaExpr)
  }

  test("sampleFrames slices byte ranges; short tail frames shrink") {
    val frames = df.filter($"id" === 1)
      .select(Multimodal.sampleFrames($"media", 5, 3).as("fr"))
      .as[Seq[Array[Byte]]].head()
    assert(frames.size == 3)
    assert(frames(0).toSeq == png.slice(0, 5).toSeq)
    assert(frames(1).toSeq == png.slice(5, 10).toSeq)
    assert(frames(2).toSeq == png.slice(10, 12).toSeq) // 2-byte tail
  }
}
