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

  test("decodeBatch preserves a string id column untouched (no silent long cast)") {
    val sdf = Seq(("doc-a", png), ("doc-b", jpeg)).toDF("sid", "media")
    val out = Multimodal.decodeBatch(sdf, "sid", "media", 4)()
      .select($"sid").as[String].collect().toSet
    assert(out == Set("doc-a", "doc-b"))
  }

  /** A real image rendered in-test: `w`×`h`, left half black, right
    * half white — unambiguous luma structure for the thumbnail check. */
  private def realImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("imageDecodeBatch really decodes PNG and JPEG: true dims, bands, luma features") {
    val pngBytes = realImage(8, 6, "png")
    val jpgBytes = realImage(5, 5, "jpg")
    val in = Seq((1L, pngBytes), (2L, jpgBytes), (3L, junk)).toDF("id", "media")
    val rows = Multimodal.imageDecodeBatch(in, "id", "media", thumb = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // true dimensions straight from the decoder
    assert(rows(1L).getInt(1) == 8 && rows(1L).getInt(2) == 6)
    assert(rows(2L).getInt(1) == 5 && rows(2L).getInt(2) == 5)
    assert(rows(1L).getInt(3) == 3) // RGB PNG → 3 bands
    // the 2×2 thumbnail sees the half-black/half-white structure:
    // left cells dark, right cells bright (PNG is lossless → exact)
    val f = rows(1L).getSeq[Float](4)
    assert(f.size == 4)
    assert(f(0) == 0f && f(2) == 0f, s"left cells should be black: $f")
    assert(f(1) == 1f && f(3) == 1f, s"right cells should be white: $f")
    // undecodable bytes degrade to a null row, not a task failure
    assert(rows(3L).isNullAt(1) && rows(3L).isNullAt(4))
    // deterministic
    val again = Multimodal.imageDecodeBatch(in, "id", "media", thumb = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](4)).toMap
    assert(again(1L) == f)
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

  test("resizeRasterHex: nearest-neighbor index math, down and up") {
    // 2x2 raster: [AA BB / CC DD]
    val r = Seq("AABBCCDD").toDF("hx")
    def resize(wIn: Int, hIn: Int, wOut: Int, hOut: Int): String =
      r.select(Multimodal.resizeRasterHex($"hx", wIn, hIn, wOut, hOut))
        .as[String].head()
    assert(resize(2, 2, 1, 1) == "AA")           // top-left survives
    assert(resize(2, 2, 2, 2) == "AABBCCDD")     // identity
    // upsample 2x2 -> 4x4: each source pixel repeats in a 2x2 block
    assert(resize(2, 2, 4, 4) ==
      "AAAABBBB" + "AAAABBBB" + "CCCCDDDD" + "CCCCDDDD")
    // 4x1 row [10 20 30 40] -> 2x1: indices 0 and 2
    val row = Seq("10203040").toDF("hx")
    assert(row.select(Multimodal.resizeRasterHex($"hx", 4, 1, 2, 1))
      .as[String].head() == "1030")
    // 3x3 -> 2x2 non-divisible: src rows/cols {0, 1} of {0, 1, 2}
    val nine = Seq("000102101112202122").toDF("hx")
    assert(nine.select(Multimodal.resizeRasterHex($"hx", 3, 3, 2, 2))
      .as[String].head() == "00011011")
    intercept[IllegalArgumentException] {
      Multimodal.resizeRasterHex($"hx", 0, 2, 1, 1)
    }
  }

  test("dHashBits matches a JVM reference; banded near-dup is the exact hamming relation") {
    val rnd = new scala.util.Random(188L)
    def randHex(): String =
      Seq.fill(64)(f"${rnd.nextInt(256)}%02X").mkString
    // JVM reference: resize 8x8 -> 9x8 by index arithmetic, then
    // horizontal gradient signs
    def refHash(hx: String): String = {
      val px = (0 until 72).map { i =>
        val idx = (i / 9) * 8 + ((i % 9) * 8 / 9)
        Integer.parseInt(hx.substring(idx * 2, idx * 2 + 2), 16)
      }
      (0 until 64).map { j =>
        if (px((j / 8) * 9 + j % 8) > px((j / 8) * 9 + j % 8 + 1)) '1'
        else '0'
      }.mkString
    }
    val rasters = (0L until 20L).map(i => (i, randHex()))
    val got = rasters.toDF("id", "hx")
      .select($"id", Multimodal.dHashBits($"hx", 8, 8).as("bits"))
      .as[(Long, String)].collect().toMap
    rasters.foreach { case (i, hx) =>
      assert(got(i) == refHash(hx), s"raster $i") }
    // near-dup: duplicate raster 0 at id 100 (hamming 0) and add a
    // one-pixel variant at id 101; banded result == brute-force
    val withDups = rasters ++ Seq(
      (100L, rasters(0)._2),
      (101L, "FF" + rasters(1)._2.substring(2)))
    val hashed = withDups.toDF("id", "hx")
      .select($"id", Multimodal.dHashBits($"hx", 8, 8).as("bits"))
    val gotPairs = Multimodal.imageNearDupPairs(hashed, "id", "bits",
      maxHamming = 3, bands = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val bitsMap = withDups.map { case (i, hx) => (i, refHash(hx)) }
    val want = (for {
      (ia, ba) <- bitsMap; (ib, bb) <- bitsMap if ia < ib
      h = ba.zip(bb).count { case (x, y) => x != y }
      if h <= 3
    } yield (ia, ib, h.toLong)).sortBy(t => (t._1, t._2))
    assert(gotPairs == want, s"\ngot:  $gotPairs\nwant: $want")
    assert(gotPairs.contains((0L, 100L, 0L)), "exact dup must surface")
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(hashed, "id", "bits", 4, 4) }
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(hashed, "id", "bits", 2, 5) }
  }

  test("videoFrameNearDups: planted shared frame found, same-video pairs excluded") {
    val rnd = new scala.util.Random(189L)
    def frame(): String = Seq.fill(64)(f"${rnd.nextInt(256)}%02X").mkString
    val shared = frame()
    // video 0: f0 f1 shared; video 1: f0 f1 shared (same last frame);
    // video 2: three fresh frames; video 3 repeats ITS OWN frame twice
    // (same-video pair must NOT surface)
    val own = frame()
    val vids = Seq(
      (0L, frame() + frame() + shared),
      (1L, frame() + frame() + shared),
      (2L, frame() + frame() + frame()),
      (3L, own + own + frame()))
    val got = Multimodal.videoFrameNearDups(vids.toDF("id", "hx"),
      "id", "hx", frameHexChars = 128, nFrames = 3, w = 8, h = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.contains((0L, 2L, 1L, 2L, 0L)), s"shared frame missing: $got")
    assert(!got.exists(r => r._1 == r._3), s"same-video pair leaked: $got")
    // random frames almost surely exceed hamming 3 — nothing else
    assert(got == Seq((0L, 2L, 1L, 2L, 0L)), got)
  }
}