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

  // -- real codec seam: WAV audio + MJPEG-AVI video ---------------------

  /** Real WAV bytes rendered in-test through the JDK's own writer:
    * 16-bit signed mono PCM, first half silence, second half full
    * square wave — unambiguous envelope structure. */
  private def realWav(rate: Int, nFrames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](nFrames * 2)
    for (f <- nFrames / 2 until nFrames) {
      val v: Short = if (f % 2 == 0) 32767 else -32768
      pcm(2 * f) = (v & 0xFF).toByte        // little-endian
      pcm(2 * f + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioDecodeBatch really decodes WAV: true rate/frames, envelope features") {
    val wav = realWav(8000, 4000)
    val in = Seq((1L, wav), (2L, junk)).toDF("id", "media")
    val rows = Multimodal.audioDecodeBatch(in, "id", "media", bins = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getInt(1) == 8000 && r1.getInt(2) == 1, r1)
    assert(r1.getLong(3) == 4000L, r1)
    assert(r1.getLong(4) == 500L, r1) // 4000 frames @ 8 kHz = 500 ms
    val f = r1.getSeq[Float](5)
    assert(f.size == 4)
    // first half silence, second half full-scale square wave
    assert(f(0) == 0f && f(1) == 0f, s"silent bins not silent: $f")
    assert(f(2) > 0.99f && f(3) > 0.99f, s"loud bins not loud: $f")
    // undecodable bytes degrade to a null row
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(5))
    // the sniffer sees the same bytes as RIFF
    val sniff = in.select($"id", Multimodal.sniffFormat($"media"))
      .as[(Long, String)].collect().toMap
    assert(sniff(1L) == "riff")
  }

  /** Real WAV with a per-bin amplitude PATTERN: 65 envelope bins of
    * `framesPerBin` square-wave frames each, bin i at amplitude
    * `amps(i)` — so [[Multimodal.audioDecodeBatch]]'s 65-bin envelope
    * reproduces `amps` up to scale and the gradient-sign fingerprint
    * is fully controlled. */
  private def realWavPattern(amps: Seq[Double],
                             framesPerBin: Int = 40): Array[Byte] = {
    import javax.sound.sampled._
    val nFrames = amps.size * framesPerBin
    val pcm = new Array[Byte](nFrames * 2)
    for (f <- 0 until nFrames) {
      val a = amps(f / framesPerBin)
      val v = (if (f % 2 == 0) a * 32000 else -a * 32000).toInt.toShort
      pcm(2 * f) = (v & 0xFF).toByte
      pcm(2 * f + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioNearDupsFromMedia: re-gained copy found across REAL WAVs, reshuffled envelope is not a dup") {
    // deterministic amplitude walk with distinct neighbors (steps of
    // 37 mod 64 never tie), so all 64 gradient signs are unambiguous
    val amps = (0 until 65).map(i => ((i * 37) % 64 + 1) / 65.0)
    val a = realWavPattern(amps)
    // uniform gain: every gradient SIGN survives → hamming 0 — the
    // re-encoded/re-mastered copy a content hash cannot see
    val b = realWavPattern(amps.map(_ * 0.5))
    // same values in reversed bin order: a different loudness contour
    val c = realWavPattern(amps.reverse)
    val in = Seq((1L, a), (2L, b), (3L, c), (4L, junk))
      .toDF("id", "media")
    val got = Multimodal.audioNearDupsFromMedia(in, "id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.contains((1L, 2L, 0L)), s"planted dup not found: ${got.toSeq}")
    // the reversed contour must not pair with either copy, and the
    // junk row degrades to no fingerprint, never a failure
    assert(got.forall { case (x, y, _) => Set(x, y) == Set(1L, 2L) },
      s"false pairs: ${got.toSeq}")
  }

  test("audioNearDupsFromMedia: silence-padded copy of a REAL WAV is found (alignment normalization)") {
    val amps = (0 until 65).map(i => ((i * 37) % 64 + 1) / 65.0)
    val a = realWavPattern(amps)
    // the commonest real-world audio dup: the same clip re-encoded
    // with leading/trailing silence — every duration-relative bin
    // shifts unless the envelope is binned over the trimmed loud span
    val padded = realWavPattern(
      Seq.fill(10)(0.0) ++ amps ++ Seq.fill(7)(0.0))
    val in = Seq((1L, a), (2L, padded)).toDF("id", "media")
    val got = Multimodal.audioNearDupsFromMedia(in, "id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 0L)),
      s"padded copy not recognized: ${got.toSeq}")
  }

  test("audioFingerprintBits: short envelope degrades to NULL, 65-bin fingerprints unchanged") {
    import org.apache.spark.sql.functions._
    val in = Seq(
      (1L, (0 until 65).map(i => i.toDouble)), // full: monotone up
      (2L, (0 until 64).map(i => i.toDouble)), // one short of contract
      (3L, Seq(1.0, 2.0, 3.0)))                // way short
      .toDF("id", "env")
    val got = in.select($"id",
      Multimodal.audioFingerprintBits($"env").as("bits"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == "0" * 64, got(1L)) // env[j] > env[j+1] never
    assert(got(2L) == null && got(3L) == null,
      s"short envelopes must degrade to null, got $got")
  }

  /** Real MPEG1 Layer III frames built header-by-header: 4-byte
    * header (sync, version, layer, bitrate idx, samplerate idx,
    * mono) + zero-filled payload to the standard frame length. */
  private def mp3Frames(kbpsSeq: Seq[Int]): Array[Byte] = {
    val brIdxV1L3 =
      Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    kbpsSeq.flatMap { kbps =>
      val idx = brIdxV1L3.indexOf(kbps)
      require(idx > 0, s"not a V1L3 bitrate: $kbps")
      val frameLen = 144 * kbps * 1000 / 44100
      val f = new Array[Byte](frameLen)
      f(0) = 0xFF.toByte           // sync
      f(1) = 0xFB.toByte           // MPEG1, layer III, no CRC
      f(2) = (idx << 4).toByte     // bitrate idx, 44100, no padding
      f(3) = 0xC0.toByte           // mono
      f
    }.toArray
  }

  test("mp3MetadataBatch: frame-header walk yields true rate/frames/duration/bitrate, no PCM") {
    val cbr = mp3Frames(Seq.fill(50)(128))
    // ID3v2 tag in front: 10-byte header + 200-byte body, syncsafe len
    val id3 = "ID3".getBytes("US-ASCII") ++
      Array(4, 0, 0, 0, 0, 1, 72).map(_.toByte) ++
      new Array[Byte](200) ++ cbr
    val vbr = mp3Frames(Seq.tabulate(40)(i => if (i % 2 == 0) 128 else 160))
    val in = Seq((1L, cbr), (2L, id3), (3L, vbr), (4L, junk))
      .toDF("id", "media")
    val rows = Multimodal.mp3MetadataBatch(in, "id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) { // the tag must not change the walk
      val r = rows(id)
      assert(r.getInt(1) == 44100 && r.getInt(2) == 1, r)
      assert(r.getLong(3) == 50L, r)
      // 50 frames × 1152 samples at 44.1 kHz = 1306 ms exact-integer
      assert(r.getLong(4) == 50L * 1152 * 1000 / 44100, r)
      assert(r.getInt(5) == 128, r)
    }
    val v = rows(3L)
    assert(v.getLong(3) == 40L, v)
    assert(v.getInt(5) == 144, s"VBR avg nominal bitrate: $v") // (128+160)/2
    // junk degrades to a null row, never a failure
    assert(rows(4L).isNullAt(1) && rows(4L).isNullAt(4))
  }

  test("image_near_dup / audio_near_dup TVFs: equal the direct pair mine; wrong columns refused loudly") {
    import org.apache.spark.sql.functions._
    val rasters = spark.range(20).select($"id",
      upper(concat(md5($"id".cast("string")),
        md5(concat($"id".cast("string"), lit("2"))),
        md5(concat($"id".cast("string"), lit("3"))),
        md5(concat($"id".cast("string"), lit("4"))))).as("hx"))
    val withDup = rasters.union(rasters.filter($"id" === 3)
      .select(($"id" + 100).as("id"),
        concat(lit("FF"), expr("substring(hx, 3)")).as("hx")))
    withDup.createOrReplaceTempView("tvf_rasters")
    val direct = Multimodal.imageNearDupPairs(
      withDup.select($"id", Multimodal.dHashBits($"hx", 8, 8).as("bits")),
      "id", "bits", 3, 4).collect().map(_.toSeq).toSeq
    val viaSql = spark.sql(
      "SELECT * FROM image_near_dup('tvf_rasters', 'id', 'hx', 3, 4) " +
        "ORDER BY idA, idB").collect().map(_.toSeq).toSeq
    assert(viaSql == direct && direct.nonEmpty)
    val envs = spark.range(20).select($"id",
      transform(sequence(lit(0), lit(64)),
        i => sin($"id" * 11 + i)).as("env"))
    val withEnvDup = envs.union(envs.filter($"id" === 5)
      .select(($"id" + 100).as("id"),
        transform($"env", (x, i) =>
          when(i === 7, lit(0.9)).otherwise(x)).as("env")))
    withEnvDup.createOrReplaceTempView("tvf_envs")
    val directA = Multimodal.audioNearDupPairs(
      withEnvDup.select($"id",
        Multimodal.audioFingerprintBits($"env").as("bits")),
      "id", "bits", 3, 4).collect().map(_.toSeq).toSeq
    val viaSqlA = spark.sql(
      "SELECT * FROM audio_near_dup('tvf_envs', 'id', 'env', 3, 4) " +
        "ORDER BY idA, idB").collect().map(_.toSeq).toSeq
    assert(viaSqlA == directA && directA.nonEmpty)
    // wrong column: named refusal, not an unresolved-column error
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM image_near_dup('tvf_rasters', 'id', " +
        "'raster', 3, 4)").collect()
    }
    assert(e1.getMessage.contains("table lacks"), e1.getMessage.take(300))
    // the pigeonhole guard fires loudly through the parser door too
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM audio_near_dup('tvf_envs', 'id', 'env', " +
        "4, 4)").collect()
    }
    assert(e2.getMessage.contains("pigeonhole"), e2.getMessage.take(300))
  }

  // -- ISO-BMFF (MP4) fixture built box-by-box ------------------------
  private def u32be(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    u32be(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
  private def tkhdV0(w: Int, h: Int): Array[Byte] = {
    // ver/flags, ctime, mtime, track_id, res, duration, res(8),
    // layer/alt/volume/res, matrix(36), then 16.16 width/height
    val head = new Array[Byte](84 - 8)
    box("tkhd", head ++ u32be(w.toLong << 16) ++ u32be(h.toLong << 16))
  }

  test("mp4MetadataBatch: ISO-BMFF box walk yields brand/timescale/duration/tracks/dims") {
    val mvhdV0 = box("mvhd", new Array[Byte](12) ++
      u32be(1000L) ++ u32be(5000L) ++ new Array[Byte](80))
    val moov = box("moov",
      box("trak", tkhdV0(0, 0)) ++        // audio track: 0×0 dims
        box("trak", tkhdV0(320, 240)) ++  // video track
        mvhdV0)
    val mp4 = box("ftyp",
      "isom".getBytes("US-ASCII") ++ new Array[Byte](8)) ++
      box("mdat", new Array[Byte](32)) ++ moov
    // v1 mvhd: 64-bit times/duration, same movie length at 90 kHz
    val mvhdV1 = box("mvhd", Array(1, 0, 0, 0).map(_.toByte) ++
      new Array[Byte](16) ++ u32be(90000L) ++
      u32be(0L) ++ u32be(450000L) ++ new Array[Byte](80))
    val mp4v1 = box("ftyp",
      "mp42".getBytes("US-ASCII") ++ new Array[Byte](8)) ++
      box("moov", mvhdV1)
    val in = Seq((1L, mp4), (2L, mp4v1), (3L, junk))
      .toDF("id", "media")
    val rows = Multimodal.mp4MetadataBatch(in, "id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getString(1) == "isom", r1)
    assert(r1.getLong(2) == 1000L && r1.getLong(3) == 5000L, r1)
    assert(r1.getInt(4) == 2, r1) // both tracks counted
    assert(r1.getInt(5) == 320 && r1.getInt(6) == 240, r1)
    val r2 = rows(2L)
    assert(r2.getString(1) == "mp42", r2)
    assert(r2.getLong(2) == 90000L && r2.getLong(3) == 5000L, r2)
    assert(r2.getInt(4) == 0 && r2.isNullAt(5), r2) // no tracks, no dims
    // junk degrades to a null row, never a failure
    assert(rows(3L).isNullAt(1) && rows(3L).isNullAt(3))
  }

  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ u32le(data.length) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def riffList(subtype: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", subtype.getBytes("US-ASCII") ++ data)

  /** Real MJPEG-AVI bytes built chunk by chunk: RIFF('AVI ') with an
    * avih/strh/strf header list and the frames as JPEG '00dc' chunks
    * inside 'movi' — the layout every MJPEG camera writes. */
  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val avih = u32le(40000) ++ u32le(0) ++ u32le(0) ++ u32le(0x10) ++
      u32le(frames.size) ++ u32le(0) ++ u32le(1) ++ u32le(0) ++
      u32le(w) ++ u32le(h) ++ Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      u32le(0) ++ u32le(0) ++ u32le(0) ++ u32le(1) ++ u32le(25) ++
      u32le(0) ++ u32le(frames.size) ++ u32le(0) ++ u32le(0) ++
      u32le(0) ++ Array.fill(8)(0.toByte)
    val strf = u32le(40) ++ u32le(w) ++ u32le(h) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
      "MJPG".getBytes("US-ASCII") ++ u32le(w * h * 3) ++ Array.fill(16)(0.toByte)
    val hdrl = riffList("hdrl", chunk("avih", avih) ++
      riffList("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = riffList("movi",
      frames.flatMap(fb => chunk("00dc", fb)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
  }

  /** A deterministic noise JPEG — per-pixel colors from a seeded RNG,
    * so different seeds give perceptually distant frames while the
    * same seed gives byte-identical JPEGs. */
  private def noiseJpeg(seed: Long, w: Int = 32, h: Int = 24): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt(0x1000000))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("videoDecodeBatch really parses MJPEG-AVI: frame count, dims, sampled rasters") {
    val fs = Seq(noiseJpeg(1), noiseJpeg(2), noiseJpeg(3), noiseJpeg(4))
    val avi = mjpegAvi(fs, 32, 24)
    val in = Seq((1L, avi), (2L, junk)).toDF("id", "media")
    val rows = Multimodal.videoDecodeBatch(in, "id", "media",
        w = 8, h = 8, nFrames = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(r1.getInt(1) == 32 && r1.getInt(2) == 24, r1) // true JPEG dims
    assert(r1.getInt(3) == 4, r1) // container's total frame count
    val rasters = r1.getSeq[String](4)
    assert(rasters.size == 2) // sampled down to nFrames
    assert(rasters.forall(_.length == 8 * 8 * 2)) // 2 hex chars / pixel
    assert(rasters.forall(_.matches("[0-9A-F]+")))
    assert(rasters(0) != rasters(1)) // distinct noise frames differ
    // junk bytes degrade to a null row, not a task failure
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(4))
    // the chunk walk itself: all four payloads recovered byte-exact
    val chunks = Multimodal.aviVideoFrames(avi)
    assert(chunks.exists(_.length == 4))
    assert(chunks.get.map(_.toSeq).toSeq == fs.map(_.toSeq),
      "frame payloads must round-trip byte-exact")
    // a truncated container stops cleanly instead of reading past end
    val cut = Multimodal.aviVideoFrames(avi.take(avi.length / 2))
    assert(cut.isDefined) // RIFF header parses; walk clamps
    assert(Multimodal.aviVideoFrames(junk).isEmpty)
  }

  test("videoNearDupsFromMedia: dup clip found across REAL encoded videos") {
    // videos A and B share frame seed 7 (byte-identical JPEG chunks);
    // C is all fresh noise; B also repeats its own frame (same-video
    // pair must not surface)
    val a = mjpegAvi(Seq(noiseJpeg(1), noiseJpeg(7)), 32, 24)
    val b = mjpegAvi(Seq(noiseJpeg(7), noiseJpeg(9), noiseJpeg(9)), 32, 24)
    val c = mjpegAvi(Seq(noiseJpeg(20), noiseJpeg(21)), 32, 24)
    val in = Seq((0L, a), (1L, b), (2L, c), (3L, junk)).toDF("id", "media")
    val got = Multimodal.videoNearDupsFromMedia(in, "id", "media",
        w = 9, h = 8, nFrames = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // A's frame 1 == B's frame 0, decoded from real JPEG bytes →
    // identical rasters → hamming 0; B samples 3 frames (7,9,9)
    assert(got.contains((0L, 1L, 1L, 0L, 0L)), s"shared clip missing: $got")
    assert(!got.exists(r => r._1 == r._3), s"same-video pair leaked: $got")
    // every reported pair is within the gate
    assert(got.forall(_._5 <= 3), got)
  }

  test("torn mid-stream frame: survivors keep TRUE container indices, dup verdicts name them") {
    // container A: [good, TORN, good] — the torn chunk walks (valid
    // RIFF size) but fails JPEG decode; the surviving second good
    // frame is container frame 2, and compacted array-position
    // numbering would mis-name it 1 (VERDICT r8 minor)
    val torn = Array.fill(200)(0x55.toByte)
    val a = mjpegAvi(Seq(noiseJpeg(1), torn, noiseJpeg(7)), 32, 24)
    val b = mjpegAvi(Seq(noiseJpeg(7)), 32, 24)
    val dec = Multimodal.videoDecodeBatch(
        Seq((0L, a)).toDF("id", "media"), "id", "media",
        w = 9, h = 8, nFrames = 3)
      .collect().head
    assert(dec.getInt(3) == 3, dec) // container count includes the torn
    assert(dec.getSeq[String](4).size == 2) // two frames decoded
    assert(dec.getSeq[Int](5) == Seq(0, 2), // true container indices
      s"frame_idx = ${dec.getSeq[Int](5)}")
    val got = Multimodal.videoNearDupsFromMedia(
        Seq((0L, a), (1L, b)).toDF("id", "media"), "id", "media",
        w = 9, h = 8, nFrames = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.contains((0L, 2L, 1L, 0L, 0L)),
      s"shared clip must be named by container frame 2, got: $got")
  }
}