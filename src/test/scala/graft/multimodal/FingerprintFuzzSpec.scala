package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal.Codecs

/** Adversarial differential fuzz for the perceptual-fingerprint family:
  * RANDOM payloads (not doc_id-derived, unlike the oracle gates' synthetic
  * corpora) round-tripped through the real codecs and compared against
  * independently-written plain-Scala models, plus the banding-recall
  * property that justifies [[Multimodal.imageNearDupPairs]]'s enforced
  * `maxHamming <= 7` contract. */
class FingerprintFuzzSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ image aHash

  /** Independent model: block-mean grayscale over the raw pixel matrix. */
  private def modelAHash(px: Array[Array[Int]]): Long = {
    val h = px.length; val w = px(0).length
    val grays = new Array[Long](64)
    for (by <- 0 until 8; bx <- 0 until 8) {
      val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
      val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
      var rs = 0L; var gs = 0L; var bs = 0L
      for (y <- y0 until y1; x <- x0 until x1) {
        val rgb = px(y)(x)
        rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
      }
      val n = (x1 - x0).toLong * (y1 - y0)
      grays(by * 8 + bx) = (rs / n + gs / n + bs / n) / 3
    }
    val mean = grays.sum / 64
    (0 until 64).foldLeft(0L)((acc, i) =>
      if (grays(i) >= mean) acc | (1L << (63 - i)) else acc)
  }

  test("aHash of random PNGs matches the plain-Scala block-mean model bit-for-bit") {
    val rnd = new scala.util.Random(0xA5A5L)
    for (trial <- 0 until 30) {
      val w = 8 + rnd.nextInt(40) // 8..47, including non-multiples of 8
      val h = 8 + rnd.nextInt(40)
      val px = Array.fill(h, w)(rnd.nextInt(1 << 24))
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(y)(x))
      val png = Codecs.encodePng(img)
      withClue(s"trial $trial (${w}x$h): ") {
        Codecs.aHash(png) shouldBe Some(modelAHash(px))
      }
    }
  }

  // --------------------------------------------------------- audio energy

  /** Independent model: per-window mean-energy threshold at the stream
    * mean via integer cross-multiplication; the LAST window absorbs the
    * n % windows remainder (every sample counts). */
  private def modelAudioHash(samples: Array[Short], windows: Int): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val win = math.max(1, n / windows)
    val sumSq = new Array[Long](windows)
    val cnt = new Array[Long](windows)
    for (w <- 0 until windows) {
      val s0 = w * win
      val s1 = if (w == windows - 1) n else math.min(n, s0 + win)
      for (i <- s0 until s1) {
        val sv = samples(i).toInt
        sumSq(w) += sv.toLong * sv
      }
      cnt(w) = math.max(0, s1 - s0)
    }
    val totalSq = sumSq.sum; val totalCnt = cnt.sum
    require(totalCnt == n, s"model must count every sample: $totalCnt != $n")
    (0 until windows).foldLeft(0L)((acc, b) =>
      if (cnt(b) > 0 && sumSq(b) * totalCnt >= totalSq * cnt(b))
        acc | (1L << (windows - 1 - b))
      else acc)
  }

  test("audioHash of random WAVs matches the plain-Scala energy model, any stream length") {
    val rnd = new scala.util.Random(0x5A5AL)
    for (trial <- 0 until 30) {
      val windows = Seq(12, 16)(trial % 2)
      // lengths deliberately NOT multiples of `windows`, plus shorter-than-
      // windows streams — the trailing-sample and empty-window edge cases
      val n = 1 + rnd.nextInt(200)
      val samples = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      val wav = Codecs.encodeWavPcm16(samples, 8000f)
      withClue(s"trial $trial (n=$n, windows=$windows): ") {
        Codecs.audioHash(wav, windows) shouldBe Some(modelAudioHash(samples, windows))
      }
    }
  }

  // ------------------------------------------------- audio (G.711 μ-law)

  /** Closed-form G.711 μ-law expansion — the independent model the JDK's
    * ULAW converter must match byte-for-byte. */
  private def g711(u: Int): Int = {
    val uInv = ~u & 0xff
    val mag = ((((uInv & 0xf) << 3) + 0x84) << ((uInv >> 4) & 7)) - 0x84
    if ((uInv & 0x80) != 0) -mag else mag
  }

  test("audioHash of random mu-law WAVs matches the G.711 formula model, any length") {
    val rnd = new scala.util.Random(0x6711L)
    for (trial <- 0 until 30) {
      val windows = Seq(8, 12, 16)(trial % 3)
      val n = 1 + rnd.nextInt(300) // deliberately not window-aligned
      val ulaw = Array.fill(n)(rnd.nextInt(256).toByte)
      val wav = Codecs.encodeWavUlaw(ulaw, 8000f)
      val samples = ulaw.map(b => g711(b & 0xff).toShort)
      withClue(s"trial $trial (n=$n windows=$windows): ") {
        Codecs.audioHash(wav, windows) shouldBe Some(modelAudioHash(samples, windows))
      }
    }
  }

  /** Closed-form G.711 A-law expansion in the JDK's sign convention
    * (bit 7 of the toggled byte CLEAR → negative). */
  private def g711a(a: Int): Int = {
    val ai = (a ^ 0x55) & 0xff
    val exp = (ai >> 4) & 7
    val man = ai & 0xf
    val mag = if (exp == 0) (man << 4) + 8 else ((man << 4) + 0x108) << (exp - 1)
    if ((ai & 0x80) != 0) mag else -mag
  }

  test("audioHash of random A-law WAVs matches the G.711 A-law formula model") {
    val rnd = new scala.util.Random(0xA1A3L)
    for (trial <- 0 until 20) {
      val n = 1 + rnd.nextInt(300)
      val alaw = Array.fill(n)(rnd.nextInt(256).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false)
      val bos = new java.io.ByteArrayOutputStream()
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(alaw), fmt, n.toLong)
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val samples = alaw.map(b => g711a(b & 0xff).toShort)
      withClue(s"trial $trial (n=$n): ") {
        Codecs.audioHash(bos.toByteArray, 12) shouldBe Some(modelAudioHash(samples, 12))
      }
    }
  }

  // --------------------------------------------------- video (MJPEG/AVI)

  test("MJPEG-AVI round-trip: random quadrant permutations match the aHash model per frame") {
    val rnd = new scala.util.Random(0x51DE0L)
    val grays = Array(40, 90, 160, 220)
    for (trial <- 0 until 12) {
      val nFrames = 1 + rnd.nextInt(6)
      val perms = Seq.fill(nFrames)(rnd.shuffle(grays.toList))
      val frames = perms.map { p =>
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for (y <- 0 until 16; x <- 0 until 16) {
          val g = p((y / 8) * 2 + (x / 8))
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
        }
        img
      }
      val fps = 1 + rnd.nextInt(30)
      val avi = Codecs.encodeAviMjpeg(frames, fps)
      withClue(s"trial $trial (frames=$nFrames fps=$fps): ") {
        Codecs.aviMeta(avi) shouldBe
          Some(("video/avi", 16, 16, nFrames.toLong * (1000000 / fps) / 1000L))
        val decoded = Codecs.aviFrames(avi)
        decoded.size shouldBe nFrames
        decoded.zip(perms).foreach { case (j, p) =>
          // model: 8 block-rows; rows 0-3 carry quadrants 0/1, 4-7 carry 2/3
          def bit(q: Int): Boolean = p(q) >= 128
          def rowByte(a: Boolean, b: Boolean): Long =
            (if (a) 0xf0L else 0L) | (if (b) 0x0fL else 0L)
          val expected = (0 until 8).foldLeft(0L)((acc, row) =>
            (acc << 8) | (if (row < 4) rowByte(bit(0), bit(1))
                          else rowByte(bit(2), bit(3))))
          Codecs.aHash(j) shouldBe Some(expected)
        }
      }
    }
  }

  test("AVI parsers never throw on corrupted, truncated, or random payloads") {
    val rnd = new scala.util.Random(0xC0FFEEL)
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val valid = Codecs.encodeAviMjpeg(Seq(img, img), fps = 8)
    for (trial <- 0 until 60) {
      val payload = trial % 3 match {
        case 0 => // random bytes (often with a RIFF prefix to get past the gate)
          val b = Array.fill(rnd.nextInt(500))(rnd.nextInt(256).toByte)
          if (b.length >= 12 && rnd.nextBoolean()) {
            "RIFF".getBytes.copyToArray(b, 0); "AVI ".getBytes.copyToArray(b, 8)
          }
          b
        case 1 => valid.take(rnd.nextInt(valid.length + 1)) // truncation
        case 2 => // bit flips inside a valid file (sizes, fourccs, payloads)
          val b = valid.clone()
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            val i = rnd.nextInt(b.length)
            b(i) = (b(i) ^ (1 << rnd.nextInt(8))).toByte
          }
          b
      }
      withClue(s"trial $trial: ") {
        noException should be thrownBy Codecs.aviMeta(payload)
        noException should be thrownBy Codecs.aviFrames(payload)
        noException should be thrownBy Codecs.videoFeatures(payload, 12)
        noException should be thrownBy Codecs.sampleFrames(payload, 4)
      }
    }
  }

  test("AVI walk survives adversarial-but-valid layouts: junk chunks, idx1, odd padding, truncated movi") {
    // random VALID RIFF layouts (not our own encoder's): JUNK chunks with
    // odd-sized bodies before/inside/after the lists, extra non-frame
    // stream chunks ('01wb' audio), an idx1 index, a trailing JUNK — the
    // frames must come back byte-identical and in order; a movi cut mid-
    // chunk must yield exactly the frames that fully fit, never a throw
    val rnd = new scala.util.Random(0xAD1AL)
    def dwords(vs: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putInt); bb.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(id.getBytes("US-ASCII")); out.write(dwords(body.length)); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF word alignment
      out.toByteArray
    }
    def list(tpe: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val body = parts.flatten.toArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("LIST".getBytes("US-ASCII")); out.write(dwords(body.length + 4))
      out.write(tpe.getBytes("US-ASCII")); out.write(body)
      out.toByteArray
    }
    def junk(): Array[Byte] = // odd sizes on purpose: padding must be walked
      chunk("JUNK", Array.fill(1 + rnd.nextInt(37))(rnd.nextInt(256).toByte))
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (trial <- 0 until 25) {
      val nFrames = 1 + rnd.nextInt(5)
      val jpegs = (0 until nFrames).map { f =>
        for (y <- 0 until 16; x <- 0 until 16) {
          val g = (f * 37 + ((x / 8) * 2 + y / 8) * 53 + 40) % 256
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
        }
        Codecs.encodeJpeg(img)
      }
      val usPerFrame = 1000 + rnd.nextInt(100000)
      val avih = chunk("avih", dwords(usPerFrame, 0, 0, 0x10,
        nFrames, 0, 1, 0, 16, 16, 0, 0, 0, 0))
      val moviParts = jpegs.flatMap { j =>
        val junks = Seq.fill(rnd.nextInt(2))(junk()) ++
          Seq.fill(rnd.nextInt(2))(chunk("01wb", // audio chunk: not a frame
            Array.fill(1 + rnd.nextInt(19))(rnd.nextInt(256).toByte)))
        rnd.shuffle(junks) :+ chunk("00dc", j)
      }
      val idx1 = chunk("idx1",
        jpegs.flatMap(j => dwords(0x63643030, 0x10, 4, j.length)).toArray)
      val body = Seq.fill(rnd.nextInt(3))(junk()) ++
        Seq(list("hdrl", Seq(avih))) ++
        Seq.fill(rnd.nextInt(3))(junk()) ++
        Seq(list("movi", moviParts)) ++
        Seq(idx1) ++ Seq.fill(rnd.nextInt(2))(junk())
      val payload = body.flatten.toArray
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII")); out.write(dwords(payload.length + 4))
      out.write("AVI ".getBytes("US-ASCII")); out.write(payload)
      val avi = out.toByteArray
      withClue(s"trial $trial (frames=$nFrames): ") {
        Codecs.aviMeta(avi) shouldBe
          Some(("video/avi", 16, 16, nFrames.toLong * usPerFrame / 1000L))
        val decoded = Codecs.aviFrames(avi)
        decoded.size shouldBe nFrames
        decoded.zip(jpegs).foreach { case (d, j) => d shouldBe j }
        // a cut anywhere inside the file yields a PREFIX of the frames
        val cut = avi.take(rnd.nextInt(avi.length))
        val partial = Codecs.aviFrames(cut)
        partial.size should be <= nFrames
        partial.zip(jpegs).foreach { case (d, j) => d shouldBe j }
        noException should be thrownBy Codecs.videoFeatures(cut, 12)
      }
    }
  }

  // ------------------------------------------------------- banding recall

  test("banded mining finds EVERY pair within Hamming 7; an 8-bit evader can slip") {
    val rnd = new scala.util.Random(0xBEEFL)
    // plant 40 pairs at Hamming 0..7: (i, i + 10000) with d random bit flips
    val planted = (0 until 40).map { i =>
      val base = rnd.nextLong()
      val d = i % 8
      val flips = rnd.shuffle((0 until 64).toList).take(d)
      val mutated = flips.foldLeft(base)((h, b) => h ^ (1L << b))
      (i.toLong, base, i + 10000L, mutated, d)
    }
    val rows = planted.flatMap { case (a, ha, b, hb, _) => Seq((a, ha), (b, hb)) }
      .toDF("media_id", "ahash")
    val found = Multimodal.imageNearDupPairs(rows)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    planted.foreach { case (a, _, b, _, d) =>
      withClue(s"planted pair ($a,$b) at Hamming $d: ") {
        found.get((a, b)) shouldBe Some(d)
      }
    }
    // the pigeonhole boundary: flip exactly ONE bit in EACH of the 8 bands
    // (Hamming 8, no shared band) — banding legitimately misses it, which
    // is why maxHamming > 7 is refused as an argument
    val base = rnd.nextLong()
    val evader = (0 until 8).foldLeft(base)((h, band) => h ^ (1L << (band * 8 + 3)))
    java.lang.Long.bitCount(base ^ evader) shouldBe 8
    val two = Seq((1L, base), (2L, evader)).toDF("media_id", "ahash")
    Multimodal.imageNearDupPairs(two).count() shouldBe 0
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(two, maxHamming = 8)
    }
  }
}
