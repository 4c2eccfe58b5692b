package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (image/audio/video) processing for a training-data pipeline.
  *
  * Media rides as an opaque `binary` column plus a typed metadata struct;
  * decode / feature-extraction / resize / frame-sampling run as typed
  * `mapPartitions` stages (the JVM-side equivalent of `mapInPandas`
  * batches: one iterator per partition, amortized per-batch setup).
  *
  * Codec reality in this container: the JDK itself ships real codecs for
  * the two most common still formats — `javax.imageio` decodes/encodes
  * PNG/JPEG/GIF/BMP and `javax.sound.sampled` reads/writes WAV PCM — and
  * Motion-JPEG needs no inter-frame state, so VIDEO is a real decode path
  * too: [[Codecs.aviFrames]] walks the RIFF/AVI container and each frame
  * decodes through the JDK JPEG codec. Image, uncompressed-audio, and
  * MJPEG-video legs below are therefore all REAL (bytes → pixels/samples/
  * frames → features/thumbnails). Only compressed audio and non-MJPEG
  * video (no ffmpeg/libopus here) fall back to the clearly-marked
  * deterministic stand-in, [[Codecs.hashFeatures]].
  */
object Multimodal {

  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, feature: Array[Float], featureNorm: Double)
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Codec boundary. Image, WAV-audio, and MJPEG-AVI video functions call
    * the JDK's real decoders; [[hashFeatures]] (and [[sampleFrames]]'
    * byte-slice branch) are the deterministic stand-ins for formats this
    * container cannot decode (compressed audio, non-MJPEG video) — kept
    * honest and clearly named. */
  object Codecs {

    // ImageIO's default stream cache spills every (de)coder stream through
    // a temp FILE — for in-memory byte arrays that is pure overhead (and a
    // tmpdir dependency inside executor tasks); keep codec IO on-heap
    javax.imageio.ImageIO.setUseCache(false)

    // ---- images (real: javax.imageio — PNG/JPEG/GIF/BMP) ----

    /** Full decode to pixels; None when no installed reader understands the
      * bytes (then the caller falls through to audio / the hash stub). */
    def decodeImage(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(content)))
      catch { case scala.util.control.NonFatal(_) => None }

    /** Header-only parse: (mime, width, height) without decoding pixel data
      * — the cheap path for stamping [[MediaMeta]] at ingest. */
    def imageMeta(content: Array[Byte]): Option[(String, Int, Int)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new ByteArrayInputStream(content))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Some((s"image/${r.getFormatName.toLowerCase}", r.getWidth(0), r.getHeight(0)))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Image features: decode, split into a g×g grid (g = ⌊√(dim/3)⌋, ≥1),
      * emit per-cell channel means normalized by 256 — row-major cells,
      * [r,g,b] per cell; dims past g·g·3 are zero. The /256 normalizer (not
      * /255) keeps every integer channel mean exactly representable in both
      * float and double, so an external oracle reproduces the values
      * bit-for-bit. */
    def imageFeatures(content: Array[Byte], dim: Int): Option[Array[Float]] =
      decodeImage(content).map { img =>
        val g = math.max(1, math.sqrt(dim / 3.0).toInt)
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Float](dim)
        var gy = 0
        while (gy < g) {
          var gx = 0
          while (gx < g) {
            val x0 = gx * w / g; val x1 = math.max(x0 + 1, (gx + 1) * w / g)
            val y0 = gy * h / g; val y1 = math.max(y0 + 1, (gy + 1) * h / g)
            var (rs, gs, bs) = (0L, 0L, 0L)
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = ((x1 - x0).toLong * (y1 - y0)).toDouble
            val base = (gy * g + gx) * 3
            if (base + 2 < dim) {
              out(base) = (rs / n / 256.0).toFloat
              out(base + 1) = (gs / n / 256.0).toFloat
              out(base + 2) = (bs / n / 256.0).toFloat
            }
            gx += 1
          }
          gy += 1
        }
        out
      }

    /** Real thumbnail: decode → deterministic block-mean downsample to w×h
      * (Graphics2D filtering varies by JDK; an explicit mean does not) →
      * PNG re-encode. None for undecodable payloads. */
    def resizeImage(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeImage(content).map { img =>
        val (sw, sh) = (img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var ty = 0
        while (ty < h) {
          var tx = 0
          while (tx < w) {
            val x0 = tx * sw / w; val x1 = math.max(x0 + 1, (tx + 1) * sw / w)
            val y0 = ty * sh / h; val y1 = math.max(y0 + 1, (ty + 1) * sh / h)
            var (rs, gs, bs) = (0L, 0L, 0L)
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = (x1 - x0).toLong * (y1 - y0)
            out.setRGB(tx, ty,
              (((rs / n).toInt & 0xff) << 16) | (((gs / n).toInt & 0xff) << 8) |
                ((bs / n).toInt & 0xff))
            tx += 1
          }
          ty += 1
        }
        encodePng(out)
      }

    /** 64-bit average-hash (aHash) perceptual fingerprint: deterministic
      * 8×8 block-mean grayscale (integer arithmetic throughout — no
      * Graphics2D filtering, so the value is JDK-independent), thresholded
      * at the integer mean, bits row-major MSB-first. The standard cheap
      * near-dup hash for images: identical content up to mild resize /
      * re-encode lands on equal or small-Hamming-distance hashes. None
      * for undecodable payloads. */
    def aHash(content: Array[Byte]): Option[Long] =
      decodeImage(content).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val grays = new Array[Long](64)
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
            val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
            var (rs, gs, bs) = (0L, 0L, 0L)
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                rs += (rgb >> 16) & 0xff; gs += (rgb >> 8) & 0xff; bs += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = (x1 - x0).toLong * (y1 - y0)
            grays(by * 8 + bx) = (rs / n + gs / n + bs / n) / 3
            bx += 1
          }
          by += 1
        }
        val mean = grays.sum / 64
        var hash = 0L
        var i = 0
        while (i < 64) { if (grays(i) >= mean) hash |= 1L << (63 - i); i += 1 }
        hash
      }

    // ---- audio (real: javax.sound.sampled — WAV PCM) ----

    def encodeWavPcm16(samples: Array[Short], sampleRate: Float): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) { // little-endian per the format above
        pcm(i * 2) = (samples(i) & 0xff).toByte
        pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val bos = new ByteArrayOutputStream()
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Encode raw G.711 μ-law bytes as a WAV (format tag 7) — the
      * ubiquitous telephony codec, and a COMPRESSED encoding the JDK can
      * both container-write and decode. */
    def encodeWavUlaw(ulaw: Array[Byte], sampleRate: Float): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.ULAW,
        sampleRate, 8, 1, 1, sampleRate, false)
      val bos = new ByteArrayOutputStream()
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(ulaw), fmt, ulaw.length.toLong)
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** View a decoded audio stream as 16-bit signed PCM: already-PCM16
      * streams pass through; G.711 μ-law/A-law streams convert through the
      * JDK's REAL codec (whose table is exactly the closed-form G.711
      * decode — what makes the μ-law gates arithmetically replayable).
      * Other encodings are not decodable here. */
    private def asPcm16(ais: javax.sound.sampled.AudioInputStream)
        : Option[javax.sound.sampled.AudioInputStream] = {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16) Some(ais)
      else if (enc == javax.sound.sampled.AudioFormat.Encoding.ULAW ||
          enc == javax.sound.sampled.AudioFormat.Encoding.ALAW)
        Some(javax.sound.sampled.AudioSystem.getAudioInputStream(
          new javax.sound.sampled.AudioFormat(
            fmt.getSampleRate, 16, fmt.getChannels, true, false), ais))
      else None
    }

    /** Header-only parse: (mime, durationMs). */
    def wavMeta(content: Array[Byte]): Option[(String, Long)] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new ByteArrayInputStream(content))
        val ext = aff.getType.getExtension
        val ms = (aff.getFrameLength.toLong * 1000L /
          math.max(aff.getFormat.getFrameRate, 1f).toLong)
        Some((s"audio/$ext", ms))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Audio features: decode 16-bit PCM, split the sample stream into
      * `dim` equal windows, emit per-window RMS normalized by 32768 —
      * exact integer arithmetic until the final division, so constant-
      * amplitude windows reproduce bit-for-bit in an external oracle. */
    def wavFeatures(content: Array[Byte], dim: Int): Option[Array[Float]] =
      try {
        val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try asPcm16(src) match {
          case None => None
          case Some(ais) =>
            val fmt = ais.getFormat
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            val out = new Array[Float](dim)
            if (n == 0) Some(out)
            else {
              val win = math.max(1, n / dim)
              var w = 0
              while (w < dim) {
                val s0 = w * win; val s1 = math.min(n, s0 + win)
                if (s0 < n) {
                  var sumSq = 0L
                  var i = s0
                  while (i < s1) {
                    val lo = raw(i * 2) & 0xff
                    val hi = raw(i * 2 + 1).toInt // sign-extends
                    val s = if (fmt.isBigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | lo
                    val sv = s.toShort.toInt
                    sumSq += sv.toLong * sv
                    i += 1
                  }
                  out(w) = (math.sqrt(sumSq.toDouble / (s1 - s0)) / 32768.0).toFloat
                }
                w += 1
              }
              Some(out)
            }
        } finally src.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Audio energy fingerprint: split the PCM sample stream into
      * `windows` equal windows (the last absorbs the `n % windows`
      * remainder, so every sample counts); bit w (MSB-first) is set when window w's
      * MEAN energy is at or above the stream's mean energy. The comparison
      * is integer cross-multiplication (sumSq_w · totalCount ≥
      * totalSumSq · count_w) — no float accumulation anywhere, so the
      * fingerprint is exact and engine-reproducible. The audio analogue of
      * [[aHash]]: loudness-profile near-dups land on equal or
      * small-Hamming fingerprints. None for undecodable payloads. */
    def audioHash(content: Array[Byte], windows: Int = 16): Option[Long] =
      try {
        val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try asPcm16(src) match {
          case None => None
          case Some(ais) =>
            val fmt = ais.getFormat
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            if (n == 0) return Some(0L)
            val win = math.max(1, n / windows)
            val sumSq = new Array[Long](windows)
            val cnt = new Array[Long](windows)
            var w = 0
            while (w < windows) {
              // the LAST window extends to the stream end so the n % windows
              // trailing samples are counted (totalCnt == n for any length)
              val s0 = w * win
              val s1 = if (w == windows - 1) n else math.min(n, s0 + win)
              var i = s0
              while (i < s1) {
                val lo = raw(i * 2) & 0xff
                val hi = raw(i * 2 + 1).toInt
                val s = if (fmt.isBigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | lo
                val sv = s.toShort.toInt
                sumSq(w) += sv.toLong * sv
                i += 1
              }
              cnt(w) = math.max(0, s1 - s0)
              w += 1
            }
            val totalSq = sumSq.sum
            val totalCnt = cnt.sum
            var hash = 0L
            var b = 0
            while (b < windows) {
              if (cnt(b) > 0 && sumSq(b) * totalCnt >= totalSq * cnt(b))
                hash |= 1L << (windows - 1 - b)
              b += 1
            }
            Some(hash)
        } finally src.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    // ---- video (real: MJPEG-in-AVI — RIFF container + JDK JPEG codec) ----

    /** Encode frames as a minimal, structurally valid AVI (RIFF) carrying
      * Motion-JPEG: hdrl (avih + one 'vids'/'MJPG' stream) + movi ('00dc'
      * chunks, one JPEG per frame) + idx1. Everything little-endian,
      * chunks word-aligned. MJPEG needs no inter-frame state, so the JDK's
      * own JPEG codec is a REAL video decode path — no ffmpeg required. */
    def encodeAviMjpeg(frames: Seq[java.awt.image.BufferedImage], fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps > 0, "need frames and a positive fps")
      val jpegs = frames.map(encodeJpeg)
      val (w, h) = (frames.head.getWidth, frames.head.getHeight)
      def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
      def dwords(vs: Int*): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putInt); bb.array()
      }
      // builders render into whichever buffer is current, so a LIST can
      // render its body first and learn its own size
      var target = new ByteArrayOutputStream()
      def wChunk(id: String, body: Array[Byte]): Unit = {
        target.write(fourcc(id)); target.write(dwords(body.length)); target.write(body)
        if (body.length % 2 == 1) target.write(0) // RIFF word alignment
      }
      def wList(listType: String)(fill: => Unit): Unit = {
        val saved = target
        target = new ByteArrayOutputStream()
        try fill finally {
          val b = target.toByteArray
          target = saved
          target.write(fourcc("LIST")); target.write(dwords(b.length + 4))
          target.write(fourcc(listType)); target.write(b)
        }
      }
      val usPerFrame = 1000000 / fps
      val maxJpeg = jpegs.map(_.length).max
      wList("hdrl") {
        wChunk("avih", dwords(usPerFrame, maxJpeg * fps, 0, 0x10 /*HASINDEX*/,
          jpegs.length, 0, 1, maxJpeg, w, h, 0, 0, 0, 0))
        wList("strl") {
          val strh = new ByteArrayOutputStream()
          strh.write(fourcc("vids")); strh.write(fourcc("MJPG"))
          strh.write(dwords(0, 0, 0, 1 /*scale*/, fps /*rate*/, 0,
            jpegs.length, maxJpeg, -1 /*quality: default*/, 0))
          strh.write(dwords((h << 16) | w)) // rcFrame right/bottom packed
          wChunk("strh", strh.toByteArray.take(56).padTo(56, 0.toByte))
          val strf = new ByteArrayOutputStream()
          strf.write(dwords(40, w, h, (24 << 16) | 1 /*planes+bitcount*/))
          strf.write(fourcc("MJPG")); strf.write(dwords(w * h * 3, 0, 0, 0, 0))
          wChunk("strf", strf.toByteArray)
        }
      }
      wList("movi") { jpegs.foreach(j => wChunk("00dc", j)) }
      // idx1: one keyframe entry per chunk; offsets start at 4 (past 'movi')
      val idx = new ByteArrayOutputStream()
      var off = 4
      jpegs.foreach { j =>
        idx.write(fourcc("00dc")); idx.write(dwords(0x10, off, j.length))
        off += 8 + j.length + (j.length % 2)
      }
      wChunk("idx1", idx.toByteArray)
      val body = target.toByteArray
      val out = new ByteArrayOutputStream()
      out.write(fourcc("RIFF")); out.write(dwords(body.length + 4))
      out.write(fourcc("AVI ")); out.write(body)
      out.toByteArray
    }

    def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      // explicit quality: deterministic quantization tables across runs
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      val bos = new ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    private def le32At(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def fourccAt(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** Header-only AVI parse: (mime, width, height, durationMs) from the
      * avih main header. None for non-AVI payloads. */
    def aviMeta(content: Array[Byte]): Option[(String, Int, Int, Long)] =
      try {
        if (content.length < 24 || fourccAt(content, 0) != "RIFF" ||
            fourccAt(content, 8) != "AVI ") return None
        // hdrl is the first LIST; avih its first chunk
        var i = 12
        while (i + 8 <= content.length) {
          val id = fourccAt(content, i); val sz = le32At(content, i + 4)
          if (sz < 0) return None // corrupt size would walk backwards
          if (id == "LIST" && fourccAt(content, i + 8) == "hdrl") {
            val a = i + 12
            if (fourccAt(content, a) == "avih") {
              val usPerFrame = le32At(content, a + 8)
              val frames = le32At(content, a + 24)
              val w = le32At(content, a + 40); val h = le32At(content, a + 44)
              return Some(("video/avi", w, h, frames.toLong * usPerFrame / 1000L))
            }
            return None
          }
          i += 8 + sz + (sz % 2)
        }
        None
      } catch { case scala.util.control.NonFatal(_) => None }

    /** The movi payloads ('00dc'/'00db' chunks) — one JPEG per frame for
      * MJPEG. Real container walk, word-alignment respected. */
    def aviFrames(content: Array[Byte]): Seq[Array[Byte]] =
      try {
        if (content.length < 24 || fourccAt(content, 0) != "RIFF" ||
            fourccAt(content, 8) != "AVI ") return Seq.empty
        var i = 12
        while (i + 8 <= content.length) {
          val id = fourccAt(content, i); val sz = le32At(content, i + 4)
          if (sz < 0) return Seq.empty // corrupt size would walk backwards
          if (id == "LIST" && fourccAt(content, i + 8) == "movi") {
            val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
            var j = i + 12
            val end = math.min(i + 8 + sz, content.length)
            while (j + 8 <= end) {
              val cid = fourccAt(content, j); val csz = le32At(content, j + 4)
              if (csz < 0 || j + 8 + csz > end) return out.toSeq // corrupt chunk
              if (cid.endsWith("dc") || cid.endsWith("db"))
                out += java.util.Arrays.copyOfRange(content, j + 8, j + 8 + csz)
              j += 8 + csz + (csz % 2)
            }
            return out.toSeq
          }
          i += 8 + sz + (sz % 2)
        }
        Seq.empty
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }

    /** REAL video features: decode each MJPEG frame through the container
      * walk + JDK JPEG codec, aHash it, and emit the first `dim` bits of
      * the concatenated frame hashes as 0/1 floats — engine-exact (the
      * synthesis aligns constant-gray quadrants with JPEG's 8×8 DCT
      * blocks, so the round-trip is DC-only and the threshold margins
      * dwarf quantization error). None for non-AVI payloads. */
    def videoFeatures(content: Array[Byte], dim: Int): Option[Array[Float]] = {
      val frames = aviFrames(content)
      if (frames.isEmpty) return None
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        val f = frames((d / 64) % frames.length)
        aHash(f) match {
          case Some(hsh) => out(d) = if (((hsh >> (63 - (d % 64))) & 1L) == 1L) 1f else 0f
          case None => return None
        }
        d += 1
      }
      Some(out)
    }

    // ---- fallback (compressed audio / unknown: NOT decodable here) ----

    /** Deterministic stand-in features for payloads no installed codec can
      * decode (video, compressed audio): dim floats derived from a rolling
      * byte hash. NOT a real decoder — in production this slot calls
      * ffmpeg/libopus and this function is the documented boundary. */
    def hashFeatures(content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) { h = 31 * h + (content(i) & 0xff); i += 1 }
      var d = 0
      while (d < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(d) = ((h % 1000003L).toDouble / 1000003.0).toFloat
        d += 1
      }
      out
    }

    /** Feature dispatch: real image decode, else real WAV decode, else real
      * MJPEG-AVI decode, else the hash stand-in. */
    def decodeToFeatures(content: Array[Byte], dim: Int): Array[Float] =
      imageFeatures(content, dim)
        .orElse(wavFeatures(content, dim))
        .orElse(videoFeatures(content, dim))
        .getOrElse(hashFeatures(content, dim))

    /** Resize dispatch: real image thumbnail (4×4 block-mean PNG by
      * default), else the byte-prefix stand-in. */
    def resize(content: Array[Byte], maxBytes: Int,
        thumbW: Int = 4, thumbH: Int = 4): Array[Byte] =
      resizeImage(content, thumbW, thumbH).getOrElse(content.take(maxBytes))

    /** Frame sampling: REAL for MJPEG-AVI payloads — n evenly-spaced
      * decoded-container frames (each a standalone JPEG); the byte-slice
      * stand-in remains only for formats the JDK cannot open (no ffmpeg
      * in this container — that boundary stays documented). */
    def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val frames = aviFrames(content)
      if (frames.nonEmpty) {
        val take = math.min(n, frames.size)
        return (0 until take).map(i => frames(i * frames.size / take))
      }
      if (content.isEmpty) return Seq.empty
      val step = math.max(1, content.length / n)
      (0 until math.min(n, content.length)).map { i =>
        content.slice(i * step, math.min(content.length, i * step + step))
      }
    }
  }

  /** Deterministic media table synthesized from the documents table — the
    * test/bench stand-in for a real media lake, now with REAL payloads for
    * the decodable kinds: image rows carry an actual 16×16 four-quadrant
    * PNG (quadrant q channel values are pure functions of doc_id, so a
    * SQL oracle can predict the decoded pixel statistics), audio rows an
    * actual WAV (12 constant-amplitude windows × 250 samples, 8 kHz PCM16
    * — window RMS equals the amplitude), video rows an actual 4-frame
    * MJPEG AVI (DCT-block-aligned quadrant grays — see the case below).
    * MediaMeta comes from header-parsing the generated bytes — every
    * parser is exercised at synthesis time. */
  def synthesize(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      (id % 3) match {
        case 0 =>
          val img = new java.awt.image.BufferedImage(
            16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              val q = (y / 8) * 2 + (x / 8)
              val r = ((7 * id + 13 * q) % 256).toInt
              val g = ((11 * id + 17 * q) % 256).toInt
              val b = ((19 * id + 23 * q) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bytes = Codecs.encodePng(img)
          val (mime, w, h) = Codecs.imageMeta(bytes).getOrElse(("image/unknown", 0, 0))
          MediaRecord(id, "image", bytes, MediaMeta(mime, w, h, 0L))
        case 1 =>
          val samples = new Array[Short](12 * 250)
          var w = 0
          while (w < 12) {
            val amp = ((id * 37 + w * 101) % 30000 - 15000).toShort
            var i = 0
            while (i < 250) { samples(w * 250 + i) = amp; i += 1 }
            w += 1
          }
          val bytes = Codecs.encodeWavPcm16(samples, 8000f)
          val (mime, ms) = Codecs.wavMeta(bytes).getOrElse(("audio/unknown", 0L))
          MediaRecord(id, "audio", bytes, MediaMeta(mime, 0, 0, ms))
        case _ =>
          // REAL video payload: a 4-frame 16×16 grayscale MJPEG AVI whose
          // quadrant grays are pure functions of (doc_id, frame) drawn from
          // {40, 90, 160, 220} — each constant-gray 8×8 quadrant aligns
          // exactly with one JPEG DCT block, so the lossy round-trip is
          // DC-only and every aHash threshold margin (≥ 32 gray levels)
          // dwarfs quantization error: the oracle re-derives the per-frame
          // hashes arithmetically, proving container walk + JPEG decode
          val grays = Array(40, 90, 160, 220)
          val frames = (0 until 4).map { f =>
            val img = new java.awt.image.BufferedImage(
              16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < 16) {
              var x = 0
              while (x < 16) {
                val q = (y / 8) * 2 + (x / 8)
                val g = grays(((id + f + q) % 4).toInt)
                img.setRGB(x, y, (g << 16) | (g << 8) | g)
                x += 1
              }
              y += 1
            }
            img
          }
          val bytes = Codecs.encodeAviMjpeg(frames, fps = 8)
          val (mime, w, h, ms) = Codecs.aviMeta(bytes)
            .getOrElse(("video/unknown", 0, 0, 0L))
          MediaRecord(id, "video", bytes, MediaMeta(mime, w, h, ms))
      }
    }.toDF()
  }

  /** Decode + feature-extract, one partition at a time. Repartition first so
    * decode work spreads evenly (binary sizes can be skewed). */
  def extractFeatures(media: DataFrame, dim: Int = 16, partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0) media.repartition(partitions) else media
    balanced.as[MediaRecord].mapPartitions { it =>
      it.map { m =>
        val f = Codecs.decodeToFeatures(m.content, dim)
        val norm = math.sqrt(f.map(x => x.toDouble * x).sum)
        MediaFeatures(m.media_id, m.kind, f, norm)
      }
    }
  }

  /** Frame-sample video media into one row per frame (explode shape). */
  def sampleVideoFrames(media: DataFrame, framesPerVideo: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRecord].flatMap { m =>
      Codecs.sampleFrames(m.content, framesPerVideo).zipWithIndex.map {
        case (bytes, i) => MediaFrame(m.media_id, i, bytes)
      }
    }
  }

  case class FrameHash(media_id: Long, frame_idx: Int, ahash: Long)

  /** Per-frame perceptual hashes for video media: REAL container walk +
    * JPEG decode per frame, then the same [[Codecs.aHash]] the image
    * pipeline uses — video near-dup mining reuses the identical banded
    * Hamming machinery ([[imageNearDupPairs]]) over (media_id, frame) keys.
    * Narrow codec-boundary mapPartitions; downstream joins are ints. */
  def videoFrameHashes(media: DataFrame, framesPerVideo: Int = 4): Dataset[FrameHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    sampleVideoFrames(media, framesPerVideo).flatMap { f =>
      Codecs.aHash(f.frame).map(h => FrameHash(f.media_id, f.frame_idx, h))
    }
  }

  /** Resize stage: real block-mean PNG thumbnails for decodable images,
    * byte-prefix stand-in otherwise. */
  def resizeAll(media: DataFrame, maxBytes: Int = 64,
      thumbW: Int = 4, thumbH: Int = 4): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(m => m.copy(content = Codecs.resize(m.content, maxBytes, thumbW, thumbH)))
    }
  }

  /** Thumbnail audit row: the generated thumbnail's byte length plus its
    * re-decoded header dimensions (None when the thumb is the byte-prefix
    * stand-in, i.e. the source was not a decodable image) — the gate that
    * the resize leg produced a REAL image of the requested size. */
  case class ThumbInfo(media_id: Long, kind: String, thumb_len: Int,
      thumb_w: Option[Int], thumb_h: Option[Int])

  def thumbnailInfo(media: DataFrame, maxBytes: Int = 64,
      thumbW: Int = 4, thumbH: Int = 4): Dataset[ThumbInfo] = {
    val spark = media.sparkSession
    import spark.implicits._
    resizeAll(media, maxBytes, thumbW, thumbH).mapPartitions { it =>
      it.map { m =>
        val wh = Codecs.imageMeta(m.content).map { case (_, w, h) => (w, h) }
        ThumbInfo(m.media_id, m.kind, m.content.length, wh.map(_._1), wh.map(_._2))
      }
    }
  }

  case class ImageHash(media_id: Long, ahash: Long)

  /** Perceptual-hash stage: decode each image payload and emit its 64-bit
    * aHash (undecodable rows are dropped). Narrow mapPartitions at the
    * codec boundary only — downstream grouping/Hamming joins are ordinary
    * shuffles on a long, so image near-dup at 100 TB costs one decode pass
    * plus an ints-only exchange. */
  def imageAHashes(media: DataFrame): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap(m => Codecs.aHash(m.content).map(h => ImageHash(m.media_id, h)))
    }
  }

  case class AudioHash(media_id: Long, ahash: Long)

  /** Audio fingerprint stage: decode each WAV payload and emit its
    * energy-profile hash (undecodable rows dropped) — same narrow
    * codec-boundary shape as [[imageAHashes]]. */
  def audioHashes(media: DataFrame, windows: Int = 16): Dataset[AudioHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap(m => Codecs.audioHash(m.content, windows)
        .map(h => AudioHash(m.media_id, h)))
    }
  }

  /** Banded Hamming near-dup pair mining over 64-bit perceptual hashes
    * (binary LSH): each hash splits into 8 bands of 8 bits; by pigeonhole
    * any pair within Hamming distance ≤ 7 shares at least one identical
    * band, so candidates come from 8 band-keyed equi-joins (an ints-only
    * shuffle) and the exact `bit_count(xor)` filter runs on candidates
    * only — no all-pairs stage at any corpus size. Emits (a, b, hamming)
    * with a < b, deduped across bands. `maxHamming` is capped at 7: past
    * that the banding scheme no longer guarantees recall (a pair could
    * differ in every band). */
  def imageNearDupPairs(
      hashes: DataFrame,
      maxHamming: Int = 7,
      idCol: String = "media_id",
      hashCol: String = "ahash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"8-band/8-bit banding guarantees recall only for Hamming <= 7, got $maxHamming")
    val bands = explode(array((0 until 8).map(i =>
      struct(lit(i).as("band"),
        col(hashCol).bitwiseAND(lit(0xffL << (i * 8))).as("key"))): _*))
    val banded = hashes
      .select(col(idCol).as("id"), col(hashCol).as("h"), bands.as("b"))
      .select(col("id"), col("h"), col("b.band").as("band"), col("b.key").as("key"))
    val l = banded.select(col("band"), col("key"), col("id").as("a"), col("h").as("ha"))
    val r = banded.select(col("band"), col("key"), col("id").as("b"), col("h").as("hb"))
    l.join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
