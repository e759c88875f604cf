package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}

/** Multimodal-column plumbing: opaque `BINARY` payloads + typed metadata,
  * decoded batch-wise per partition.
  *
  * The engine treats image/audio/video as `(payload BINARY, media_type
  * STRING, metadata...)` rows. Decoding/feature extraction runs as a
  * partition-iterator transform (`Dataset.mapPartitions`) so a real decoder
  * amortizes per-batch setup (codec init, model load) across a whole
  * partition — the Scala analog of an Arrow-batched pandas UDF.
  *
  * Two tiers live here. The REAL codec tier uses the JDK's built-in
  * `javax.imageio` PNG codec: [[decodePng]] (container parse + zlib
  * inflate → exact pixel stats), [[pngFrameSlices]]/[[videoFrames]] (a
  * real chunk-structure container walk over concatenated-PNG video), and
  * [[resizePng]] (nearest-neighbor resample of the decoded pixel grid).
  * [[decodeStub]] remains only as the pluggable-codec SEAM demo for
  * formats the JDK lacks (audio/video codecs): a deterministic byte
  * summary in the same partition-batched shape — swap it for a JNI/codec
  * call and nothing else changes, as the PNG tier proves.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no row-level UDF on
  * the driver, no collect); partition sizing is controlled upstream via
  * `spark.sql.files.maxPartitionBytes` so a partition of media blobs fits
  * executor memory.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         media_type: String, n_chars: Long)

  /** Deterministic fake "decoded features" (see STUB note above). */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, first_byte: Int,
                           checksum: Long, fake_label: Int)

  /** STUB decode: byte-level summary standing in for codec + featurizer. */
  def decodeStub(m: MediaRecord): MediaFeatures = {
    val bytes = m.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val checksum = sum % 997L
    MediaFeatures(
      doc_id = m.doc_id,
      n_bytes = bytes.length,
      first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
      checksum = checksum,
      fake_label = (checksum % 10L).toInt)
  }

  /** Batch shape: whole-partition iterator in, iterator out — a real decoder
    * initializes its codec once here, before mapping the iterator. */
  def decodeBatch(it: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    it.map(decodeStub)

  def decode(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions(decodeBatch _)(Encoders.product[MediaFeatures])

  // --------------------------------------------------- real container walk

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** REAL container walk over a concatenated-PNG "video": each frame is a
    * complete PNG stream, so frame boundaries are found by parsing the
    * actual PNG structure — 8-byte signature, then chunks of
    * (4-byte big-endian length, 4-byte type, data, 4-byte CRC) until IEND —
    * exactly how a container demuxer seeks sample boundaries. Fail-fast on
    * malformed bytes (truncated chunk, missing signature), like the
    * inference op. Returns the raw byte slice of every frame. */
  def pngFrameSlices(payload: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < payload.length) {
      val start = pos
      require(payload.length - pos >= PngSig.length &&
        PngSig.indices.forall(i => payload(pos + i) == PngSig(i)),
        s"no PNG signature at byte $pos")
      pos += PngSig.length
      var done = false
      while (!done) {
        require(payload.length - pos >= 8, s"truncated chunk header at byte $pos")
        val len = ((payload(pos) & 0xff) << 24) | ((payload(pos + 1) & 0xff) << 16) |
          ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
        // the 4-byte length parses SIGNED: a corrupt high bit would read
        // negative (stalling the walk in place — an executor-task hang,
        // not the contracted fail-fast), and a near-MaxValue length would
        // overflow `pos` past the truncation require; bound it first and
        // advance in Long
        require(len >= 0, s"negative chunk length $len at byte $pos")
        val isEnd = payload(pos + 4) == 'I' && payload(pos + 5) == 'E' &&
          payload(pos + 6) == 'N' && payload(pos + 7) == 'D'
        val next = pos.toLong + 8L + len + 4L // header + data + CRC
        require(next <= payload.length, s"truncated chunk body ending at byte $next")
        pos = next.toInt
        if (isEnd) done = true
      }
      out += java.util.Arrays.copyOfRange(payload, start, pos)
    }
    out.toSeq
  }

  /** Deterministic synthetic "video" for a doc id: 2 + id%4 concatenated
    * REAL PNG frames, frame f encoded from [[syntheticPng]](id·7 + f) — so
    * an oracle can predict every decoded frame analytically from the
    * generator formula, and a container-walk bug (wrong boundary, skipped
    * chunk) decodes the wrong frame and hash-mismatches. */
  def syntheticVideo(id: Long): Array[Byte] = {
    val n = (2 + id % 4).toInt
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < n) { bos.write(syntheticPng(id * 7 + f)); f += 1 }
    bos.toByteArray
  }

  /** One decoded video frame: source frame number + the q82 image stats. */
  case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
                           height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Real frame sampling: walk the PNG container, keep every `stride`-th
    * frame, decode each kept frame through [[decodePng]]. The walk itself
    * is cheap (header arithmetic — no inflate); only KEPT frames pay the
    * decode, which is the economics of real keyframe sampling. Partition-
    * batched like every media op here. */
  def videoFrames(ids: Dataset[Long], stride: Int): Dataset[FrameFeatures] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    ids.mapPartitions(_.flatMap { id =>
      val slices = pngFrameSlices(syntheticVideo(id))
      slices.indices.collect { case f if f % stride == 0 =>
        val feat = decodePng(id, slices(f))
        FrameFeatures(id, f, feat.width, feat.height,
          feat.sum_r, feat.sum_g, feat.sum_b)
      }
    })(Encoders.product[FrameFeatures])
  }

  // ImageIO defaults to FILE-backed stream caching: every encode/decode
  // round-trips a temp file in the OS tmp dir — syscall cost per image
  // plus contention when 32 tasks decode concurrently (measured at sf1:
  // the codec queries scaled ~1.6x from 8→32 threads until this was
  // switched off). Our payloads are KB-sized in-memory arrays; memory-
  // cached streams are strictly better. Idempotent, once per JVM.
  private lazy val imageIoMemCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  // ------------------------------------------------------------ real resize

  /** Resized-image summary: input dims, output dims, exact per-channel
    * pixel sums of the RESIZED image (integers — cross-engine-hashable). */
  case class ResizedImage(doc_id: Long, orig_w: Int, orig_h: Int,
                          out_w: Int, out_h: Int,
                          sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image resize: decode the PNG, nearest-neighbor downsample the
    * actual pixel grid — out(x,y) = in(x·factor, y·factor), out dims =
    * ceil(in/factor) — into a new image, and reduce THAT image to exact
    * channel sums, so the oracle pins the resample arithmetic itself. */
  def resizePng(docId: Long, payload: Array[Byte], factor: Int): ResizedImage = {
    imageIoMemCache
    require(factor > 0, s"resize factor must be positive, got $factor")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload for doc $docId")
    val ow = (img.getWidth + factor - 1) / factor
    val oh = (img.getHeight + factor - 1) / factor
    val out = new java.awt.image.BufferedImage(
      ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val rgb = img.getRGB(x * factor, y * factor)
        out.setRGB(x, y, rgb)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ResizedImage(docId, img.getWidth, img.getHeight, ow, oh, sr, sg, sb)
  }

  /** Partition-batched synthesize→encode→decode→RESIZE over doc ids. */
  def resizeImages(ids: Dataset[Long], factor: Int): Dataset[ResizedImage] =
    ids.mapPartitions(_.map { id =>
      resizePng(id, syntheticPng(id), factor)
    })(Encoders.product[ResizedImage])

  // ------------------------------------------------------------- real PNG

  /** Decoded-image features: header dims + color channel count + EXACT
    * per-channel pixel sums (integers — cross-engine-hashable). */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           channels: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic synthetic RGB image for a doc id, REALLY encoded as
    * PNG bytes via `javax.imageio` (the JDK's built-in codec — no
    * external dependency). Dimensions and every pixel derive from the id
    * alone, so an oracle can predict the decoded stats analytically:
    * w = 8 + id%9, h = 8 + (id/9)%9,
    * pixel(x,y) = ((id·31+x·7+y)%256, (x·13+y·5)%256, (id+x+y·3)%256). */
  def syntheticPng(id: Long): Array[Byte] = {
    imageIoMemCache
    val w = (8 + id % 9).toInt
    val h = (8 + (id / 9) % 9).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y) % 256).toInt
        val g = ((x * 13 + y * 5) % 256).toInt
        val b = ((id + x + y * 3) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode — `javax.imageio` parses the PNG container and
    * inflates the pixel data (PNG is lossless, so decoded pixels are
    * exact). Fail-fast on undecodable bytes, like the inference op. */
  def decodePng(docId: Long, payload: Array[Byte]): ImageFeatures = {
    imageIoMemCache
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload for doc $docId")
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageFeatures(docId, img.getWidth, img.getHeight,
      img.getColorModel.getNumColorComponents, sr, sg, sb)
  }

  /** Partition-batched synthesize→encode→DECODE round trip over doc ids:
    * the real-codec path of [[decode]]'s plumbing (same mapPartitions
    * shape — a heavier codec would init once per partition here). */
  def pngFeatures(ids: Dataset[Long]): Dataset[ImageFeatures] =
    ids.mapPartitions(_.map { id =>
      decodePng(id, syntheticPng(id))
    })(Encoders.product[ImageFeatures])

  // ------------------------------------------------------------- audio tier

  case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
                           sum_abs: Long, max_abs: Long, n_zero_cross: Long)

  val WavRate = 8000
  val WavSamples = 1024

  /** Deterministic synthetic 16-bit PCM mono waveform for a doc id —
    * integer formula only, so an oracle predicts every decoded feature
    * analytically (the [[syntheticPng]] discipline):
    * s(i) = ((id·31 + i·7919) mod 2048) − 1024, i = 0..1023. */
  def syntheticSamples(id: Long): Array[Short] =
    Array.tabulate(WavSamples)(i =>
      (((id * 31 + i.toLong * 7919) % 2048) - 1024).toShort)

  /** The waveform REALLY encoded as a RIFF/WAVE file via
    * `javax.sound.sampled` — the JDK's built-in audio codec, closing the
    * audio third of the image/audio/video triple the same way
    * [[syntheticPng]] closed images (no external dependency; the
    * [[decodeStub]] seam remains only for codecs the JDK lacks). */
  def syntheticWav(id: Long): Array[Byte] =
    encodeWav(syntheticSamples(id))

  /** The JDK WAV codec providers, resolved ONCE. `AudioSystem`'s front
    * door walks a SYNCHRONIZED provider registry on every
    * `getAudioInputStream`/`write` call — measured on this host: 160k
    * 1 KiB round trips = 24 s wall on 32 threads through `AudioSystem`
    * vs 0.15 s through the same provider instances called directly (the
    * registry lock serializes the whole executor; single-threaded it is
    * 89 µs vs 10 µs per round trip). The codec CLASSES are identical —
    * `ServiceLoader` hands back the `java.desktop` module's own
    * WAVE reader/writer — only the per-call registry walk is hoisted to
    * this one-time lookup. Readers/writers are stateless, so one shared
    * instance serves every executor thread. Falls back to the
    * `AudioSystem` path if the service lookup ever comes back empty. */
  private lazy val wavCodec: Option[(javax.sound.sampled.spi.AudioFileReader,
      javax.sound.sampled.spi.AudioFileWriter)] =
    try {
      import javax.sound.sampled._
      import scala.jdk.CollectionConverters._
      val writer = java.util.ServiceLoader
        .load(classOf[spi.AudioFileWriter]).asScala
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      writer.flatMap { w =>
        // probe: a WAV this writer produced must round-trip through the
        // candidate reader — selection by behavior, not class name
        val pcm = new Array[Byte](4)
        val probe = {
          val fmt = new AudioFormat(WavRate.toFloat, 16, 1, true, false)
          val ais = new AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, 2L)
          val bos = new java.io.ByteArrayOutputStream()
          w.write(ais, AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        }
        java.util.ServiceLoader.load(classOf[spi.AudioFileReader]).asScala
          .find { r =>
            try r.getAudioFileFormat(new java.io.ByteArrayInputStream(probe))
              .getType == AudioFileFormat.Type.WAVE
            catch { case _: Throwable => false }
          }
          .map(r => (r, w))
      }
    } catch { case _: Throwable => None }

  private def wavAudioInputStream(
      payload: Array[Byte]): javax.sound.sampled.AudioInputStream =
    wavCodec match {
      case Some((reader, _)) =>
        reader.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      case None =>
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
    }

  /** RIFF/WAVE encode of 16-bit little-endian mono PCM — the shared
    * codec half of every synthetic-waveform generator (one place to
    * change sample rate / bit depth / endianness; the analytic oracles
    * replay the SAMPLE formulas, so a codec drift here must hit all
    * generators identically or hash-mismatch loudly). */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian PCM16
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      WavRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavCodec match {
      case Some((_, writer)) =>
        writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      case None =>
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    }
    bos.toByteArray
  }

  /** REAL audio decode — `javax.sound.sampled` parses the RIFF container
    * and hands back the PCM frames (WAV is lossless: samples are exact).
    * Features are the classic integer waveform stats: absolute mass,
    * peak, and zero-crossing count (crossing = the sign bit flips between
    * consecutive samples). Fail-fast on undecodable bytes. */
  def decodeWav(docId: Long, payload: Array[Byte]): AudioFeatures = {
    val ais = wavAudioInputStream(payload)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"unexpected WAV format for doc $docId: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var sumAbs = 0L
    var maxAbs = 0L
    var zc = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      val s = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort
      val a = math.abs(s.toLong)
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      i += 1
    }
    AudioFeatures(docId, fmt.getSampleRate.toInt, n.toLong, sumAbs, maxAbs, zc)
  }

  /** Partition-batched synthesize→encode→DECODE round trip over doc ids —
    * the audio twin of [[pngFeatures]]. */
  def wavFeatures(ids: Dataset[Long]): Dataset[AudioFeatures] =
    ids.mapPartitions(_.map { id =>
      decodeWav(id, syntheticWav(id))
    })(Encoders.product[AudioFeatures])

  // ------------------------------------------------------ perceptual hash

  /** Near-dup image corpus for perceptual dedup (q171): docs 2k and 2k+1
    * render the SAME base scene, the odd id with a +1 uniform brightness
    * offset on every channel — the classic "same photo, different
    * exposure" near-duplicate that byte-level dedup can never catch.
    * Channels MIX (base, x, y) multiplicatively so luma gradients change
    * sign pseudo-randomly — q82's smooth ramp would make every gradient
    * positive and every dHash collide; textured scenes are what make the
    * hash discriminative. The brightness offset is applied mod 256
    * (channel wrap — a wrapped sampled pixel can flip a couple of bits,
    * which is why the pair join confirms Hamming ≤ k, not equality).
    * Dimensions vary with the base id (q82's formula), so the grid
    * resample is exercised across sizes. Really PNG-encoded, like
    * [[syntheticPng]], so the hash below runs a real decode. */
  def syntheticPairPng(id: Long): Array[Byte] = {
    imageIoMemCache
    val base = id / 2
    val delta = (id % 2).toInt
    val w = (8 + base % 9).toInt
    val h = (8 + (base / 9) % 9).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // per-pixel mix: combine (base, x, y), multiply by an odd
        // constant mod 2^16, then take a MIDDLE byte of v·(v+1) — the
        // middle-square trick. Two traps live here, both hit during
        // development: an additive base term cancels out of every
        // gradient (all scenes hash alike), and a LOW byte of v·M is
        // linear in v mod 256 (column steps become a sawtooth — whole
        // hash classes collapse to alternating-bit patterns). The square
        // makes each column step depend on v itself, i.e. on the base.
        def chan(cb: Long, cx: Int, cy: Int): Int = {
          val v0 = (base * cb + x * cx + y * cy) % 65536
          val v1 = (v0 * 2654435761L) % 65536
          (((v1 * (v1 + 1)) / 4096 % 256 + delta) % 256).toInt
        }
        val r = chan(7919L, 13, 29)
        val g = chan(104729L, 31, 17)
        val b = chan(1299709L, 11, 37)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual difference hash, split into two 32-bit halves (h1 rows
    * 0–3, h2 rows 4–7) so band keys and XOR popcounts stay positive
    * BIGINTs on every engine. */
  case class ImageHash(doc_id: Long, h1: Long, h2: Long)

  /** REAL-decode dHash: `javax.imageio` decodes the PNG, the pixel grid
    * is nearest-neighbor-sampled to 9×8 (sx = x·w DIV 9, sy = y·h DIV 8),
    * reduced to integer luma ((299r + 587g + 114b) DIV 1000), and each of
    * the 64 horizontal gradient signs becomes one bit. A uniform
    * brightness shift moves every luma equally, so gradient SIGNS — and
    * the hash — are invariant (modulo 0→255 wraps in the synthetic
    * corpus), which is exactly the robustness byte hashing lacks. */
  def dhashPng(docId: Long, payload: Array[Byte]): ImageHash = {
    imageIoMemCache
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload for doc $docId")
    val w = img.getWidth
    val h = img.getHeight
    val g = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        val rgb = img.getRGB(x * w / 9, y * h / 8)
        g(y)(x) = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)) / 1000L
        x += 1
      }
      y += 1
    }
    var h1 = 0L
    var h2 = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y)(x + 1) > g(y)(x)) {
          if (y < 4) h1 |= 1L << (y * 8 + x)
          else h2 |= 1L << ((y - 4) * 8 + x)
        }
        x += 1
      }
      y += 1
    }
    ImageHash(docId, h1, h2)
  }

  /** Partition-batched synthesize→encode→decode→dHash over doc ids. */
  def dhashFeatures(ids: Dataset[Long]): Dataset[ImageHash] =
    ids.mapPartitions(_.map { id =>
      dhashPng(id, syntheticPairPng(id))
    })(Encoders.product[ImageHash])

  // --------------------------------------------------- audio fingerprint

  /** Near-dup audio corpus (q174): docs 2k and 2k+1 carry the SAME base
    * waveform, the odd id re-gained by 9/8 (per-sample
    * sign·(|s|·9 DIV 8) — trunc-on-magnitude so both engines agree on
    * negative samples) — "same recording, different volume", the audio
    * analog of q171's exposure shift. Base samples use TWO rounds of
    * the square-and-reduce mix (q198's pair mix composed twice) over
    * the prime modulus 1e9+7. One round is measurably too weak here:
    * the sample index walks an arithmetic progression, so a single
    * square is one quadratic per base — two bases differ by a LINEAR
    * drift in k, and for magic deltas (2·step·Δ mod M small) the drift
    * is slow enough that whole envelopes track each other and unrelated
    * docs collide at Hamming ≤ 3 (measured: 18 k structural junk pairs
    * at sf1 with a 16-bit power-of-2 state, still ~1.5 k with a 31-bit
    * prime state). The second square-and-reduce makes the alignment
    * survive two nonlinear folds at once — 0 incidental pairs across
    * all 25 k sf1 bases. All products stay in int64: each state < 2³⁰,
    * state·2654435761 < 2⁶², state·(state+1)/2 < 2⁶⁰. */
  def syntheticPairWav(id: Long): Array[Byte] = {
    val base = id / 2
    val gain = id % 2 == 1
    val samples = Array.tabulate(WavSamples) { i =>
      val v0 = (base * 7919 + i.toLong * 31) % 1000000007L
      val v1 = (v0 * 2654435761L) % 1000000007L
      val w1 = (v1 * (v1 + 1) / 2) % 1000000007L
      val w2 = (w1 * 2654435761L) % 1000000007L
      val s = (w2 * (w2 + 1) / 2) % 1000000007L % 2048 - 1024
      val out = if (!gain) s
      else if (s < 0) -((-s * 9) / 8)
      else (s * 9) / 8
      out.toShort
    }
    encodeWav(samples)
  }

  /** 126-bit energy-envelope fingerprint in two positive 63-bit words
    * (fp1 = gradients within windows 0–63, fp2 = within 64–127 — q171's
    * per-half layout; the one cross-half gradient is skipped so each
    * word stays a positive BIGINT on every engine). */
  case class AudioFingerprint(doc_id: Long, fp1: Long, fp2: Long)

  /** REAL-decode energy-envelope fingerprint: `javax.sound.sampled`
    * decodes the WAV, the 1024 samples split into 128 windows of 8, and
    * each of the 126 within-half energy-gradient signs (Σ|s| per window)
    * becomes one bit. Width is the scale knob: the previous 31-bit
    * single word incidentally collided as n²·bands/2³¹ — 696 k junk
    * pairs at 50 k docs, ~10¹¹ at 10⁹ — drowning the confirm stage;
    * 126 bits banded 4×~32 drives the incidental term to n²·4/2³² ≈
    * single digits at 50 k and keeps the pair volume linear in the
    * planted duplicates. A uniform gain scales every window energy by
    * the same factor (modulo per-sample floor dust — windows of 8 carry
    * ≤ 8 dust against typical inter-window deltas of hundreds), so
    * gradient signs — and the fingerprint — survive re-volumed copies
    * that byte dedup misses. */
  def audioFingerprint(docId: Long, payload: Array[Byte]): AudioFingerprint = {
    val e = wavWindowEnergies(docId, payload, 128)
    var fp1 = 0L
    var fp2 = 0L
    var w = 0
    while (w < 63) {
      if (e(w + 1) > e(w)) fp1 |= 1L << w
      w += 1
    }
    w = 64
    while (w < 127) {
      if (e(w + 1) > e(w)) fp2 |= 1L << (w - 64)
      w += 1
    }
    AudioFingerprint(docId, fp1, fp2)
  }

  /** REAL decode to the `nw`-window energy envelope (Σ|s| per
    * `WavSamples/nw`-sample window) — the shared reduction under
    * [[audioFingerprint]] (128 windows) and the q178 segmenter (32). */
  def wavWindowEnergies(docId: Long, payload: Array[Byte],
      nw: Int = 32): Array[Long] = {
    val ais = wavAudioInputStream(payload)
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"unexpected WAV format for doc $docId: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    require(n == WavSamples, s"expected $WavSamples samples, got $n")
    val win = WavSamples / nw
    val e = new Array[Long](nw)
    var i = 0
    while (i < n) {
      val s = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort
      e(i / win) += math.abs(s.toLong)
      i += 1
    }
    e
  }

  /** Partition-batched synthesize→encode→decode→fingerprint over ids. */
  def audioFpFeatures(ids: Dataset[Long]): Dataset[AudioFingerprint] =
    ids.mapPartitions(_.map { id =>
      audioFingerprint(id, syntheticPairWav(id))
    })(Encoders.product[AudioFingerprint])

  // ----------------------------------------------------- audio segmentation

  /** Speech-like burst waveform for the q178 segmenter: per 32-sample
    * window, a middle-square mix of (id, window) decides ACTIVE (full
    * ±1024 noise) vs SILENT (the same noise read mod 16 — dither whose
    * window energy stays < 500), so every doc carries genuine
    * activity/silence runs and an energy threshold recovers them. All
    * integer; the oracle replays the formula exactly. */
  def syntheticBurstWav(id: Long): Array[Byte] = {
    val samples = Array.tabulate(WavSamples) { i =>
      val av0 = (id * 13 + (i / 32).toLong * 7) % 65536
      val av1 = (av0 * 2654435761L) % 65536
      // middle-square before the range test — a bare `av1 % k` inherits
      // the linear per-window walk of av0·C mod 2^16 and yields the same
      // near-periodic activity pattern for every doc
      val active = (av1 * (av1 + 1)) / 4096 % 256 < 154
      val v0 = (id * 104729 + i.toLong * 17) % 65536
      val v1 = (v0 * 2654435761L) % 65536
      val nv = (v1 * (v1 + 1)) / 4096 % 2048 - 1024
      (if (active) nv else nv % 16).toShort
    }
    encodeWav(samples)
  }

  case class AudioWindow(doc_id: Long, w: Int, energy: Long)

  /** Partition-batched synthesize→encode→decode→window-energies over ids
    * (32 rows per doc — the explode happens AFTER the per-doc decode, so
    * the codec runs once per document). */
  def audioSegmentWindows(ids: Dataset[Long]): Dataset[AudioWindow] =
    ids.mapPartitions(_.flatMap { id =>
      val e = wavWindowEnergies(id, syntheticBurstWav(id))
      e.iterator.zipWithIndex.map { case (en, w) => AudioWindow(id, w, en) }
    })(Encoders.product[AudioWindow])
}
