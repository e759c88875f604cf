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
  * DECODER IS A STUB: the container has no image/audio codecs, so
  * [[decodeStub]] computes a deterministic fake feature vector (byte length,
  * first byte, byte checksum) standing in for "decode → extract features".
  * The Spark-side plumbing — binary column, schema, batch iteration, typed
  * output Dataset — is real and is what the 100 TB pipeline needs: swap
  * [[decodeStub]] for a JNI/codec call and nothing else changes.
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

  /** One sampled "frame" of a payload: byte range [offset, offset+size). */
  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Frame sampling STUB: treat the payload as fixed-size chunks and keep
    * every `stride`-th one — the byte-plumbing shape of video frame
    * extraction (a real implementation seeks keyframes via the container
    * index instead of fixed strides; the partition-batched iteration,
    * opaque-bytes handling, and one-row-per-frame output are the real
    * contract). */
  def sampleFrames(m: MediaRecord, chunkBytes: Int, stride: Int): Seq[Frame] = {
    val bytes = m.payload
    val nChunks = bytes.length / chunkBytes
    (0 until nChunks by stride).zipWithIndex.map { case (chunk, idx) =>
      val off = chunk * chunkBytes
      var sum = 0L
      var i = off
      while (i < off + chunkBytes) { sum += bytes(i) & 0xff; i += 1 }
      Frame(m.doc_id, idx, chunkBytes, sum % 997L)
    }
  }

  def frames(ds: Dataset[MediaRecord], chunkBytes: Int, stride: Int): Dataset[Frame] =
    ds.mapPartitions(_.flatMap(sampleFrames(_, chunkBytes, stride)))(
      Encoders.product[Frame])

  /** Resized payload summary: original size, downsampled size, checksum
    * of the kept bytes. */
  case class Resized(doc_id: Long, orig_bytes: Int, out_bytes: Int,
                     checksum: Long)

  /** Resize STUB: nearest-neighbor downsample — keep every `factor`-th
    * byte (a real image resize samples the pixel grid through the codec;
    * the partition-batched iteration, opaque-byte handling, and
    * size-reduction contract are the real plumbing). */
  def resizeStub(m: MediaRecord, factor: Int): Resized = {
    require(factor > 0, s"resize factor must be positive, got $factor")
    val bytes = m.payload
    var sum = 0L
    var i = 0
    var n = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; n += 1; i += factor }
    Resized(m.doc_id, bytes.length, n, sum % 997L)
  }

  def resize(ds: Dataset[MediaRecord], factor: Int): Dataset[Resized] =
    ds.mapPartitions(_.map(resizeStub(_, factor)))(Encoders.product[Resized])

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
}
