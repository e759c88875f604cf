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
}
