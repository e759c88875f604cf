package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}

/** REAL RIFF/AVI container demux + raw-DIB frame decode — the published
  * container format (Microsoft RIFF: 'RIFF' size 'AVI ' with nested
  * LIST chunks — hdrl{avih, strl{strh,strf}}, movi{00db…}, idx1),
  * walked for real: headers validated, `strf`'s BITMAPINFOHEADER read
  * for dimensions/depth/compression, frames pulled from the movi LIST's
  * '00db' chunks, the RIFF word-alignment rule (odd-length chunks pad
  * one byte) honored. Frames are uncompressed BI_RGB DIBs — bottom-up
  * row order, BGR byte order, rows padded to 4 bytes — decoded to exact
  * integer channel sums.
  *
  * Why raw DIB and not MJPEG: the repo's gate is cross-engine
  * bit-parity; JPEG decode is not analytically replayable by a SQL
  * oracle (IDCT rounding), while BI_RGB pixels are bytes — so the
  * container walk, the stride economics and the decode are all REAL and
  * the oracle still predicts every sum from the generator formula
  * ([[syntheticAvi]]'s pixels are a closed-form function of (frame,
  * x, y); a demux bug — wrong offset, missed pad byte, BGR channel
  * mixup — decodes wrong bytes and hash-mismatches, and the bottom-up
  * ROW ORDER is pinned by `wsum_r`, a row-weighted sum — plain channel
  * sums are row-permutation-invariant and could not catch a top-down
  * decode on their own). The JPEG/MPEG
  * codec itself stays the documented pluggable seam
  * ([[Multimodal.decodeStub]]): swap the per-chunk `decodeDib` for a
  * codec call and nothing else changes.
  *
  * Scale: partition-batched like every media op ([[frames]] is a
  * mapPartitions over ids); the walk is header arithmetic and only
  * kept (stride-sampled) frames pay the pixel pass.
  */
object Avi {

  // ------------------------------------------------------------ generator

  /** Fixed per-video dims (an AVI stream has one frame size). */
  private def dimsOf(id: Long): (Int, Int) =
    ((6 + id % 7).toInt, (6 + (id / 7) % 7).toInt)
  /** Frames per video. */
  private def framesOf(id: Long): Int = (2 + id % 3).toInt

  /** Pixel formulas (closed-form — the DuckDB oracle replays them).
    * fid = id·5 + frame index. DIB byte order is B, G, R. */
  private def pxB(fid: Long, x: Int, y: Int): Int = ((fid + x * 3 + y) % 256).toInt
  private def pxG(fid: Long, x: Int, y: Int): Int = ((x * 11 + y * 7) % 256).toInt
  private def pxR(fid: Long, x: Int, y: Int): Int = ((fid * 17 + x + y * 5) % 256).toInt

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(fourcc(cc)); bos.write(le32(body.length)); bos.write(body)
    if (body.length % 2 == 1) bos.write(0) // RIFF word alignment
    bos.toByteArray
  }
  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(fourcc("LIST")); bos.write(le32(body.length + 4))
    bos.write(fourcc(kind)); bos.write(body)
    bos.toByteArray
  }

  /** A complete deterministic AVI for a doc id: real RIFF structure
    * (avih + strh/strf headers with honest field values, movi '00db'
    * DIB frames, idx1 index), every pixel from the closed-form
    * formulas above. */
  def syntheticAvi(id: Long): Array[Byte] = {
    val (w, h) = dimsOf(id)
    val n = framesOf(id)
    val rowSize = ((w * 3 + 3) / 4) * 4 // DIB rows pad to 4 bytes
    val frameSize = rowSize * h

    def frame(f: Int): Array[Byte] = {
      val fid = id * 5 + f
      val b = new Array[Byte](frameSize)
      var y = 0
      while (y < h) {
        // bottom-up: DIB row 0 is the BOTTOM image row
        val imgY = h - 1 - y
        var x = 0
        val base = y * rowSize
        while (x < w) {
          b(base + x * 3) = pxB(fid, x, imgY).toByte
          b(base + x * 3 + 1) = pxG(fid, x, imgY).toByte
          b(base + x * 3 + 2) = pxR(fid, x, imgY).toByte
          x += 1
        }
        y += 1
      }
      b
    }

    val avih = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(le32(33333)) // usec/frame (30 fps)
      bos.write(le32(frameSize * 30)); bos.write(le32(0))
      bos.write(le32(0x10)) // AVIF_HASINDEX
      bos.write(le32(n)); bos.write(le32(0)); bos.write(le32(1))
      bos.write(le32(frameSize)); bos.write(le32(w)); bos.write(le32(h))
      (0 until 4).foreach(_ => bos.write(le32(0)))
      chunk("avih", bos.toByteArray)
    }
    val strh = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(fourcc("vids")); bos.write(fourcc("DIB "))
      bos.write(le32(0)); bos.write(le16(0)); bos.write(le16(0))
      bos.write(le32(0)); bos.write(le32(1)); bos.write(le32(30)) // rate 30/1
      bos.write(le32(0)); bos.write(le32(n)); bos.write(le32(frameSize))
      bos.write(le32(0xffffffff.toInt)); bos.write(le32(0))
      bos.write(le16(0)); bos.write(le16(0)); bos.write(le16(w)); bos.write(le16(h))
      chunk("strh", bos.toByteArray)
    }
    val strf = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(le32(40)); bos.write(le32(w)); bos.write(le32(h))
      bos.write(le16(1)); bos.write(le16(24)) // planes, 24-bit
      bos.write(le32(0)) // BI_RGB
      bos.write(le32(frameSize)); bos.write(le32(0)); bos.write(le32(0))
      bos.write(le32(0)); bos.write(le32(0))
      chunk("strf", bos.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val frames = (0 until n).map(f => chunk("00db", frame(f)))
    val movi = list("movi", frames.reduce(_ ++ _))
    val idx1 = {
      val bos = new java.io.ByteArrayOutputStream()
      var off = 4 // offsets are relative to the start of 'movi'+4cc
      frames.foreach { fr =>
        bos.write(fourcc("00db")); bos.write(le32(0x10)) // AVIIF_KEYFRAME
        bos.write(le32(off)); bos.write(le32(frameSize))
        off += fr.length
      }
      chunk("idx1", bos.toByteArray)
    }
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = new java.io.ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(le32(body.length)); out.write(body)
    out.toByteArray
  }

  // --------------------------------------------------------------- demux

  /** One decoded frame: index + dims + exact per-channel pixel sums,
    * plus a ROW-ORDER-SENSITIVE statistic: wsum_r = sum over image rows
    * y (0 = TOP row) of (y+1) * (row's R-channel sum). Plain channel
    * sums are invariant to row permutation, so a bottom-up vs top-down
    * decode bug cannot move them; the row-weighted sum flips under
    * exactly that bug and the oracle pins it. */
  case class AviFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                      sum_b: Long, sum_g: Long, sum_r: Long, wsum_r: Long)

  private def rdLe32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def cc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** The real demux: validate the RIFF/'AVI ' envelope, find strf inside
    * LIST hdrl/strl (dims, 24-bit, BI_RGB enforced loudly), then walk
    * LIST movi's '00db' chunks — honoring the RIFF odd-length pad —
    * decoding every `stride`-th frame's bottom-up padded BGR rows to
    * exact channel sums. Fail-fast on any malformed structure. */
  def frames(docId: Long, payload: Array[Byte], stride: Int): Seq[AviFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(payload.length >= 12 && cc(payload, 0) == "RIFF" &&
      cc(payload, 8) == "AVI ", "not a RIFF/AVI payload")
    val riffEnd = 8L + rdLe32(payload, 4)
    require(riffEnd <= payload.length, s"truncated RIFF body ($riffEnd)")

    var w = -1; var h = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[AviFrame]

    def walkStrl(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val kind = cc(payload, p); val len = rdLe32(payload, p + 4)
        require(len >= 0 && p + 8L + len <= to, s"truncated $kind at $p")
        if (kind == "strf") {
          require(len >= 40, s"strf too short ($len) for BITMAPINFOHEADER")
          w = rdLe32(payload, p + 8 + 4)
          h = rdLe32(payload, p + 8 + 8)
          val bits = rdLe16(payload, p + 8 + 14)
          val comp = rdLe32(payload, p + 8 + 16)
          require(bits == 24 && comp == 0,
            s"unsupported DIB format (bits=$bits, compression=$comp): only " +
              "uncompressed 24-bit BI_RGB decodes here; plug a codec into " +
              "the decode seam for anything else")
        }
        p += 8 + len + (len % 2) // RIFF pad
      }
    }
    def walkHdrl(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val kind = cc(payload, p); val len = rdLe32(payload, p + 4)
        require(len >= 0 && p + 8L + len <= to, s"truncated $kind at $p")
        if (kind == "LIST" && cc(payload, p + 8) == "strl")
          walkStrl(p + 12, p + 8 + len)
        p += 8 + len + (len % 2)
      }
    }
    def decodeDib(from: Int, len: Int, frameIdx: Int): AviFrame = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      require(len == rowSize * h,
        s"frame $frameIdx: chunk length $len != rowSize*h (${rowSize * h})")
      var sb = 0L; var sg = 0L; var sr = 0L; var wr = 0L
      var row = 0
      while (row < h) {
        var x = 0
        val base = from + row * rowSize
        var rowR = 0L
        while (x < w) {
          sb += payload(base + x * 3) & 0xff
          sg += payload(base + x * 3 + 1) & 0xff
          rowR += payload(base + x * 3 + 2) & 0xff
          x += 1
        }
        sr += rowR
        // DIB rows are bottom-up: DIB row `row` is image row h-1-row,
        // weighted (imgY + 1) = h - row — a top-down decode flips this
        wr += (h - row).toLong * rowR
        row += 1
      }
      AviFrame(docId, frameIdx, w, h, sb, sg, sr, wr)
    }

    var p = 12
    var frameIdx = 0
    while (p + 8 <= riffEnd) {
      val kind = cc(payload, p); val len = rdLe32(payload, p + 4)
      require(len >= 0 && p + 8L + len <= riffEnd, s"truncated $kind at $p")
      if (kind == "LIST") {
        val sub = cc(payload, p + 8)
        if (sub == "hdrl") walkHdrl(p + 12, p + 8 + len)
        else if (sub == "movi") {
          require(w > 0 && h > 0, "movi LIST before strf header")
          var q = p + 12
          val end = p + 8 + len
          while (q + 8 <= end) {
            val ck = cc(payload, q); val cl = rdLe32(payload, q + 4)
            require(cl >= 0 && q + 8L + cl <= end, s"truncated $ck at $q")
            if (ck == "00db") {
              if (frameIdx % stride == 0) out += decodeDib(q + 8, cl, frameIdx)
              frameIdx += 1
            }
            q += 8 + cl + (cl % 2)
          }
        }
      }
      p += 8 + len + (len % 2)
    }
    out.toSeq
  }

  /** Partition-batched stride sampling over per-doc synthetic AVIs —
    * the [[Multimodal.videoFrames]] shape on the real RIFF container. */
  def sampleFrames(ids: Dataset[Long], stride: Int): Dataset[AviFrame] =
    ids.mapPartitions(_.flatMap { id =>
      frames(id, syntheticAvi(id), stride)
    })(Encoders.product[AviFrame])
}
