package graft.ops

import graft.SparkSpec

/** ops/Avi: the RIFF/AVI demux must decode exactly the frames the
  * generator encoded (closed-form pixel check — the q219 oracle's
  * formula), honor RIFF structure rules, and fail fast on malformed
  * payloads instead of decoding garbage. */
class AviSpec extends SparkSpec {

  private def expected(id: Long, stride: Int): Seq[Avi.AviFrame] = {
    val w = (6 + id % 7).toInt; val h = (6 + (id / 7) % 7).toInt
    val n = (2 + id % 3).toInt
    (0 until n).collect { case f if f % stride == 0 =>
      val fid = id * 5 + f
      var sb = 0L; var sg = 0L; var sr = 0L; var wr = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sb += (fid + x * 3 + y) % 256
        sg += (x * 11 + y * 7) % 256
        sr += (fid * 17 + x + y * 5) % 256
        wr += (y + 1).toLong * ((fid * 17 + x + y * 5) % 256)
      }
      Avi.AviFrame(id, f, w, h, sb, sg, sr, wr)
    }
  }

  test("demux decodes exactly the generated frames (closed-form pixels)") {
    // ids crossing dim variety, odd row widths (exercise DIB row padding:
    // w=6 -> 18-byte rows padded to 20) and frame-count variety
    for (id <- Seq(0L, 1L, 6L, 7L, 13L, 50L, 123L); stride <- Seq(1, 2, 3)) {
      val got = Avi.frames(id, Avi.syntheticAvi(id), stride)
      assert(got == expected(id, stride), s"id=$id stride=$stride")
    }
  }

  test("container structure is walked for real: movi offset shifts are caught") {
    val id = 13L
    val avi = Avi.syntheticAvi(id)
    // corrupt one byte inside the first frame's pixel data: the demux
    // must still parse (structure intact) but produce DIFFERENT sums —
    // proving sums come from the actual chunk bytes, not the formula
    val moviAt = {
      var p = 12; var found = -1
      while (found < 0 && p + 12 <= avi.length) {
        if (new String(avi, p, 4, "US-ASCII") == "LIST" &&
          new String(avi, p + 8, 4, "US-ASCII") == "movi") found = p
        else p += 8 + ((avi(p + 4) & 0xff) | ((avi(p + 5) & 0xff) << 8) |
          ((avi(p + 6) & 0xff) << 16) | ((avi(p + 7) & 0xff) << 24)) + 1 & ~1
      }
      found
    }
    assert(moviAt > 0)
    val corrupted = avi.clone()
    corrupted(moviAt + 12 + 8 + 5) = (corrupted(moviAt + 12 + 8 + 5) ^ 0x7f).toByte
    val clean = Avi.frames(id, avi, 1)
    val dirty = Avi.frames(id, corrupted, 1)
    assert(clean != dirty, "sums must derive from chunk bytes")
  }

  test("malformed payloads fail loudly") {
    val avi = Avi.syntheticAvi(3L)
    intercept[IllegalArgumentException] {
      Avi.frames(3L, avi.take(40), 1) // truncated body
    }
    intercept[IllegalArgumentException] {
      Avi.frames(3L, "not a riff file at all".getBytes, 1)
    }
    // unsupported compression must name the decode seam, not decode junk
    val strfAt = {
      val s = new String(avi.map(b => (b & 0xff).toChar))
      s.indexOf("strf")
    }
    assert(strfAt > 0)
    val badComp = avi.clone()
    badComp(strfAt + 8 + 16) = 1 // BI_RLE8
    val e = intercept[IllegalArgumentException] {
      Avi.frames(3L, badComp, 1)
    }
    assert(e.getMessage.contains("seam"))
  }

  test("distributed stride sampling matches the local demux") {
    val spark2 = spark
    import spark2.implicits._
    val ids = Seq(0L, 5L, 9L, 21L)
    val got = Avi.sampleFrames(ids.toDS(), 2).collect().toSeq
      .sortBy(f => (f.doc_id, f.frame_idx))
    val want = ids.flatMap(expected(_, 2)).sortBy(f => (f.doc_id, f.frame_idx))
    assert(got == want)
  }
}
