package graft.ops

/** Scratch probe: does ImageIO.read/write scale across threads? */
object PngScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = 2000
    val threads = 32
    def round(i: Int): Unit = {
      val f = Multimodal.decodePng(i, Multimodal.syntheticPng(i))
      if (f.doc_id != i) sys.error("bad")
    }
    (0 until 500).foreach(round)
    var t0 = System.nanoTime()
    (0 until n).foreach(round)
    println(f"single: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val ts = (0 until threads).map { _ =>
      val th = new Thread(() => (0 until n).foreach(round)); th.start(); th
    }
    ts.foreach(_.join())
    println(f"$threads threads x $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
