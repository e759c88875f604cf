package graft.ops

/** Micro-benchmark for the WAV encode/decode round trip — run via
  * `sbt "Test/runMain graft.ops.AudioMicroBench"`. Not a spec (timing).
  *
  * Documents the measurement behind [[Multimodal]]'s cached codec
  * providers: `AudioSystem`'s front door walks a SYNCHRONIZED provider
  * registry per call, serializing a 32-thread executor (measured 24 s
  * wall for 160k round trips vs 0.17 s through the cached providers). */
object AudioMicroBench {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val threads = 32
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def onThreads(body: Int => Unit): Unit = {
      val ts = (0 until threads).map { _ =>
        val th = new Thread(() => (0 until n).foreach(body)); th.start(); th
      }
      ts.foreach(_.join())
    }
    def viaAudioSystem(i: Int): Unit = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.syntheticWav(i)))
      if (ais.readAllBytes().length != Multimodal.WavSamples * 2)
        sys.error("bad decode")
    }
    // warmups
    (0 until 500).foreach(i => Multimodal.decodeWav(i, Multimodal.syntheticWav(i)))
    (0 until 500).foreach(viaAudioSystem)

    time(s"cached providers, single thread, $n")(
      (0 until n).foreach(i => Multimodal.decodeWav(i, Multimodal.syntheticWav(i))))
    time(s"cached providers, $threads threads x $n")(
      onThreads(i => Multimodal.decodeWav(i, Multimodal.syntheticWav(i))))
    time(s"AudioSystem registry, single thread, $n")(
      (0 until n).foreach(viaAudioSystem))
    time(s"AudioSystem registry, $threads threads x $n")(
      onThreads(viaAudioSystem))
  }
}
