package graft.ops

import org.apache.spark.unsafe.types.UTF8String

/** Scratch: UTF8String.levenshteinDistance(threshold) vs banded char DP. */
object LevMicroBench {
  def bandedLev(a: String, b: String, k: Int): Int = {
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length; val m = t.length
    if (m - n > k) return -1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, k + 1)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, k + 1)
      val lo = math.max(1, i - k); val hi = math.min(m, i + k)
      cur(lo - 1) = k + 1
      if (lo == 1) cur(0) = i
      j = lo
      var rowMin = cur(0)
      val sc = s.charAt(i - 1)
      while (j <= hi) {
        val cost = if (sc == t.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1; if (del < v) v = del
        val ins = cur(j - 1) + 1; if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return -1
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) > k) -1 else prev(m)
  }

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    def mkDoc(): String = {
      val sb = new StringBuilder
      while (sb.length < 400) sb.append(('a' + rnd.nextInt(26)).toChar).append(
        if (rnd.nextInt(5) == 0) " " else "")
      sb.toString
    }
    // near pairs: ~40 edits apart; far pairs: unrelated
    val pairs = (0 until 2000).map { i =>
      val a = mkDoc()
      if (i % 2 == 0) {
        val chars = a.toCharArray
        (0 until 40).foreach(_ => chars(rnd.nextInt(chars.length)) = ('a' + rnd.nextInt(26)).toChar)
        (a, new String(chars))
      } else (a, mkDoc())
    }
    val u = pairs.map { case (a, b) => (UTF8String.fromString(a), UTF8String.fromString(b)) }
    // correctness: agreement
    pairs.zip(u).foreach { case ((a, b), (ua, ub)) =>
      val x = ua.levenshteinDistance(ub, 80)
      val y = bandedLev(a, b, 80)
      require(x == y, s"mismatch: spark=$x mine=$y")
    }
    (0 until 3).foreach { _ =>
      var t0 = System.nanoTime()
      var s1 = 0L
      u.foreach { case (a, b) => s1 += a.levenshteinDistance(b, 80) }
      val tu = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      var s2 = 0L
      pairs.foreach { case (a, b) => s2 += bandedLev(a, b, 80) }
      val tb = (System.nanoTime() - t0) / 1e9
      println(f"2000 pairs: UTF8String=$tu%.3f s  banded=$tb%.3f s  (checks $s1 $s2)")
    }
  }
}
