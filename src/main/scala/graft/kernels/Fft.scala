package graft.kernels

/** Radix-2 Cooley-Tukey FFT (no external deps — the build is offline;
  * SURVEY.md §7.5). Inputs are zero-padded to the next power of two. */
object Fft {

  /** In-place FFT over interleaved re/im arrays (lengths must be equal,
    * power of two). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, "FFT length must be a power of two")
    if (n <= 1) return
    // bit reversal
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wRe = math.cos(ang)
      val wIm = math.sin(ang)
      var base = 0
      while (base < n) {
        var curRe = 1.0
        var curIm = 0.0
        var k = 0
        while (k < len / 2) {
          val uRe = re(base + k); val uIm = im(base + k)
          val vRe = re(base + k + len / 2) * curRe - im(base + k + len / 2) * curIm
          val vIm = re(base + k + len / 2) * curIm + im(base + k + len / 2) * curRe
          re(base + k) = uRe + vRe
          im(base + k) = uIm + vIm
          re(base + k + len / 2) = uRe - vRe
          im(base + k + len / 2) = uIm - vIm
          val nRe = curRe * wRe - curIm * wIm
          curIm = curRe * wIm + curIm * wRe
          curRe = nRe
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Periodogram of a demeaned, zero-padded series: (frequencies, power).
    * frequency(i) = i / paddedN, i = 1 .. paddedN/2. */
  def periodogram(values: Array[Double]): (Array[Double], Array[Double]) = {
    val n = values.length
    var padded = 1
    while (padded < n) padded <<= 1
    val mean = values.sum / n
    val re = new Array[Double](padded)
    val im = new Array[Double](padded)
    var i = 0
    while (i < n) { re(i) = values(i) - mean; i += 1 }
    fft(re, im)
    val half = padded / 2
    val freqs = new Array[Double](half)
    val power = new Array[Double](half)
    i = 1
    while (i <= half) {
      freqs(i - 1) = i.toDouble / padded
      power(i - 1) = re(i) * re(i) + im(i) * im(i)
      i += 1
    }
    (freqs, power)
  }
}
