package graft.kernels

/** Missing-value imputation kernels.
  * Semantics match reference crates/anofox-fcst-core/src/imputation.rs:1-130.
  * Null is represented as Double.NaN paired with a validity flag at the
  * DataFrame boundary; kernel-side we use Array[Double] + Array[Boolean].
  */
object Imputation {

  /** Linear interpolation of nulls; leading/trailing nulls take the
    * first/last observed value (imputation.rs:62-130). All-null input
    * stays NaN. */
  def fillInterpolate(values: Array[Double], valid: Array[Boolean]): Array[Double] = {
    val n = values.length
    val out = Array.fill(n)(Double.NaN)
    var first = -1
    var last = -1
    var i = 0
    while (i < n) {
      if (valid(i)) { if (first < 0) first = i; last = i }
      i += 1
    }
    if (first < 0) return out
    i = 0
    while (i < first) { out(i) = values(first); i += 1 }
    i = last + 1
    while (i < n) { out(i) = values(last); i += 1 }
    var prevIdx = first
    var prevVal = values(first)
    out(first) = prevVal
    i = first + 1
    while (i <= last) {
      if (valid(i)) {
        val v = values(i)
        val gap = i - prevIdx
        if (gap > 1) {
          val slope = (v - prevVal) / gap
          var j = 1
          while (j < gap) { out(prevIdx + j) = prevVal + slope * j; j += 1 }
        }
        out(i) = v
        prevIdx = i
        prevVal = v
      }
      i += 1
    }
    out
  }

  /** LOCF (imputation.rs:9-27). Nulls before the first value remain null. */
  def fillForward(values: Array[Double], valid: Array[Boolean]): (Array[Double], Array[Boolean]) = {
    val n = values.length
    val out = new Array[Double](n)
    val outValid = new Array[Boolean](n)
    var lastVal = 0.0
    var has = false
    var i = 0
    while (i < n) {
      if (valid(i)) { lastVal = values(i); has = true }
      out(i) = if (has) lastVal else Double.NaN
      outValid(i) = has
      i += 1
    }
    (out, outValid)
  }

  /** NOCB (imputation.rs:29-47). */
  def fillBackward(values: Array[Double], valid: Array[Boolean]): (Array[Double], Array[Boolean]) = {
    val n = values.length
    val out = new Array[Double](n)
    val outValid = new Array[Boolean](n)
    var nextVal = 0.0
    var has = false
    var i = n - 1
    while (i >= 0) {
      if (valid(i)) { nextVal = values(i); has = true }
      out(i) = if (has) nextVal else Double.NaN
      outValid(i) = has
      i -= 1
    }
    (out, outValid)
  }

  /** Group-mean fill (imputation.rs:49-60). */
  def fillMean(values: Array[Double], valid: Array[Boolean]): Array[Double] = {
    var sum = 0.0
    var cnt = 0
    var i = 0
    while (i < values.length) {
      if (valid(i)) { sum += values(i); cnt += 1 }
      i += 1
    }
    val mean = if (cnt == 0) Double.NaN else sum / cnt
    Array.tabulate(values.length)(j => if (valid(j)) values(j) else mean)
  }
}
