package graft.kernels

/** Small derivative-free optimizers for model fitting (the reference relies
  * on Rust argmin/crate-internal optimizers; we hand-roll since the build is
  * offline — SURVEY.md §7.5). */
object Optim {

  /** Nelder-Mead with box constraints (clamped). Returns best point. */
  def nelderMead(f: Array[Double] => Double, x0: Array[Double],
                 lower: Array[Double], upper: Array[Double],
                 maxIter: Int = 200, tol: Double = 1e-8): Array[Double] = {
    val n = x0.length
    @inline def clamp(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](n)
      var i = 0
      while (i < n) { y(i) = math.min(upper(i), math.max(lower(i), x(i))); i += 1 }
      y
    }
    @inline def eval(x: Array[Double]): Double = {
      val v = f(x)
      if (v.isNaN) Double.PositiveInfinity else v
    }
    // initial simplex
    var simplex = Array.tabulate(n + 1) { i =>
      val p = x0.clone()
      if (i > 0) {
        val j = i - 1
        val step = math.max(0.05 * (upper(j) - lower(j)), 1e-4)
        p(j) = p(j) + (if (p(j) + step <= upper(j)) step else -step)
      }
      clamp(p)
    }
    var fvals = simplex.map(eval)

    var iter = 0
    while (iter < maxIter) {
      val order = fvals.zipWithIndex.sortBy(_._1).map(_._2)
      simplex = order.map(simplex)
      fvals = order.map(fvals)
      if (math.abs(fvals(n) - fvals(0)) <= tol * (math.abs(fvals(0)) + tol)) iter = maxIter
      else {
        val centroid = new Array[Double](n)
        var i = 0
        while (i < n) {
          var s = 0.0; var k = 0
          while (k < n) { s += simplex(k)(i); k += 1 }
          centroid(i) = s / n
          i += 1
        }
        @inline def mix(c1: Double, c2: Double): Array[Double] =
          clamp(Array.tabulate(n)(j => c1 * centroid(j) + c2 * simplex(n)(j)))
        val xr = mix(2.0, -1.0) // reflection
        val fr = eval(xr)
        if (fr < fvals(0)) {
          val xe = mix(3.0, -2.0) // expansion
          val fe = eval(xe)
          if (fe < fr) { simplex(n) = xe; fvals(n) = fe }
          else { simplex(n) = xr; fvals(n) = fr }
        } else if (fr < fvals(n - 1)) {
          simplex(n) = xr; fvals(n) = fr
        } else {
          val xc = mix(0.5, 0.5) // contraction
          val fc = eval(xc)
          if (fc < fvals(n)) { simplex(n) = xc; fvals(n) = fc }
          else { // shrink toward best
            var k = 1
            while (k <= n) {
              simplex(k) = clamp(Array.tabulate(n)(j => 0.5 * (simplex(0)(j) + simplex(k)(j))))
              fvals(k) = eval(simplex(k))
              k += 1
            }
          }
        }
        iter += 1
      }
    }
    simplex(fvals.zipWithIndex.minBy(_._1)._2)
  }

  /** Golden-section search on [a, b], unimodal assumption. */
  def goldenSection(f: Double => Double, a0: Double, b0: Double,
                    tol: Double = 1e-6, maxIter: Int = 100): Double = {
    val phi = (math.sqrt(5.0) - 1.0) / 2.0
    var a = a0; var b = b0
    var c = b - phi * (b - a)
    var d = a + phi * (b - a)
    var fc = f(c); var fd = f(d)
    var i = 0
    while (math.abs(b - a) > tol && i < maxIter) {
      if (fc < fd) { b = d; d = c; fd = fc; c = b - phi * (b - a); fc = f(c) }
      else { a = c; c = d; fc = fd; d = a + phi * (b - a); fd = f(d) }
      i += 1
    }
    (a + b) / 2.0
  }
}
