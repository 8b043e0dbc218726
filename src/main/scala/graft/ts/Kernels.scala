package graft.ts

/** Per-group time-series math kernels.
  *
  * These are the only pieces of the reference with no Catalyst builtin:
  *  - quadratic OLS detrend (reference: detrendandstat_quad.R:132-140)
  *  - Hodrick–Prescott filter (reference: dtrendandstat_HP100.R:136-145)
  *
  * Each operates on one group's column vector (= one country's series in the
  * reference, T <= 60; generically a few thousand points). Groups run inside
  * executor tasks via [[GroupKernels]]; at 100 TB the parallelism is across
  * groups, so O(T) / O(T^3) here with tiny T is never the bottleneck.
  *
  * Missing values are passed as NaN and preserved positionally: kernels fit on
  * finite observations only and emit NaN where the input was not finite,
  * matching the reference's `is.finite` guards (detrendandstat_quad.R:134).
  */
object Kernels {

  /** Residuals of OLS fit y ~ 1 + t + t^2 over finite (t, y) pairs.
    *
    * Requires >= minObs finite pairs, else returns all-NaN
    * (detrendandstat_quad.R:135 `if (sum(ok) >= 30)`).
    *
    * The time basis is centered (u = t - mean(t)) before forming normal
    * equations: residuals are invariant to the affine basis change (same
    * column space as {1, t, t^2}), and conditioning improves from ~1e6 to
    * ~1e3, so a closed-form 3x3 Cramer solve matches R `lm`'s QR to ~1e-12.
    */
  def quadResiduals(t: Array[Double], y: Array[Double], minObs: Int): Array[Double] = {
    val n = t.length
    val out = Array.fill(n)(Double.NaN)
    var nOk = 0
    var tSum = 0.0
    var i = 0
    while (i < n) {
      if (finite(t(i)) && finite(y(i))) { nOk += 1; tSum += t(i) }
      i += 1
    }
    if (nOk < minObs) return out
    val tBar = tSum / nOk
    // Normal-equation sums on the centered basis.
    var s1, s2, s3, s4, sy, s1y, s2y = 0.0
    i = 0
    while (i < n) {
      if (finite(t(i)) && finite(y(i))) {
        val u = t(i) - tBar
        val u2 = u * u
        s1 += u; s2 += u2; s3 += u2 * u; s4 += u2 * u2
        sy += y(i); s1y += u * y(i); s2y += u2 * y(i)
      }
      i += 1
    }
    val s0 = nOk.toDouble
    // Cramer's rule on the symmetric 3x3 system M c = rhs.
    val det = det3(s0, s1, s2, s1, s2, s3, s2, s3, s4)
    val c0 = det3(sy, s1, s2, s1y, s2, s3, s2y, s3, s4) / det
    val c1 = det3(s0, sy, s2, s1, s1y, s3, s2, s2y, s4) / det
    val c2 = det3(s0, s1, sy, s1, s2, s1y, s2, s3, s2y) / det
    i = 0
    while (i < n) {
      if (finite(t(i)) && finite(y(i))) {
        val u = t(i) - tBar
        out(i) = y(i) - (c0 + c1 * u + c2 * u * u)
      }
      i += 1
    }
    out
  }

  /** Hodrick–Prescott cycle: x - trend, trend solving (I + lambda D'D) tau = x.
    *
    * Finite values are compacted positionally before filtering and results
    * scattered back, like the reference helper (dtrendandstat_HP100.R:136-145);
    * requires >= minObs finite values, else all-NaN.
    *
    * D is the (m-2) x m second-difference matrix, so I + lambda D'D is
    * pentadiagonal SPD — solved with a banded (bandwidth-2) Cholesky in O(m),
    * matching mFilter::hpfilter's dense solve to ~1e-12.
    */
  def hpCycle(x: Array[Double], lambda: Double, minObs: Int): Array[Double] = {
    val n = x.length
    val out = Array.fill(n)(Double.NaN)
    val okIdx = (0 until n).filter(i => finite(x(i))).toArray
    val m = okIdx.length
    if (m < minObs) return out
    val v = okIdx.map(x)
    val trend = hpTrend(v, lambda)
    var j = 0
    while (j < m) { out(okIdx(j)) = v(j) - trend(j); j += 1 }
    out
  }

  /** Solve (I + lambda D'D) tau = x for the HP trend (banded Cholesky). */
  def hpTrend(x: Array[Double], lambda: Double): Array[Double] = {
    val m = x.length
    if (m < 3) return x.clone()
    // Pentadiagonal A = I + lambda * D'D (stencil of the 2nd-difference op).
    val diag = new Array[Double](m)
    val sub1 = new Array[Double](m - 1) // A(j+1, j)
    val sub2 = new Array[Double](m - 2) // A(j+2, j)
    var j = 0
    while (j < m) {
      val dtd =
        if (j == 0 || j == m - 1) 1.0
        else if (j == 1 || j == m - 2) 5.0
        else 6.0
      diag(j) = 1.0 + lambda * dtd
      j += 1
    }
    j = 0
    while (j < m - 1) {
      val dtd = if (j == 0 || j == m - 2) -2.0 else -4.0
      sub1(j) = lambda * dtd
      j += 1
    }
    j = 0
    while (j < m - 2) { sub2(j) = lambda * 1.0; j += 1 }
    // Banded Cholesky A = L L', L lower with bands d (diag), e (sub1), f (sub2).
    val d = new Array[Double](m)
    val e = new Array[Double](math.max(m - 1, 0))
    val f = new Array[Double](math.max(m - 2, 0))
    j = 0
    while (j < m) {
      var s = diag(j)
      if (j >= 1) s -= e(j - 1) * e(j - 1)
      if (j >= 2) s -= f(j - 2) * f(j - 2)
      d(j) = math.sqrt(s)
      if (j + 1 < m) {
        var s1 = sub1(j)
        if (j >= 1) s1 -= f(j - 1) * e(j - 1)
        e(j) = s1 / d(j)
      }
      if (j + 2 < m) f(j) = sub2(j) / d(j)
      j += 1
    }
    def solve(rhs: Array[Double]): Array[Double] = {
      // Forward solve L y = rhs, then back solve L' tau = y.
      val yv = new Array[Double](m)
      var i = 0
      while (i < m) {
        var s = rhs(i)
        if (i >= 1) s -= e(i - 1) * yv(i - 1)
        if (i >= 2) s -= f(i - 2) * yv(i - 2)
        yv(i) = s / d(i)
        i += 1
      }
      val out = new Array[Double](m)
      i = m - 1
      while (i >= 0) {
        var s = yv(i)
        if (i + 1 < m) s -= e(i) * out(i + 1)
        if (i + 2 < m) s -= f(i) * out(i + 2)
        out(i) = s / d(i)
        i -= 1
      }
      out
    }
    val tau = solve(x)
    // One step of iterative refinement: r = x - A tau via the exact
    // pentadiagonal stencil, then tau += A^-1 r. Recovers the last ~3
    // digits the λ-scaled cancellation costs (worst observed 1.9e-9 rel
    // vs R's dense solve at λ=6.25 before; ~1e-12 after).
    val r = new Array[Double](m)
    j = 0
    while (j < m) {
      var s = diag(j) * tau(j)
      if (j >= 1) s += sub1(j - 1) * tau(j - 1)
      if (j + 1 < m) s += sub1(j) * tau(j + 1)
      if (j >= 2) s += sub2(j - 2) * tau(j - 2)
      if (j + 2 < m) s += sub2(j) * tau(j + 2)
      r(j) = x(j) - s
      j += 1
    }
    val corr = solve(r)
    j = 0
    while (j < m) { tau(j) += corr(j); j += 1 }
    tau
  }

  /** Exponentially weighted moving average: y_0 = x_0, then
    * y_t = alpha*x_t + beta*y_{t-1} (the caller passes both weights as
    * LITERALS so an oracle writing the same literals folds bit-identically
    * — computing beta as 1-alpha would round differently than the literal).
    * NaN inputs propagate from their first occurrence, like the running
    * state they poison; callers filter nulls upstream. */
  def ewma(x: Array[Double], alpha: Double, beta: Double): Array[Double] = {
    val out = new Array[Double](x.length)
    var i = 0
    var acc = 0.0
    while (i < x.length) {
      acc = if (i == 0) x(0) else alpha * x(i) + beta * acc
      out(i) = acc
      i += 1
    }
    out
  }

  /** Holt's linear (double exponential) smoothing: level + trend state.
    * l_0 = x_0, b_0 = 0; l_i = 0.3 x_i + 0.7 (l + b);
    * b_i = 0.4 (l_i - l) + 0.6 b. The four smoothing weights are FIXED
    * LITERALS (not 1-α at runtime) so every fold step is the identical
    * IEEE expression the DuckDB list_reduce oracle evaluates. Returns the
    * level series. */
  def holt(x: Array[Double]): Array[Double] = {
    val out = new Array[Double](x.length)
    var l = x(0)
    var b = 0.0
    out(0) = l
    var i = 1
    while (i < x.length) {
      val lNew = 0.3 * x(i) + 0.7 * (l + b)
      b = 0.4 * (lNew - l) + 0.6 * b
      l = lNew
      out(i) = l
      i += 1
    }
    out
  }

  @inline private def finite(v: Double): Boolean =
    !java.lang.Double.isNaN(v) && !java.lang.Double.isInfinite(v)

  @inline private def det3(a: Double, b: Double, c: Double,
                           d: Double, e: Double, f: Double,
                           g: Double, h: Double, i: Double): Double =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
}
