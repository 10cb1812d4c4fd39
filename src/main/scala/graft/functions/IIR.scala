package graft.functions

/** Order-N IIR filter design + application — the engine's re-expression
  * of the reference's scipy Butterworth low-pass
  * (point/utils/filters.py:18-27: `butter(order, cutoff/nyq)` +
  * `lfilter(b, a, data)`).
  *
  * `butterLowpass` mirrors scipy.signal.butter(order, wn, 'low'):
  * analog Butterworth prototype poles -> pre-warped bilinear transform
  * -> real polynomial coefficients, DC gain exactly 1. `lfilter`
  * mirrors scipy.signal.lfilter with zero initial state (direct form
  * II transposed), so every output depends only on the ordered prefix —
  * the property that lets the distributed form (Graft.iirFilter) run as
  * a sort-within-partitions streaming fold with O(1) state per key.
  */
object IIR {

  private final case class C(re: Double, im: Double) {
    def +(o: C) = C(re + o.re, im + o.im)
    def -(o: C) = C(re - o.re, im - o.im)
    def *(o: C) = C(re * o.re - im * o.im, re * o.im + im * o.re)
    def /(o: C) = {
      val d = o.re * o.re + o.im * o.im
      C((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
  }

  /** Coefficients of prod_k (z - r_k) for complex roots r_k (poles come
    * in conjugate pairs, so the result is real up to rounding). */
  private def poly(roots: Seq[C]): Array[Double] = {
    var coeffs = Array(C(1.0, 0.0))
    roots.foreach { r =>
      val next = new Array[C](coeffs.length + 1)
      java.util.Arrays.fill(next.asInstanceOf[Array[AnyRef]], C(0.0, 0.0))
      for (i <- coeffs.indices) {
        next(i) = next(i) + coeffs(i)
        next(i + 1) = next(i + 1) + coeffs(i) * C(-r.re, -r.im)
      }
      coeffs = next
    }
    coeffs.map(_.re)
  }

  /** Digital Butterworth low-pass (b, a); `wn` is the cutoff as a
    * fraction of Nyquist, exactly scipy's normalization
    * (reference point/utils/filters.py:18-22: cutoff / (0.5 * fs)). */
  def butterLowpass(order: Int, wn: Double): (Array[Double], Array[Double]) = {
    require(order >= 1, "order >= 1")
    require(wn > 0 && wn < 1, "0 < wn < 1 (fraction of Nyquist)")
    val k = math.tan(math.Pi * wn / 2) // pre-warped analog cutoff
    // analog prototype poles (left half plane, unit circle), scaled by k
    val analog = (0 until order).map { i =>
      val theta = math.Pi * (2 * i + order + 1) / (2.0 * order)
      C(k * math.cos(theta), k * math.sin(theta))
    }
    // bilinear transform: z = (1 + p) / (1 - p)
    val zPoles = analog.map(p => (C(1, 0) + p) / (C(1, 0) - p))
    val a = poly(zPoles)
    // order zeros at z = -1; gain fixed so H(z=1) = 1 (unit DC gain)
    val bUnit = poly(Seq.fill(order)(C(-1.0, 0.0)))
    val gain = a.sum / bUnit.sum
    (bUnit.map(_ * gain), a)
  }

  /** scipy.signal.lfilter(b, a, x) with zero initial conditions —
    * direct form II transposed. Sequential reference used by specs and
    * by the per-key distributed fold. */
  def lfilter(b: Array[Double], a: Array[Double], xs: Seq[Double]): Seq[Double] = {
    val st = newState(b, a)
    xs.map(x => step(b, a, st, x))
  }

  def newState(b: Array[Double], a: Array[Double]): Array[Double] =
    new Array[Double](math.max(b.length, a.length) - 1)

  /** One DF2T step; `a(0)` must be 1 (butterLowpass guarantees it up to
    * rounding; callers with arbitrary coefficients should pre-divide). */
  def step(b: Array[Double], a: Array[Double], z: Array[Double], x: Double): Double = {
    val y = b(0) * x + (if (z.length > 0) z(0) else 0.0)
    var i = 0
    while (i < z.length) {
      val bi = if (i + 1 < b.length) b(i + 1) else 0.0
      val ai = if (i + 1 < a.length) a(i + 1) else 0.0
      z(i) = bi * x - ai * y + (if (i + 1 < z.length) z(i + 1) else 0.0)
      i += 1
    }
    y
  }

  /** First-order exponential smoothing as (b, a) — the lfilter form of
    * y_n = alpha*x_n + (1-alpha)*y_{n-1} (zero initial state). */
  def exponential(alpha: Double): (Array[Double], Array[Double]) =
    (Array(alpha), Array(1.0, alpha - 1.0))
}
