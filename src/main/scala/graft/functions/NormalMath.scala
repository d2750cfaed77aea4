package graft.functions

/** Standard-normal CDF / inverse-CDF in pure static double math.
  *
  * The reference computes these through a native Polars plugin (reference
  * `engine/irb/stats_backend.py:1-45`, used by the IRB capital formula
  * `engine/irb/formulas.py:844-852`); Spark has no built-in `erf`/`ppf`
  * Column function, so this is the engine's one genuine scalar extension
  * (SURVEY.md §2.8, §7.3). Static methods so generated code
  * (`doGenCode`) can call them directly — one virtual-free call per row.
  *
  * Algorithms (both classic, published, engine-independent):
  *  - erf/erfc: W. J. Cody's rational Chebyshev approximation
  *    (SPECFUN/CALERF, netlib), |rel err| < 1e-15 on the double range.
  *  - inverse CDF: Acklam's rational approximation, |rel err| < 1.15e-9 —
  *    comfortably inside the reference oracle's 1e-6 relative tolerance
  *    (reference `tests/oracle/README.md`).
  */
object NormalMath {

  private val SqrtHalf = 0.7071067811865476 // 1/sqrt(2)

  // --- Cody CALERF coefficients ---------------------------------------
  // |x| <= 0.46875
  private val A = Array(3.16112374387056560e0, 1.13864154151050156e2,
    3.77485237685302021e2, 3.20937758913846947e3, 1.85777706184603153e-1)
  private val B = Array(2.36012909523441209e1, 2.44024637934444173e2,
    1.28261652607737228e3, 2.84423683343917062e3)
  // 0.46875 < |x| <= 4.0
  private val C = Array(5.64188496988670089e-1, 8.88314979438837594e0,
    6.61191906371416295e1, 2.98635138197400131e2, 8.81952221241769090e2,
    1.71204761263407058e3, 2.05107837782607147e3, 1.23033935479799725e3,
    2.15311535474403846e-8)
  private val D = Array(1.57449261107098347e1, 1.17693950891312499e2,
    5.37181101862009858e2, 1.62138957456669019e3, 3.29079923573345963e3,
    4.36261909014324716e3, 3.43936767414372164e3, 1.23033935480374942e3)
  // |x| > 4.0
  private val P = Array(3.05326634961232344e-1, 3.60344899949804439e-1,
    1.25781726111229246e-1, 1.60837851487422766e-2, 6.58749161529837803e-4,
    1.63153871373020978e-2)
  private val Q = Array(2.56852019228982242e0, 1.87295284992346047e0,
    5.27905102951428412e-1, 6.05183413124413191e-2, 2.33520497626869185e-3)

  private val InvSqrtPi = 5.6418958354775628695e-1

  /** erf(x), Cody rational approximation. */
  def erf(x: Double): Double = {
    val ax = math.abs(x)
    if (ax <= 0.46875) {
      val z = ax * ax
      // Horner with the classic CALERF grouping:
      var xnum = A(4) * z
      var xden = z
      var i = 0
      while (i < 3) { xnum = (xnum + A(i)) * z; xden = (xden + B(i)) * z; i += 1 }
      x * (xnum + A(3)) / (xden + B(3))
    } else {
      val e = erfc(ax)
      if (x >= 0) 1.0 - e else e - 1.0
    }
  }

  /** erfc(x), Cody rational approximation (all branches). */
  def erfc(x: Double): Double = {
    val ax = math.abs(x)
    val r =
      if (ax <= 0.46875) {
        1.0 - erf(ax)
      } else if (ax <= 4.0) {
        var xnum = C(8) * ax
        var xden = ax
        var i = 0
        while (i < 7) { xnum = (xnum + C(i)) * ax; xden = (xden + D(i)) * ax; i += 1 }
        val frac = (xnum + C(7)) / (xden + D(7))
        // exp(-x²) computed as exp(-xsq)*exp(-del) for accuracy (CALERF trick)
        val xsq = math.floor(ax * 16.0) / 16.0
        val del = (ax - xsq) * (ax + xsq)
        math.exp(-xsq * xsq) * math.exp(-del) * frac
      } else if (ax < 26.543) {
        val z = 1.0 / (ax * ax)
        var xnum = P(5) * z
        var xden = z
        var i = 0
        while (i < 4) { xnum = (xnum + P(i)) * z; xden = (xden + Q(i)) * z; i += 1 }
        var frac = z * (xnum + P(4)) / (xden + Q(4))
        frac = (InvSqrtPi - frac) / ax
        val xsq = math.floor(ax * 16.0) / 16.0
        val del = (ax - xsq) * (ax + xsq)
        math.exp(-xsq * xsq) * math.exp(-del) * frac
      } else 0.0
    if (x < 0) 2.0 - r else r
  }

  /** Standard normal CDF Φ(x) = erfc(-x/√2)/2. */
  def normCdf(x: Double): Double = 0.5 * erfc(-x * SqrtHalf)

  // --- Acklam inverse-normal coefficients -----------------------------
  private val IA = Array(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
    2.506628277459239e+00)
  private val IB = Array(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
  private val IC = Array(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
    2.938163982698783e+00)
  private val ID = Array(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)

  private val PLow = 0.02425
  private val PHigh = 1.0 - PLow

  /** Standard normal inverse CDF Φ⁻¹(p) (quantile / ppf), Acklam. */
  def normPpf(p: Double): Double = {
    if (p.isNaN || p < 0.0 || p > 1.0) Double.NaN
    else if (p == 0.0) Double.NegativeInfinity
    else if (p == 1.0) Double.PositiveInfinity
    else if (p < PLow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((IC(0) * q + IC(1)) * q + IC(2)) * q + IC(3)) * q + IC(4)) * q + IC(5)) /
        ((((ID(0) * q + ID(1)) * q + ID(2)) * q + ID(3)) * q + 1.0)
    } else if (p <= PHigh) {
      val q = p - 0.5
      val r = q * q
      (((((IA(0) * r + IA(1)) * r + IA(2)) * r + IA(3)) * r + IA(4)) * r + IA(5)) * q /
        (((((IB(0) * r + IB(1)) * r + IB(2)) * r + IB(3)) * r + IB(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -((((((IC(0) * q + IC(1)) * q + IC(2)) * q + IC(3)) * q + IC(4)) * q + IC(5)) /
        ((((ID(0) * q + ID(1)) * q + ID(2)) * q + ID(3)) * q + 1.0))
    }
  }
}
