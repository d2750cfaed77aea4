package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy tests for the normal-distribution kernels against vectors
  * computed independently with CPython's `math.erf` and
  * `statistics.NormalDist().inv_cdf` (engine-independent oracles, same
  * spirit as the reference's hand-derived oracle layer,
  * reference `tests/oracle/README.md` — rel tolerance there is 1e-6; we
  * hold erf/cdf to 1e-14 and ppf to Acklam's published 1.15e-9).
  */
class NormalMathSpec extends AnyFunSuite {

  private def relErr(got: Double, want: Double): Double =
    if (want == 0.0) math.abs(got) else math.abs(got - want) / math.abs(want)

  test("erf matches CPython math.erf to 1e-14") {
    val vectors = Seq(
      (-3.0, -0.9999779095030014), (-1.0, -0.8427007929497149),
      (-0.3, -0.3286267594591274), (0.0, 0.0), (0.3, 0.3286267594591274),
      (0.46875, 0.49261347321793797), (0.5, 0.5204998778130465),
      (1.0, 0.8427007929497149), (2.0, 0.9953222650189527),
      (4.0, 0.9999999845827421), (4.5, 0.9999999998033839), (6.0, 1.0))
    for ((x, want) <- vectors)
      assert(relErr(NormalMath.erf(x), want) < 1e-14, s"erf($x)")
  }

  test("normCdf matches CPython erfc-based CDF to 1e-13") {
    // Tail values come from 0.5*math.erfc(-x/sqrt(2)) — NOT
    // statistics.NormalDist.cdf, which computes via erf and loses relative
    // precision past ~ -6 to catastrophic cancellation (its value at -8 is
    // off by 1.9e-2 relative). The erfc formulation is the accurate one.
    val vectors = Seq(
      (-8.0, 6.220960574271756e-16), (-5.0, 2.8665157187919365e-07),
      (-3.0, 0.001349898031630093), (-2.0, 0.02275013194817921),
      (-1.0, 0.15865525393145707), (-0.5, 0.3085375387259869),
      (-0.1, 0.460172162722971), (0.0, 0.5), (0.1, 0.539827837277029),
      (0.5, 0.6914624612740131), (1.0, 0.8413447460685429),
      (2.0, 0.9772498680518208), (3.0, 0.9986501019683699),
      (5.0, 0.9999997133484282), (8.0, 0.9999999999999993))
    for ((x, want) <- vectors)
      assert(relErr(NormalMath.normCdf(x), want) < 1e-13, s"normCdf($x)")
  }

  test("normPpf matches CPython NormalDist.inv_cdf to 1.2e-9 (Acklam bound)") {
    val vectors = Seq(
      (1e-09, -5.9978070150076865), (1e-06, -4.753424308822899),
      (0.001, -3.090232306167813), (0.02425, -1.9729610513118845),
      (0.1, -1.2815515655446008), (0.25, -0.6744897501960817),
      (0.5, 0.0), (0.75, 0.6744897501960817), (0.9, 1.2815515655446008),
      (0.97575, 1.9729610513118847), (0.999, 3.090232306167813),
      (0.999999, 4.753424308817089), (0.999999999, 5.997807019601638))
    for ((p, want) <- vectors)
      assert(relErr(NormalMath.normPpf(p), want) < 1.2e-9, s"normPpf($p)")
  }

  test("ppf/cdf round-trip and edge cases") {
    for (p <- Seq(0.0001, 0.01, 0.3, 0.5, 0.7, 0.99, 0.9999)) {
      val x = NormalMath.normPpf(p)
      assert(math.abs(NormalMath.normCdf(x) - p) < 1e-8, s"roundtrip($p)")
    }
    assert(NormalMath.normPpf(0.0).isNegInfinity)
    assert(NormalMath.normPpf(1.0).isPosInfinity)
    assert(NormalMath.normPpf(-0.1).isNaN)
    assert(NormalMath.normPpf(1.1).isNaN)
    assert(NormalMath.normCdf(40.0) == 1.0)
    assert(NormalMath.normCdf(-40.0) == 0.0)
  }
}
