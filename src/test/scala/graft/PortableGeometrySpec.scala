package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-10 portable-geometry arguments — the
  * numeric claims that let q_similarity_ivf and q_dedup_semantic be
  * DuckDB-oracled despite float arithmetic. Each test is the exact
  * statement the query comments rely on, checked against exact
  * BigDecimal/BigInt rationals over adversarial ranges, so a future
  * parameter change (bigger corpora, wider vectors, a different
  * fixed-point scale) that breaks a bound fails HERE by name instead
  * of as an sf1 oracle hash mismatch. Pure JVM. */
class PortableGeometrySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  /** BigInt-exact floor division (toward negative infinity). */
  private def exactFloorDiv(s: Long, n: Long): Long =
    if (s >= 0 || s % n == 0) s / n else s / n - 1

  test("floor(v * 2^20) equals the exact rational floor for any float in [-16, 16]") {
    // the IVF quantizer: multiplying a float-exact double by a power
    // of two never rounds, so floor sees the exact product
    forAll(Gen.chooseNum(-16f, 16f)) { f =>
      val viaDouble = math.floor(f.toDouble * 1048576.0)
      // BigDecimal.exact: the true binary value of the double, not the
      // shortest decimal repr Scala's BigDecimal(Double) would give
      val exact = BigDecimal.exact(f.toDouble) * BigDecimal(1048576)
      BigDecimal(viaDouble) <= exact &&
        exact < BigDecimal(viaDouble) + 1 &&
        viaDouble == viaDouble.toLong.toDouble // integral, cast-safe
    }
  }

  test("floor(sum/count) matches the exact rational floor for every " +
      "centroid-scale operand (|sum| <= 2^44, count <= 5*10^5)") {
    // the centroid claim: the correctly-rounded double division sits
    // far from the floor boundary at these magnitudes (1/count >>
    // ulp(quotient)), so floor-after-divide equals the true rational
    // floor in any IEEE engine — what makes floor(sum/count) the
    // portable replacement for decimal avg
    forAll(Gen.zip(Gen.chooseNum(-(1L << 44), 1L << 44),
        Gen.chooseNum(1L, 500000L))) { case (s, n) =>
      math.floor(s.toDouble / n.toDouble).toLong == exactFloorDiv(s, n)
    }
  }

  test("adversarial near-boundary quotients still floor exactly") {
    // quotients one off an exact multiple — the closest any
    // centroid-scale division gets to the boundary
    forAll(Gen.zip(Gen.chooseNum(-(1L << 24), 1L << 24),
        Gen.chooseNum(2L, 500000L))) { case (q, n) =>
      Seq(q * n - 1, q * n, q * n + 1).forall { s =>
        math.floor(s.toDouble / n.toDouble).toLong == exactFloorDiv(s, n)
      }
    }
  }

  test("the float mirror of any centered-integer component is itself an integer") {
    // vf = float(cv): above 2^24 the float rounds, but it rounds to a
    // representable float that is still integral — which is why sums
    // of vf components are exact in double and the oracle can mirror
    // them with CAST(CAST(c AS FLOAT) AS DOUBLE)
    forAll(Gen.chooseNum(-(1L << 40), 1L << 40)) { cv =>
      val d = cv.toFloat.toDouble
      d == math.rint(d)
    }
  }

  test("sums of float-mirror components stay exact in double at corpus scale") {
    // 64-dim components |vf_i| < 2^28, summed over <= 16384 fit docs:
    // every partial sum is an integer < 2^53, so accumulation order
    // cannot matter — the property that makes the centroid sums
    // shuffle-order-proof AND engine-portable. Checked by comparing
    // a double fold against BigInt over random component lists.
    val comps = Gen.listOfN(256, Gen.chooseNum(-(1L << 28), 1L << 28))
    forAll(comps) { xs =>
      val floats = xs.map(_.toFloat)
      val viaDouble = floats.foldLeft(0.0)((acc, f) => acc + f.toDouble)
      val exact = floats.map(f => BigDecimal(f.toDouble)).sum
      BigDecimal(viaDouble) == exact
    }
  }
}
