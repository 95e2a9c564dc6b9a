package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UuidV7
import graft.sources.Grib

/** Property-based checks for the pure (driver-side) functions — scalacheck
  * driven directly (no scalatest bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(result.passed, result.status.toString)
  }

  test("normalizeLon maps any longitude into [-180, 180) and is idempotent") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { lon =>
      val n = Grib.normalizeLon(lon)
      val inRange = n >= -180.0 && n < 180.0
      val idempotent = math.abs(Grib.normalizeLon(n) - n) < 1e-9
      val diff = math.abs((lon - n) % 360.0)
      val sameAngle = diff < 1e-6 || math.abs(diff - 360.0) < 1e-6
      inRange && idempotent && sameAngle
    })
  }

  test("UuidV7 time ordering is monotone in epoch millis") {
    check(Prop.forAll(Gen.chooseNum(0L, 1L << 47), Gen.chooseNum(0L, 1L << 47)) {
      (a, b) =>
        a == b || {
          val (lo, hi) = if (a < b) (a, b) else (b, a)
          UuidV7.deterministic(lo, 1L) < UuidV7.deterministic(hi, 1L)
        }
    })
  }

  test("deterministic UuidV7 is a pure function of (millis, seed)") {
    check(Prop.forAll(Gen.chooseNum(0L, 1L << 40), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (ms, seed) => UuidV7.deterministic(ms, seed) == UuidV7.deterministic(ms, seed)
    })
  }
}
