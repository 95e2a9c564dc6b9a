package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UuidV7

class UuidSpec extends AnyFunSuite {

  private val UuidRe =
    "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r

  test("C6: version-7 layout, variant bits, canonical text form") {
    val u = UuidV7.generate()
    assert(UuidRe.matches(u), s"bad uuidv7: $u")
  }

  test("time-ordered: later millis sort lexicographically later") {
    val a = UuidV7.generate(1000000L)
    val b = UuidV7.generate(2000000L)
    assert(a < b)
  }

  test("deterministic variant is stable and seed-sensitive") {
    val a1 = UuidV7.deterministic(42L, 7L)
    val a2 = UuidV7.deterministic(42L, 7L)
    val b = UuidV7.deterministic(42L, 8L)
    assert(a1 === a2)
    assert(a1 !== b)
    assert(UuidRe.matches(a1))
  }
}
