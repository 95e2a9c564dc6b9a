package graft.functions

import java.security.SecureRandom

/** C6 — UUIDv7 generator (time-ordered, RFC 9562).
  *
  * The reference assigns one UUIDv7 per `(variable, timestamp)` grid slice and
  * per ingestion run, app-side (`defs/assets.py:105,206`; Go side
  * `testutil/clickhouse.go:43`). Ids are assigned in a small driver loop over
  * distinct slices *before* explode, so plain driver-side generation is
  * faithful and keeps the plan deterministic.
  */
object UuidV7 {
  private val rng = new SecureRandom()

  def generate(): String = generate(System.currentTimeMillis())

  /** Deterministic timestamp component, random tail. */
  def generate(epochMillis: Long): String = {
    val bytes = new Array[Byte](16)
    rng.nextBytes(bytes)
    // 48-bit big-endian unix millis
    bytes(0) = (epochMillis >>> 40).toByte
    bytes(1) = (epochMillis >>> 32).toByte
    bytes(2) = (epochMillis >>> 24).toByte
    bytes(3) = (epochMillis >>> 16).toByte
    bytes(4) = (epochMillis >>> 8).toByte
    bytes(5) = epochMillis.toByte
    bytes(6) = ((bytes(6) & 0x0f) | 0x70).toByte // version 7
    bytes(8) = ((bytes(8) & 0x3f) | 0x80).toByte // variant 10
    val sb = new StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(f"${bytes(i) & 0xff}%02x")
      i += 1
    }
    sb.toString
  }

  /** Fully deterministic variant for tests/fixtures: tail derived from a seed. */
  def deterministic(epochMillis: Long, seed: Long): String = {
    var h = seed * 0x9e3779b97f4a7c15L + epochMillis
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^= h >>> 31
    val bytes = new Array[Byte](16)
    var i = 0
    while (i < 8) { bytes(8 + i) = (h >>> (56 - 8 * i)).toByte; i += 1 }
    bytes(0) = (epochMillis >>> 40).toByte
    bytes(1) = (epochMillis >>> 32).toByte
    bytes(2) = (epochMillis >>> 24).toByte
    bytes(3) = (epochMillis >>> 16).toByte
    bytes(4) = (epochMillis >>> 8).toByte
    bytes(5) = epochMillis.toByte
    bytes(6) = ((h & 0x0f) | 0x70).toByte
    bytes(8) = ((bytes(8) & 0x3f) | 0x80).toByte
    val sb = new StringBuilder(36)
    i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(f"${bytes(i) & 0xff}%02x")
      i += 1
    }
    sb.toString
  }
}
