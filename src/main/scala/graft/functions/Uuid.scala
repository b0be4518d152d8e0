package graft.functions

import java.util.concurrent.ThreadLocalRandom

/** UUIDv7 — time-sortable ids, client-generated, preferred by the
  * reference for index locality (/root/reference/vechord/spec.py:213-255:
  * "UUID7 is time-sortable").
  *
  * Layout (RFC 9562): 48-bit unix-ms timestamp | ver=7 (4b) | 12b random |
  * variant=10 (2b) | 62b random. String form sorts by creation time.
  */
object Uuid {

  /** Deterministic construction from explicit parts (for tests). */
  def v7(tsMs: Long, randA: Int, randB: Long): String = {
    val msb = (tsMs << 16) | (0x7L << 12) | (randA & 0xFFFL)
    val lsb = (randB & 0x3FFFFFFFFFFFFFFFL) | Long.MinValue // variant 10
    new java.util.UUID(msb, lsb).toString
  }

  /** Fresh UUIDv7 from the wall clock. */
  def v7(): String = {
    val r = ThreadLocalRandom.current()
    v7(System.currentTimeMillis(), r.nextInt(), r.nextLong())
  }

  /** Millisecond timestamp recovered from a v7 id (sortability check). */
  def timestampMs(uuid: String): Long =
    java.util.UUID.fromString(uuid).getMostSignificantBits >>> 16
}
