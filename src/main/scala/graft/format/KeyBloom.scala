package graft.format

import java.util.Base64
import scala.util.hashing.MurmurHash3

/** Per-file key Bloom filter — the data-skipping companion of the
  * min/max key range for layouts where ranges cannot prune: a
  * time-partitioned table's every file spans the whole key space, so a
  * point lookup passes every range check, but each file's bloom answers
  * "definitely absent" for most keys it does not hold.
  *
  * Engine-internal by design (serialized as part of the `stats` ext
  * field the reference parser ignores): no oracle or foreign engine
  * needs to reproduce the hash — a false positive only costs an
  * unskipped read, and the scan's residual predicate keeps results
  * exact, so ANY deterministic JVM hash works. Double hashing
  * (Kirsch–Mitzenmacher): index_i = h1 + i·h2 over MurmurHash3 with two
  * fixed seeds.
  *
  * The filter is carried as its base64 payload so the case class keeps
  * value equality and the codec stays trivial.
  */
final case class KeyBloom(bits: Int, k: Int, b64: String) {
  @transient private lazy val bytes: Array[Byte] =
    Base64.getDecoder.decode(b64)

  /** false = the key is DEFINITELY not in the file. */
  def mightContain(key: String): Boolean = {
    val idx = KeyBloom.indices(key, bits, k)
    var i = 0
    while (i < idx.length) {
      val bit = idx(i)
      if ((bytes(bit >>> 3) & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }
}

object KeyBloom {
  val Seed1 = 0x9747b28c
  val Seed2 = 0x1b873593

  /** Bit indices for `key` — the ONE definition both the write-side
    * aggregator and the read-side membership test use.
    */
  def indices(key: String, bits: Int, k: Int): Array[Int] = {
    val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val h1 = MurmurHash3.bytesHash(b, Seed1)
    val h2 = MurmurHash3.bytesHash(b, Seed2) | 1 // odd: full period
    Array.tabulate(k)(i => Math.floorMod(h1 + i * h2, bits))
  }

  /** Set `key`'s bits in a byte-array filter (write side). */
  def put(filter: Array[Byte], key: String, bits: Int, k: Int): Unit = {
    val idx = indices(key, bits, k)
    var i = 0
    while (i < idx.length) {
      val bit = idx(i)
      filter(bit >>> 3) = (filter(bit >>> 3) | (1 << (bit & 7))).toByte
      i += 1
    }
  }

  def fromBytes(bytes: Array[Byte], bits: Int, k: Int): KeyBloom =
    KeyBloom(bits, k, Base64.getEncoder.encodeToString(bytes))
}
