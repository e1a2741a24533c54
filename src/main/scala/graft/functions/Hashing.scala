package graft.functions

/** Deterministic 64-bit hashing kernels shared by MinHash / SimHash.
  * Self-contained (no deps), stable across JVMs and Spark versions —
  * signatures computed in one round remain valid in the next.
  */
object Hashing {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long =
    fnv1a64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Same hash from raw UTF-8 bytes — a Tungsten `UTF8String`'s bytes
    * ARE the string's UTF-8 encoding, so hashing them here equals
    * `fnv1a64(string)` bit-for-bit with no decode (suite-pinned).
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** FNV-1a over a byte RANGE `[from, until)` — lets token-span kernels
    * hash a token in place without slicing a per-token array.
    */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SplitMix64 — used to derive per-permutation affine constants. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The i-th universal-hash permutation of a base hash:
    * `h_i(x) = a_i * x + b_i` with odd `a_i` (a 2^64 ring permutation).
    */
  def permute(base: Long, i: Int): Long = {
    val a = splitmix64(2L * i) | 1L
    val b = splitmix64(2L * i + 1)
    a * base + b
  }
}
