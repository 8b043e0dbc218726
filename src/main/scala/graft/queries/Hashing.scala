package graft.queries

/** Deterministic 64-bit hashing helpers for the dedup/similarity signature
  * kernels. Signature quality only needs good avalanche behavior — the
  * correctness gates compare exact jaccard/hamming on the candidate pairs,
  * never the signatures themselves. */
object Hashing {

  /** 64-bit string hash from two independent 32-bit murmur passes. */
  def hash64(s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Murmur3 64-bit finalizer — a cheap full-avalanche permutation family
    * when xor'd with per-function seeds. */
  def mix(z0: Long): Long = {
    var z = z0
    z ^= z >>> 33
    z *= 0xff51afd7ed558ccdL
    z ^= z >>> 33
    z *= 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    z
  }

  def seeds(n: Int, seed: Long): Array[Long] = {
    val r = new java.util.SplittableRandom(seed)
    Array.fill(n)(r.nextLong())
  }
}
