package graft.core

/** Deterministic SplitMix64 stream (public-domain constants, Steele et
  * al., "Fast Splittable Pseudorandom Number Generators") — the engine's
  * only pseudo-randomness source: MinHash coefficients and LSH hyperplane
  * components derive from a fixed seed so nothing varies at runtime. */
final class Rng(seed: Long) {
  private var x = seed
  def nextLong(): Long = {
    x += 0x9e3779b97f4a7c15L
    var z = x
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** Uniform double in [-1, 1]. */
  def nextSignedUnit(): Double = nextLong().toDouble / Long.MaxValue
}
