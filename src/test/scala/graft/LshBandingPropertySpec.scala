package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property test of q37's 6-band × 6-bit sign-LSH blocking: the band
  * catch-rate on seeded vector pairs of KNOWN cosine must track the
  * documented amplification curve 1 − (1 − p⁶)⁶ with p = 1 − θ/π
  * (Goemans–Williamson hyperplane rounding; Similarity.scala's scaladoc
  * quotes the same numbers: ~9% of random pairs, ~95% at cos 0.9).
  *
  * Pairs are constructed exactly at each target cosine: v = c·u +
  * √(1−c²)·w with u, w orthonormal from a seeded gaussian — so the
  * empirical rate is a clean Bernoulli sample of the band family's
  * true catch probability at that cosine. The hyperplane family is the
  * PRODUCTION one (Similarity.signMatrix's deterministic ±1 md5
  * pattern), so this also guards the md5-sign derivation: a regression
  * that biased the planes (or re-widened the bands — the round-5 q37
  * flaw was 4×2-bit banding admitting ~68% of random pairs) moves the
  * curve and fails the tolerance. Driver-side only: the property is
  * about the banding math, not the join plan (the plan is gated by
  * CORRECTNESS and PlanShapeSpec).
  */
class LshBandingPropertySpec extends AnyFunSuite {

  private val nBands = 6
  private val bandBits = 6
  private val dims = 64
  private val signs =
    graft.operators.Similarity.signMatrix(nBands * bandBits, dims)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    v.map(_ / n)
  }

  /** some band agrees on all bits — the q37 candidate condition */
  private def caught(u: Array[Double], v: Array[Double]): Boolean =
    (0 until nBands).exists { b =>
      (0 until bandBits).forall { j =>
        val s = signs(b * bandBits + j)
        (dot(s, u) > 0.0) == (dot(s, v) > 0.0)
      }
    }

  private def theoretical(c: Double): Double = {
    val p = 1.0 - math.acos(c) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, bandBits), nBands)
  }

  test("band catch-rate tracks 1-(1-p^6)^6 at five cosine levels") {
    val nPairs = 2000
    val levels = Seq(0.95, 0.9, 0.8, 0.5, 0.0)
    val rates = levels.map { c =>
      val rng = new scala.util.Random(0xbead5eedL + (c * 100).toLong)
      var hits = 0
      for (_ <- 0 until nPairs) {
        val u = normalize(Array.fill(dims)(rng.nextGaussian()))
        // gram-schmidt an orthogonal direction, then mix at exact cosine
        val g = Array.fill(dims)(rng.nextGaussian())
        val proj = dot(g, u)
        val w = normalize(Array.tabulate(dims)(i => g(i) - proj * u(i)))
        val s = math.sqrt(1.0 - c * c)
        val v = Array.tabulate(dims)(i => c * u(i) + s * w(i))
        if (caught(u, v)) hits += 1
      }
      val rate = hits.toDouble / nPairs
      info(f"cos=$c%.2f: empirical=$rate%.3f theoretical=${theoretical(c)}%.3f")
      c -> rate
    }.toMap
    // binomial sd at n=2000 is <= 0.011; the fixed (non-random) ±1
    // plane family deviates from the gaussian-hyperplane ideal by a
    // couple of points at most — 0.05 absolute bounds both
    levels.foreach { c =>
      assert(math.abs(rates(c) - theoretical(c)) < 0.05,
        f"cos=$c: got ${rates(c)}%.3f want ${theoretical(c)}%.3f")
    }
    // the scaladoc's headline claims, directly: random pairs ~9%
    // background (output-bound candidates), near-dups ~95% caught
    assert(rates(0.0) < 0.15, "background candidate rate must stay ~9%")
    assert(rates(0.9) > 0.90, "cos-0.9 near-dups must be caught ~95%")
    // monotone amplification
    assert(rates(0.95) >= rates(0.9) && rates(0.9) >= rates(0.8)
      && rates(0.8) >= rates(0.5) && rates(0.5) >= rates(0.0))
  }
}
