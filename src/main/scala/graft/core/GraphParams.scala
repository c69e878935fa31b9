package graft.core

/** Graph-construction parameters for the λτ-graph.
  *
  * Mirrors the reference binding's parameter surface
  * (reference: src/helpers.rs:48-77): `eps` is the rectified-cosine
  * distance cutoff, `k` the per-node neighbor cap, `topk` the default
  * search result size, `p` the weight-kernel sharpness, and `sigma`
  * the kernel scale. When `sigma` is absent it defaults to `eps * 0.5`
  * (reference: src/helpers.rs:69-72 — the binding's default wins over
  * the crate-doc default of `eps`).
  */
final case class GraphParams(
    eps: Double,
    k: Int,
    topk: Int,
    p: Double = 2.0,
    sigma: Option[Double] = None,
    normalise: Boolean = true,
    seed: Long = 42L
) {
  require(eps > 0.0, s"eps must be positive, got $eps")
  require(k > 0, s"k must be positive, got $k")
  require(topk > 0, s"topk must be positive, got $topk")
  require(p > 0.0, s"p must be positive, got $p")

  /** Effective kernel scale: σ := eps·0.5 when unspecified. */
  def sigmaValue: Double = sigma.getOrElse(eps * 0.5)
}

/** Parameters for the energy-only pipeline (reference:
  * src/energyparams.rs:6-46, defaults per src/lib.rs:309-324).
  */
final case class EnergyParams(
    opticalTokens: Int = 40,
    trimQuantile: Double = 0.1,
    eta: Double = 0.1,
    steps: Int = 4,
    splitQuantile: Double = 0.9,
    neighborK: Int = 12,
    splitTau: Double = 0.15,
    wLambda: Double = 1.0,
    wDisp: Double = 0.5,
    wDirichlet: Double = 0.25,
    candidateM: Int = 32
)
