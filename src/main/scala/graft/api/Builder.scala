package graft.api

import graft.core.{EnergyParams, GraphParams}
import graft.spectral.TauMode
import org.apache.spark.sql.DataFrame

/** Fluent builder mirroring the reference's `ArrowSpaceBuilder`
  * call shape (reference src/lib.rs:279-287: `with_lambda_graph(eps,
  * k, topk, p, sigma)` + `with_dims_reduction(flag, eps)` +
  * `with_seed(seed)` + `with_sparsity_check(flag)` then `build`) so a
  * reference user's calling convention maps one-to-one. The fluent
  * surface is sugar over [[ArrowSpaceBuilder.build]] /
  * [[EnergyBuilder.buildEnergy]].
  *
  * {{{
  * val (space, laplacian) = Builder()
  *   .withLambdaGraph(eps = 1.0, k = 10, topk = 10, p = 2.0, sigma = None)
  *   .withSeed(42)
  *   .build(itemsDf)
  * }}}
  */
final case class Builder(
    eps: Double = 1.0,
    k: Int = 10,
    topk: Int = 10,
    p: Double = 2.0,
    sigma: Option[Double] = None,
    seed: Long = 42L,
    dimsReduction: Boolean = true,
    dimsReductionEps: Option[Double] = None,
    sparsityCheck: Boolean = false,
    tauMode: TauMode = TauMode.Median,
    energy: EnergyParams = EnergyParams()) {

  /** eps-kNN λ-graph parameters (reference with_lambda_graph). */
  def withLambdaGraph(
      eps: Double, k: Int, topk: Int,
      p: Double = 2.0, sigma: Option[Double] = None): Builder =
    copy(eps = eps, k = k, topk = topk, p = p, sigma = sigma)

  /** reference with_dims_reduction(flag, eps). */
  def withDimsReduction(enabled: Boolean, eps: Option[Double] = None): Builder =
    copy(dimsReduction = enabled, dimsReductionEps = eps)

  def withSeed(seed: Long): Builder = copy(seed = seed)

  /** reference with_sparsity_check (the binding passes false). */
  def withSparsityCheck(enabled: Boolean): Builder = copy(sparsityCheck = enabled)

  def withTauMode(mode: TauMode): Builder = copy(tauMode = mode)

  def withEnergyParams(e: EnergyParams): Builder = copy(energy = e)

  private def graphParams: GraphParams =
    GraphParams(eps = eps, k = k, topk = topk, p = p, sigma = sigma, seed = seed)

  /** Standard build (O1): stages S1-S10. */
  def build(items: DataFrame): (ArrowSpaceModel, DataFrame) = {
    val opts = ArrowSpaceBuilder.BuildOptions(
      // the builder's eps argument (reference with_dims_reduction's
      // second parameter) controls the JL distortion bound
      jlEps = dimsReductionEps.getOrElse(0.35),
      projectionMinF = if (dimsReduction) 96 else Int.MaxValue)
    ArrowSpaceBuilder.build(items, graphParams, tauMode, opts)
  }

  /** Energy-only build (O2): stages E1-E6. */
  def buildEnergy(items: DataFrame): (ArrowSpaceModel, DataFrame) =
    EnergyBuilder.buildEnergy(items, energy, graphParams, tauMode)
}
