package graft.spectral

import org.apache.spark.sql.DataFrame

/** Policy for selecting the τ constant used both as the bounding scale
  * in E′ = E/(E+τ) and the mixing weight in S = τE′+(1−τ)G
  * (reference: TAUMODE.md:8-19; observed `synthesis=Median` in crate
  * debug logs — SURVEY.md §2.2 S10).
  */
sealed trait TauMode {
  /** Resolve τ from the distribution of raw Rayleigh energies. */
  def resolve(eRaw: DataFrame, col: String): Double
}

object TauMode {
  /** Exact median of the raw energies (relativeError=0 makes
    * approxQuantile exact; it runs distributed, no driver collect). */
  case object Median extends TauMode {
    def resolve(eRaw: DataFrame, col: String): Double = {
      val q = eRaw.stat.approxQuantile(col, Array(0.5), 0.0)
      positive(q.headOption.getOrElse(0.0))
    }
  }

  case object Mean extends TauMode {
    def resolve(eRaw: DataFrame, col: String): Double = {
      import org.apache.spark.sql.functions.avg
      positive(eRaw.agg(avg(col)).head.getDouble(0))
    }
  }

  final case class Fixed(tau: Double) extends TauMode {
    def resolve(eRaw: DataFrame, col: String): Double = positive(tau)
  }

  /** τ must stay strictly positive for E/(E+τ) to be defined. */
  private def positive(t: Double): Double = if (t > 0.0) t else 1e-10
}
