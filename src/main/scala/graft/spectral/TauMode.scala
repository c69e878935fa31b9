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
  /** Exact median of the raw energies — the element at rank ceil(n/2),
    * the same one approxQuantile with relativeError=0 returns, WITHOUT
    * its O(N) quantile summaries (epsilon=0 forbids compressing
    * samples, so the eps-0 path materializes every value on the
    * driver — an OOM at the corpus sizes the sampling path exists
    * for). Small inputs (≤ 1M values, ≤ 8 MB) take one collect+sort;
    * at scale a distributed order-statistic selection (sort shuffle +
    * rank filter) sends one double to the driver.
    */
  case object Median extends TauMode {
    def resolve(eRaw: DataFrame, col: String): Double = {
      import org.apache.spark.sql.{functions => F}
      val spark = eRaw.sparkSession
      import spark.implicits._
      val vals = eRaw.select(F.col(col).cast("double")).as[Double].rdd
      val n = vals.count()
      if (n == 0L) positive(0.0)
      else {
        // approxQuantile(q, eps=0) selects the smallest sample whose
        // rank >= ceil(q*n); both paths replicate that rank exactly
        // (asserted equal in TauModeSpec on odd/even inputs)
        val target = math.ceil(0.5 * n).toLong - 1L // 0-based
        if (n <= 1000000L) {
          // driver-small: one collect (≤ 8 MB of doubles) beats the
          // 4-job distributed selection — same element either way
          val sorted = vals.collect().sorted
          positive(sorted(target.toInt))
        } else {
          val kth = vals
            .sortBy(identity)
            .zipWithIndex()
            .filter { case (_, i) => i == target }
            .map(_._1)
            .first()
          positive(kth)
        }
      }
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
