package graft

import graft.spectral.TauMode

/** The distributed order-statistic median must select EXACTLY the
  * element approxQuantile(col, 0.5, relativeError=0) selects — every
  * stored λ and the oracle's replayed τ depend on that rank convention
  * (smallest value whose rank >= ceil(n/2)).
  */
class TauModeSpec extends SparkSpec {

  test("Median matches approxQuantile(0.5, eps=0) on odd/even/duplicate inputs") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    val cases = Seq(
      Seq(3.0),
      Seq(2.0, 1.0),
      Seq(5.0, 1.0, 3.0),
      Seq(4.0, 4.0, 1.0, 4.0),
      Seq.fill(101)(rng.nextDouble() * 10),
      Seq.fill(100)(rng.nextDouble() * 10),
      Seq.fill(64)(2.5) // all duplicates
    )
    cases.foreach { vals =>
      val df = vals.toDF("e")
      val viaQuantile = df.stat.approxQuantile("e", Array(0.5), 0.0).head
      val viaSelection = TauMode.Median.resolve(df, "e")
      assert(viaSelection == viaQuantile,
        s"n=${vals.length}: selection $viaSelection != quantile $viaQuantile")
    }
  }

  test("Median of an empty frame falls back to the positive floor") {
    val s = spark
    import s.implicits._
    val df = Seq.empty[Double].toDF("e")
    assert(TauMode.Median.resolve(df, "e") == 1e-10)
  }
}
