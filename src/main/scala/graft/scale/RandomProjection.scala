package graft.scale

import org.apache.spark.sql.{DataFrame, functions => F}

/** Seeded Gaussian random projection (JL) — the reconstruction of the
  * reference's `with_dims_reduction` stage (reference src/lib.rs:283,
  * 358-359; the crate's `rand_distr` dependency indicates Gaussian
  * draws, SURVEY.md §2.2 S5). The d×F matrix is generated
  * deterministically from the seed on the driver and broadcast; the
  * projection itself is a mapPartitions pass, embarrassingly parallel.
  *
  * Used only for graph-construction distances — the feature Laplacian
  * and query scoring stay in the original F-dimensional space, so
  * `nfeatures` is unchanged (the reduced space is an internal
  * candidate-generation detail, as in the reference where queries
  * still carry full F).
  */
object RandomProjection {

  /** Johnson-Lindenstrauss target dimension for n points. */
  def jlDim(n: Long, eps: Double = 0.35): Int =
    math.max(16, math.min(256, (8.0 * math.log(math.max(2L, n).toDouble) / (eps * eps)).toInt))

  /** Deterministic d×F Gaussian matrix scaled by 1/√d. */
  def matrix(fromDim: Int, toDim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    val scale = 1.0 / math.sqrt(toDim.toDouble)
    Array.fill(toDim)(Array.fill(fromDim)(rng.nextGaussian() * scale))
  }

  /** Project `inCol` (array<double>, length fromDim) to `outCol`
    * (length toDim). Other columns pass through.
    */
  def project(
      df: DataFrame,
      inCol: String,
      outCol: String,
      fromDim: Int,
      toDim: Int,
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(matrix(fromDim, toDim, seed))
    val proj = F.udf { (v: Seq[Double]) =>
      val m = bc.value
      val out = new Array[Double](m.length)
      var r = 0
      while (r < m.length) {
        val row = m(r)
        var acc = 0.0
        var i = 0
        val n = math.min(row.length, v.length)
        while (i < n) { acc += row(i) * v(i); i += 1 }
        out(r) = acc
        r += 1
      }
      out
    }
    df.withColumn(outCol, proj(F.col(inCol)))
  }
}
