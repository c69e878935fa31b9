package graft.scale

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Two-NN intrinsic-dimension estimator (Facco et al. 2017) — the
  * estimator the reference crate logs during auto-clustering
  * ("Two-NN intrinsic-dimension estimate", reference
  * tests/output/1760705545_v0_16/suggested_eps.md:7-11).
  *
  * MLE over nearest-neighbor distance ratios: with μᵢ = d₂ᵢ/d₁ᵢ,
  * ID ≈ n / Σ ln μᵢ. Runs on a bounded random sample so the
  * self-join stays driver-independent and O(sample²) regardless of N.
  */
object TwoNN {

  /** items: (id, vnorm: Array[Double]). Returns the ID estimate.
    * Pass `knownCount` when the caller already has the row count to
    * skip the extra full scan. */
  def intrinsicDimension(
      items: DataFrame,
      sampleSize: Int = 1000,
      seed: Long = 42L,
      knownCount: Long = -1L): Double = {
    import graft.functions.VectorFunctions.cosineDistance
    val n = if (knownCount >= 0L) knownCount else items.count()
    val sample =
      (if (n > sampleSize) items.sample(withReplacement = false, sampleSize.toDouble / n, seed)
       else items).select("id", "vnorm")
    val a = sample.select(F.col("id").as("src"), F.col("vnorm").as("va"))
    val b = sample.select(F.col("id").as("dst"), F.col("vnorm").as("vb"))
    val w = Window.partitionBy("src").orderBy(F.col("d").asc, F.col("dst").asc)
    val top2 = a.join(b, F.col("src") =!= F.col("dst"))
      .withColumn("d", cosineDistance(F.col("va"), F.col("vb")))
      .where(F.col("d") > 1e-12) // exclude exact duplicates
      .withColumn("rn", F.row_number().over(w))
      .where(F.col("rn") <= 2)
      .groupBy("src")
      .agg(
        F.min(F.when(F.col("rn") === 1, F.col("d"))).as("d1"),
        F.min(F.when(F.col("rn") === 2, F.col("d"))).as("d2"))
      .where(F.col("d1").isNotNull && F.col("d2").isNotNull && F.col("d1") > 0)
    val agg = top2
      .select(F.log(F.col("d2") / F.col("d1")).as("lnmu"))
      .agg(F.sum("lnmu").as("s"), F.count(F.lit(1)).as("c"))
      .head
    // sum over ZERO pairs is null — read it as 0 so the degenerate
    // fallback below actually fires instead of an NPE preempting it
    val s = if (agg.isNullAt(0)) 0.0 else agg.getDouble(0)
    val c = agg.getLong(1)
    if (s <= 0.0 || c == 0) 1.0 else c.toDouble / s
  }

  /** Auto-K anchor for the clustering stage. The reference's optimal-K
    * search lands on [178,179] for N=313,841 (suggested_eps.md:7-11),
    * which matches round(√N/π) = 178 — reconstructed as that closed
    * form, clamped to [2, 4096].
    */
  def autoK(n: Long): Int =
    math.max(2, math.min(4096, math.round(math.sqrt(n.toDouble) / math.Pi).toInt))

  /** ID-aware auto-K (reference clustering log, suggested_eps.md:7-11:
    * "Computing optimal K … Two-NN … estimated ID: 3 … Testing K in
    * range [178, 179] with step 1"): the Two-NN intrinsic dimension
    * drives the elbow test over the candidate window
    * [autoK(n), autoK(n)+1]. On data filling an `id`-dimensional
    * manifold, the within-cluster cost of K balanced cells decays like
    * K^(−2/id), so K+1 is accepted only when the OBSERVED cost drop
    * beats that featureless-manifold decay — i.e. the extra centroid
    * captured real structure. KMeans runs on a bounded sample, so the
    * search is O(sample) regardless of N.
    *
    * items: (id, vnorm: Array[Double]).
    */
  def chooseK(
      items: DataFrame,
      nItems: Long,
      id: Double,
      seed: Long = 42L,
      sampleSize: Int = 20000): Int = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val k0 = autoK(nItems)
    val k1 = k0 + 1
    val frac = math.min(1.0, sampleSize.toDouble / math.max(1L, nItems))
    val sample =
      (if (frac < 1.0) items.sample(withReplacement = false, frac, seed) else items)
        .withColumn("features", array_to_vector(F.col("vnorm")))
        .cache()
    try {
      def cost(k: Int): Double =
        new KMeans()
          .setK(k).setSeed(seed).setMaxIter(10)
          .setFeaturesCol("features").setPredictionCol("c")
          .fit(sample).summary.trainingCost
      val c0 = cost(k0)
      if (c0 <= 0.0) k0
      else {
        val threshold = math.pow(k1.toDouble / k0.toDouble, -2.0 / math.max(1.0, id))
        if (cost(k1) / c0 < threshold) k1 else k0
      }
    } finally sample.unpersist()
  }
}
