package graft.api

import graft.functions.VectorFunctions.{cosineDistance, l2norm, l2normalize}
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Eps/σ/k diagnostic mirroring the reference's suggested-eps report
  * (reference tests/output/1760705545_v0_16/suggested_eps.md:3-30 and
  * the magnitude guidance table in tests/test_2_CVE_db.py:44-66).
  *
  * A mis-sized eps is the reference's #1 user footgun: the eps-kNN
  * graph silently comes out (almost) empty, every λ collapses to 0,
  * and search aborts with "The lambdas are zero ..." (reference
  * src/lib.rs:156-159; the −1.0 failure rows in
  * CVE-taumode_cosine_eps.csv:5-6). This report measures the actual
  * nearest-neighbor distance distribution so the caller can pick an
  * eps that yields a connected graph BEFORE paying for a build.
  *
  * All passes are bounded: quantiles run on a seeded sample of at most
  * `sampleSize` rows, so the self-join is O(sample²) work and O(k)
  * rows per node out of the window — independent of N. Nothing is
  * collected except the ≤ 15 aggregate numbers in the report.
  */
final case class EpsReport(
    nItems: Long,
    nFeatures: Int,
    intrinsicDim: Double,
    avgNorm: Double,
    /** p10/p50/p90 of the (sampled) 1st-NN rectified-cosine distance:
      * eps below p10 yields a near-empty graph. */
    nnDist: Map[String, Double],
    /** p10/p50/p90 of the (sampled) k-th-NN distance: eps at p90 gives
      * ~90% of nodes their full k neighbors. */
    knnDist: Map[String, Double],
    /** (log n / n)^(2/(d+2)) — the report's dimension-aware formula
      * (suggested_eps.md:27), for parity; unit-scale data only. */
    theoreticalEps: Double,
    suggestedEps: Double,
    suggestedSigma: Double,
    suggestedK: Int,
    /** Mean per-component magnitude far from ~O(1): the kernel
      * bandwidth saturates or vanishes (test_2_CVE_db.py magnitude
      * table flags avg 0.01 and 50+ for rescaling). */
    needsRescaling: Boolean) {

  def render: String = {
    def q(m: Map[String, Double]): String =
      m.toSeq.sorted.map { case (k, v) => f"$k=$v%.4f" }.mkString(" ")
    f"""# suggested eps (graft)
       |n_items=$nItems n_features=$nFeatures intrinsic_dim=$intrinsicDim%.1f avg_norm=$avgNorm%.4f
       |1st-NN dist: ${q(nnDist)}
       |k-th-NN dist: ${q(knnDist)}
       |suggested: eps=$suggestedEps%.4f sigma=$suggestedSigma%.4f k=$suggestedK (theoretical eps=$theoreticalEps%.4f)
       |needs_rescaling=$needsRescaling""".stripMargin
  }
}

object EpsSuggest {

  /** itemsRaw: (id, vec) — the same frame [[ArrowSpaceBuilder.build]]
    * takes. `k` is the neighbor cap the graph will be built with.
    */
  def report(
      itemsRaw: DataFrame,
      k: Int = 10,
      sampleSize: Int = 2000,
      seed: Long = 42L,
      normalise: Boolean = true): EpsReport = {
    require(k > 0 && sampleSize > 1, "k and sampleSize must be positive")
    val items = itemsRaw.select(
      F.col("id").cast("long").as("id"),
      F.col("vec").cast("array<double>").as("vec"))

    val head = items.agg(
      F.count(F.lit(1)).as("n"),
      F.max(F.size(F.col("vec"))).as("f"),
      F.avg(l2norm(F.col("vec"))).as("avg_norm")).head
    val n = head.getLong(0)
    require(n > 1, "need at least 2 items to suggest eps")
    // max(size(vec)) and avg(norm) aggregate to null when EVERY vec is
    // null — fail with the diagnostic's own message, not an NPE
    require(!head.isNullAt(1) && !head.isNullAt(2),
      "vec column is entirely null — suggestEps needs non-null vectors")
    val nF = head.getInt(1)
    val avgNorm = head.getDouble(2)

    val sampled =
      (if (n > sampleSize)
         items.sample(withReplacement = false, sampleSize.toDouble / n, seed)
       else items)
        .withColumn(
          "vnorm",
          if (normalise) l2normalize(F.col("vec")) else F.col("vec"))
        .select("id", "vnorm")
        // materialize the ≤ sampleSize rows ONCE: the quantile
        // self-join reads it twice and TwoNN's self-join twice more —
        // uncached, each side would re-scan the FULL corpus to redraw
        // the sample (5 O(N) scans for a bounded diagnostic)
        .localCheckpoint()

    // per-node 1st and k-th NN distance over the sample: the same
    // rectified-cosine metric the graph build uses (GRAPH_VARIABLES.md:7)
    val a = sampled.select(F.col("id").as("src"), F.col("vnorm").as("va"))
    val b = sampled.select(F.col("id").as("dst"), F.col("vnorm").as("vb"))
    val w = Window.partitionBy("src").orderBy(F.col("d").asc, F.col("dst").asc)
    val ranked = a.join(b, F.col("src") =!= F.col("dst"))
      .withColumn("d", cosineDistance(F.col("va"), F.col("vb")))
      .withColumn("rn", F.row_number().over(w))
      .where(F.col("rn") === 1 || F.col("rn") === k)
    // exact percentiles on ≤ 2·sampleSize values — a tiny agg
    val qRow = ranked
      .groupBy()
      .agg(
        F.expr("percentile(if(rn = 1, d, null), array(0.1, 0.5, 0.9))").as("nn"),
        F.expr(s"percentile(if(rn = $k, d, null), array(0.1, 0.5, 0.9))").as("knn"))
      .head
    def qmap(i: Int): Map[String, Double] =
      if (qRow.isNullAt(i)) Map.empty
      else {
        val s = qRow.getSeq[Double](i)
        Map("p10" -> s(0), "p50" -> s(1), "p90" -> s(2))
      }
    val nn = qmap(0)
    // a sample smaller than k+1 has no k-th neighbor: fall back to the
    // 1st-NN curve rather than returning an unusable empty suggestion
    val knn = { val m = qmap(1); if (m.nonEmpty) m else nn }

    val id = graft.scale.TwoNN.intrinsicDimension(
      sampled, seed = seed, knownCount = math.min(n, sampleSize.toLong))
    val lnN = math.log(n.toDouble)
    val theoreticalEps = math.pow(lnN / n.toDouble, 2.0 / (id + 2.0))
    // empirical suggestion: the distance at which ~90% of nodes reach
    // their full k neighbors, nudged up so boundary nodes survive the
    // strict d <= eps filter
    val suggestedEps = knn.get("p90").map(d => math.nextUp(d * 1.05)).getOrElse(1.0)
    // s(n) ~ (n / log n)^(1/d) — the report's connectivity-scale
    // formula (suggested_eps.md:29; 29.2 → recommended k=25 on CVE).
    // Clamp in LONG first: at corpus scale with a low intrinsic dim the
    // formula exceeds 2³¹ and a bare .toInt would wrap to garbage
    val suggestedK = math.max(k,
      math.min(64L, math.round(math.pow(n.toDouble / lnN, 1.0 / id))).toInt)
    val avgComponent = avgNorm / math.sqrt(nF.toDouble)
    EpsReport(
      nItems = n, nFeatures = nF, intrinsicDim = id, avgNorm = avgNorm,
      nnDist = nn, knnDist = knn,
      theoreticalEps = theoreticalEps,
      suggestedEps = suggestedEps,
      suggestedSigma = suggestedEps * 0.5, // binding default σ = eps/2
      suggestedK = suggestedK,
      needsRescaling = avgComponent < 0.005 || avgComponent > 20.0)
  }
}
