package graft.spectral

import graft.core.GraphParams
import org.apache.spark.sql.{DataFrame, Row, functions => F}

/** Builds the F×F feature-space Laplacian from the item graph's
  * "signals" (reference: `GraphFactory::build_spectral_laplacian`,
  * GRAPH_VARIABLES.md:17,44; TAUMODE.md:12).
  *
  * The crate's exact construction is not vendored in the reference
  * repo (SURVEY.md §7.4 risk register); this is a documented
  * reconstruction with the same inputs and shape:
  *
  *  1. Distributed pass: co-energy matrix
  *     M = Σ_{(i,j)∈E, i<j} w_ij (x_i − x_j)(x_i − x_j)ᵀ  ∈ R^{F×F}
  *     — i.e. M = XᵀL_item X, the Dirichlet co-energy of every feature
  *     pair over the item graph. Computed with a per-partition dense
  *     accumulator + treeReduce; only O(F²) crosses the network per
  *     partition regardless of N.
  *  2. Driver-side (F ≤ a few thousand): affinity
  *     A_fg = M_fg / √(M_ff·M_gg), distance d = 1 − max(0, A), per-row
  *     kNN cap (k = min(params.k, F−1), no eps cutoff so the feature
  *     graph stays connected), kernel weights w = 1/(1+(d/σ)^p),
  *     symmetrize, L = D − W kept as an edge list.
  */
object FeatureLaplacian {

  /** items: (id, vnorm: Array[Double]); edges: symmetric (src, dst, weight). */
  def build(items: DataFrame, edges: DataFrame, params: GraphParams, nFeatures: Int): LocalLaplacian = {
    val coEnergy = coEnergyMatrix(items, edges, nFeatures)
    fromCoEnergy(coEnergy, params, nFeatures)
  }

  /** Distributed Σ w_ij (x_i−x_j)(x_i−x_j)ᵀ over undirected edges.
    * Returns the dense upper triangle as a flat row-major F×F array.
    */
  def coEnergyMatrix(items: DataFrame, edges: DataFrame, nFeatures: Int): Array[Double] = {
    val spark = items.sparkSession
    import spark.implicits._
    val undirected = edges.where(F.col("src") < F.col("dst"))
    val vecs = items.select(F.col("id"), F.col("vnorm"))
    val joined = undirected
      .join(vecs.withColumnRenamed("id", "src").withColumnRenamed("vnorm", "va"), "src")
      .join(vecs.withColumnRenamed("id", "dst").withColumnRenamed("vnorm", "vb"), "dst")
      .select($"weight".as[Double], $"va".as[Array[Double]], $"vb".as[Array[Double]])

    // treeAggregate (not treeReduce): the zero value keeps this total
    // on an empty edge set — AQE can coalesce an empty join to zero
    // partitions, where treeReduce throws "empty collection".
    val merge = (a: Array[Double], b: Array[Double]) => {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    joined.rdd.treeAggregate(new Array[Double](nFeatures * nFeatures))(
      seqOp = { (acc, row) =>
        val (w, va, vb) = row
        val diff = new Array[Double](nFeatures)
        var f = 0
        while (f < nFeatures) { diff(f) = va(f) - vb(f); f += 1 }
        f = 0
        while (f < nFeatures) {
          val df = diff(f) * w
          if (df != 0.0) {
            var g = f
            val base = f * nFeatures
            while (g < nFeatures) { acc(base + g) += df * diff(g); g += 1 }
          }
          f += 1
        }
        acc
      },
      combOp = merge
    )
  }

  /** Driver-side feature-graph assembly from the co-energy matrix. */
  def fromCoEnergy(m: Array[Double], params: GraphParams, nF: Int): LocalLaplacian = {
    @inline def at(f: Int, g: Int): Double =
      if (f <= g) m(f * nF + g) else m(g * nF + f)
    val k = math.min(params.k, nF - 1)
    val sigma = params.sigmaValue
    // distance d(f,g) = 1 − max(0, A_fg); undefined affinities (zero
    // self-energy) get distance 1 (no edge preference).
    def dist(f: Int, g: Int): Double = {
      val den = at(f, f) * at(g, g)
      if (den <= 0.0) 1.0
      else 1.0 - math.max(0.0, at(f, g) / math.sqrt(den))
    }
    // per-feature kNN (smallest distance, deterministic tie-break on index)
    val selected = new java.util.HashSet[Long]()
    var f = 0
    while (f < nF) {
      val cand = new Array[(Double, Int)](nF - 1)
      var g = 0; var c = 0
      while (g < nF) {
        if (g != f) { cand(c) = (dist(f, g), g); c += 1 }
        g += 1
      }
      java.util.Arrays.sort(cand, Ordering.Tuple2[Double, Int])
      var t = 0
      while (t < math.min(k, cand.length)) {
        val g2 = cand(t)._2
        val key = if (f < g2) f.toLong * nF + g2 else g2.toLong * nF + f
        selected.add(key)
        t += 1
      }
      f += 1
    }
    val edges = scala.collection.mutable.ArrayBuffer.empty[LapEdge]
    val it = selected.iterator()
    while (it.hasNext) {
      val key = it.next()
      val a = (key / nF).toInt
      val b = (key % nF).toInt
      val d = dist(a, b)
      val w = 1.0 / (1.0 + math.pow(d / sigma, params.p))
      if (w > 0.0) edges += LapEdge(a, b, w)
    }
    LocalLaplacian(nF, edges.sortBy(e => (e.f, e.g)).toArray)
  }
}
