package graft

import graft.graph.KnnGraph
import graft.core.GraphParams
import graft.scale.{RandomProjection, TwoNN}
import org.apache.spark.sql.{functions => F}

/** Scale-path stages: Two-NN intrinsic dimension (S4), auto-K,
  * random projection (S5), cluster-blocked kNN candidates.
  */
class ScaleSpec extends SparkSpec {

  test("autoK matches the reference's observed optimal-K window (N=313841 -> 178)") {
    assert(TwoNN.autoK(313841L) == 178)
    assert(TwoNN.autoK(10L) == 2 || TwoNN.autoK(10L) == 1 + 0) // clamped low end
    assert(TwoNN.autoK(100000000L) <= 4096)
  }

  test("Two-NN estimates a low intrinsic dimension for planar data in 16-D") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    // points on a 2-D plane embedded in 16-D (plus offset so cosine
    // distance is informative)
    val df = (0 until 400).map { i =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian()
      val v = Array.tabulate(16)(f => 3.0 + a * math.sin(f * 0.7) + b * math.cos(f * 1.3))
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }.toDF("id", "vnorm")
    val id = TwoNN.intrinsicDimension(df, sampleSize = 400, seed = 1L)
    assert(id > 0.5 && id < 6.0, s"intrinsic dimension $id not in (0.5, 6)")
  }

  test("ID-aware chooseK accepts K+1 only when structure supports it (ID->K path)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    // anchor k0 = autoK(40) = 2; blob centers are well separated so
    // each extra TRUE cluster produces a cost drop far beyond the
    // featureless K^(-2/id) decay.
    def blobs(centers: Seq[Array[Double]], per: Int) = {
      val rows = for {
        (c, ci) <- centers.zipWithIndex
        j <- 0 until per
      } yield {
        val v = c.map(_ + 0.05 * rng.nextGaussian())
        val n = math.sqrt(v.map(x => x * x).sum)
        ((ci * per + j).toLong, v.map(_ / n))
      }
      rows.toDF("id", "vnorm")
    }
    val c1 = Array(5.0, 0.0, 0.0, 0.0)
    val c2 = Array(0.0, 5.0, 0.0, 0.0)
    val c3 = Array(0.0, 0.0, 5.0, 0.0)
    assert(TwoNN.autoK(40L) == 2)
    // 3 true blobs, anchor 2 -> the elbow must take K=3
    val k3 = TwoNN.chooseK(blobs(Seq(c1, c2, c3), 14), 40L, id = 3.0, seed = 1L)
    assert(k3 == 3, s"expected 3 on 3-blob data, got $k3")
    // 2 true blobs -> no structural gain from a 3rd centroid
    val k2 = TwoNN.chooseK(blobs(Seq(c1, c2), 20), 40L, id = 3.0, seed = 1L)
    assert(k2 == 2, s"expected 2 on 2-blob data, got $k2")
  }

  test("GraphParams.normalise=false: cosine graph and lambdas are scale-invariant") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    val df = (0 until 30).map { i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian() + 1.0))
    }.toDF("id", "vec")
    val pN = GraphParams(eps = 1.0, k = 5, topk = 3, normalise = true)
    val pR = GraphParams(eps = 1.0, k = 5, topk = 3, normalise = false)
    val (mN, eN) = graft.api.ArrowSpaceBuilder.build(df, pN)
    val (mR, eR) = graft.api.ArrowSpaceBuilder.build(df, pR)
    def edgeSet(e: org.apache.spark.sql.DataFrame) =
      e.select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(eN) == edgeSet(eR),
      "raw-vector graph differs from normalized under the cosine metric")
    val lamN = mN.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val lamR = mR.lambdas.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(lamN.keys == lamR.keys &&
      lamN.forall { case (k, v) => math.abs(lamR(k) - v) < 1e-12 })
  }

  test("random projection approximately preserves cosine ordering") {
    val rng = new scala.util.Random(3)
    // clustered vectors so pairwise cosines span a real range (random
    // high-dim vectors are all near-orthogonal — nothing to preserve)
    val vecs = Array.tabulate(30) { i =>
      val base = Array.tabulate(128)(f => math.sin((i % 5) * 1.3 + f * 0.21))
      base.map(_ + rng.nextGaussian() * 0.3)
    }
    val s = spark
    import s.implicits._
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "vnorm")
    val proj = RandomProjection.project(df, "vnorm", "vproj", 128, 64, 42L)
      .select("id", "vproj").collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) =
      graft.functions.VectorKernels.cosine(a, b)
    val origs = for (i <- 0 until 30; j <- i + 1 until 30)
      yield cos(vecs(i), vecs(j))
    val projs = for (i <- 0 until 30; j <- i + 1 until 30)
      yield cos(proj(i.toLong), proj(j.toLong))
    // Pearson correlation of pairwise cosines before/after projection
    val n = origs.length
    val (mo, mp) = (origs.sum / n, projs.sum / n)
    val cov = origs.zip(projs).map { case (a, b) => (a - mo) * (b - mp) }.sum
    val so = math.sqrt(origs.map(a => (a - mo) * (a - mo)).sum)
    val sp = math.sqrt(projs.map(b => (b - mp) * (b - mp)).sum)
    val corr = cov / (so * sp)
    assert(corr > 0.7, s"projection correlation $corr too low")
  }

  test("large-N build path (sample + projection + cluster blocking) end-to-end") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    val df = (0 until 800).map { i =>
      val base = Array.tabulate(128)(f => math.sin((i % 5) * 1.3 + f * 0.21) + 2.0)
      (i.toLong, base.map(_ + rng.nextGaussian() * 0.1))
    }.toDF("id", "vec")
    val params = GraphParams(eps = 1.0, k = 6, topk = 5)
    // force the large-N stages on a small input
    val opts = graft.api.ArrowSpaceBuilder.BuildOptions(
      sampleThreshold = 100L, sampleRate = 0.6, projectionMinF = 64)
    val (m, edges) = graft.api.ArrowSpaceBuilder.build(
      df, params, graft.spectral.TauMode.Median, opts)
    assert(m.nItems == 800)
    assert(edges.count() > 0)
    val q = df.where(F.col("id") === 3).select("vec").head.getSeq[Double](0).toArray
    val hits = m.search(q, 0.62).collect()
    assert(hits.length == 5)
    assert(hits.map(_.getDouble(1)).toSeq == hits.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("cluster-blocked kNN recovers most brute-force edges") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    val df = (0 until 500).map { i =>
      val v = Array.tabulate(16)(f => math.sin((i % 7) * 1.1 + f * 0.37) + rng.nextGaussian() * 0.2 + 2.0)
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n))
    }.toDF("id", "vnorm")
    val params = GraphParams(eps = 0.05, k = 5, topk = 3)
    val brute = KnnGraph.epsKnnEdges(df, params, 500, KnnGraph.Strategy.BruteForce)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = KnnGraph.epsKnnEdges(df, params, 500, KnnGraph.Strategy.ClusterBlocked)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = blocked.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.7, s"blocked recall $recall vs brute (${brute.size} edges)")
  }
}
