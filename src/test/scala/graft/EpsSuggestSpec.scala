package graft

import graft.api.{ArrowSpaceBuilder, EpsSuggest}
import graft.core.GraphParams

class EpsSuggestSpec extends SparkSpec {

  /** 6 well-separated modes: within a mode, rectified-cosine distances
    * are small; across modes, large — a regime where eps actually
    * needs choosing. */
  lazy val clustered = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(5)
    (0 until 300).map { i =>
      val base = Array.tabulate(24)(f => math.cos((i % 6) * 1.1 + f * 0.7))
      (i.toLong, base.map(_ + rng.nextGaussian() * 0.05))
    }.toDF("id", "vec")
  }

  test("suggested eps yields a NON-empty graph; below-p10 eps a near-empty one") {
    val rep = EpsSuggest.report(clustered, k = 8)
    assert(rep.nItems == 300 && rep.nFeatures == 24)
    // quantile sanity: 1st-NN <= k-th-NN at every percentile
    for (p <- Seq("p10", "p50", "p90"))
      assert(rep.nnDist(p) <= rep.knnDist(p) + 1e-12, s"$p ordering")
    assert(rep.suggestedEps > rep.knnDist("p90") - 1e-12)
    assert(rep.suggestedSigma == rep.suggestedEps * 0.5)

    // THE contract the diagnostic exists for: building at the
    // suggested eps produces a real graph...
    val (_, edges) = ArrowSpaceBuilder.build(
      clustered, GraphParams(eps = rep.suggestedEps, k = 8, topk = 5))
    val nEdges = edges.count()
    assert(nEdges > 300, s"suggested eps must connect the graph, got $nEdges edges")

    // ...while an eps below the 1st-NN p10 is the empty-graph footgun
    val tiny = math.max(rep.nnDist("p10") / 10.0, 1e-9)
    val (_, few) = ArrowSpaceBuilder.build(
      clustered, GraphParams(eps = tiny, k = 8, topk = 5))
    assert(few.count() < nEdges / 10,
      "an eps below the measured 1st-NN distances should yield a near-empty graph")
  }

  test("report is deterministic and renders the reference-report fields") {
    val a = EpsSuggest.report(clustered, k = 8)
    val b = EpsSuggest.report(clustered, k = 8)
    assert(a == b, "same data + seed must give an identical report")
    val txt = a.render
    for (field <- Seq("n_items=300", "suggested:", "1st-NN", "k-th-NN", "needs_rescaling"))
      assert(txt.contains(field), s"render must carry '$field':\n$txt")
    assert(!a.needsRescaling, "unit-scale synthetic data must not flag rescaling")
  }

  test("degenerate inputs: sample smaller than k falls back to the 1st-NN curve") {
    val s = spark
    import s.implicits._
    val tiny = (0 until 5).map(i =>
      (i.toLong, Array.tabulate(8)(f => math.sin(i + f)))).toDF("id", "vec")
    // k=10 > 4 available neighbors: no k-th-NN exists anywhere, the
    // report must fall back to the 1st-NN quantiles, not suggest from
    // an empty map
    val rep = EpsSuggest.report(tiny, k = 10)
    assert(rep.knnDist == rep.nnDist)
    assert(rep.suggestedEps > 0.0 && rep.suggestedEps.isFinite)
    // 2 items: the smallest legal input still yields a usable eps
    val two = EpsSuggest.report(tiny.limit(2), k = 10)
    assert(two.suggestedEps > 0.0)
    // 1 item is a clear error, not a NaN report
    intercept[IllegalArgumentException](EpsSuggest.report(tiny.limit(1), k = 3))
  }

  test("search's lambda-zero error points at the diagnostic") {
    val s = spark
    import s.implicits._
    // all-zero vectors: every lambda is 0 and search must abort with
    // the reference message plus the suggestEps pointer
    val zeros = (0 until 20).map(i => (i.toLong, Array.fill(8)(0.0))).toDF("id", "vec")
    val (m, _) = ArrowSpaceBuilder.build(zeros, GraphParams(eps = 1.0, k = 4, topk = 3))
    val e = intercept[IllegalArgumentException](m.search(Array.fill(8)(0.0), tau = 0.6))
    assert(e.getMessage.contains("The lambdas are zero"))
    assert(e.getMessage.contains("suggestEps"))
  }
}
