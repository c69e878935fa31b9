package graft

import graft.api.ArrowSpaceBuilder
import graft.core.GraphParams
import org.apache.spark.sql.{functions => F}

/** Port of the reference's only assert-based test
  * (reference: tests/test_0.py) plus structural properties the
  * reference leaves implicit (SURVEY.md §5).
  *
  * Exact-parity note (SURVEY.md §7.4): the τ=1.0 ordering is pure
  * cosine and is asserted exactly. The blended orderings depend on the
  * crate-internal feature-Laplacian construction + seeded
  * dims-reduction that are not vendored in the reference repo; those
  * are pinned here structurally (determinism, result size, score
  * monotonicity, λ non-degeneracy) — see FeatureLaplacian's Scaladoc
  * for the documented reconstruction.
  */
class ArrowSpaceSpec extends SparkSpec {

  val items: Array[Array[Double]] = Array(
    Array(0.82,0.11,0.43,0.28,0.64,0.32,0.55,0.48,0.19,0.73,0.07,0.36,0.58,0.23,0.44,0.31,0.52,0.16,0.61,0.40,0.27,0.49,0.35,0.29),
    Array(0.79,0.12,0.45,0.29,0.61,0.33,0.54,0.47,0.21,0.70,0.08,0.37,0.56,0.22,0.46,0.30,0.51,0.18,0.60,0.39,0.26,0.48,0.36,0.30),
    Array(0.78,0.13,0.46,0.27,0.62,0.34,0.53,0.46,0.22,0.69,0.09,0.35,0.55,0.24,0.45,0.29,0.50,0.17,0.59,0.38,0.28,0.47,0.34,0.31),
    Array(0.81,0.10,0.44,0.26,0.63,0.31,0.56,0.45,0.20,0.71,0.06,0.34,0.57,0.25,0.47,0.33,0.53,0.15,0.62,0.41,0.25,0.50,0.37,0.27),
    Array(0.80,0.12,0.42,0.25,0.60,0.35,0.52,0.49,0.23,0.68,0.10,0.38,0.54,0.21,0.43,0.28,0.49,0.19,0.58,0.37,0.29,0.46,0.33,0.32))

  // reference tests/test_0.py:12-18
  val params: GraphParams =
    GraphParams(eps = 0.05, k = 5, topk = 3, p = 2.0, sigma = Some(0.05))

  lazy val itemsDf = {
    val s = spark
    import s.implicits._
    items.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "vec")
  }

  lazy val (model, edges) = ArrowSpaceBuilder.build(itemsDf, params)

  def query: Array[Double] = items(2).map(_ * 1.05)

  def hits(tau: Double): Seq[(Long, Double)] =
    model.search(query, tau).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("metadata matches the input matrix") {
    assert(model.nItems == 5)
    assert(model.nFeatures == 24)
  }

  test("tau=1.0 is pure cosine: exact ordering [2,1,4] (test_0.py:29-32)") {
    val h = hits(1.0)
    assert(h.size == 3)
    assert(h.map(_._1) == Seq(2L, 1L, 4L))
    // query = items[2] * 1.05 => cos with item 2 is exactly 1
    assert(math.abs(h.head._2 - 1.0) < 1e-12)
  }

  test("tau=0.9 blended: exact ordering [1,2,0] (test_0.py:39-42)") {
    // Scale-sensitivity at work: the query is 1.05x item 2, so pure
    // cosine puts item 2 first, but its raw-Dirichlet lambda differs
    // from item 2's and the blend flips the order - exactly the
    // reference's pinned behavior.
    val h = hits(0.9)
    assert(h.map(_._1) == Seq(1L, 2L, 0L), s"got ${h.map(_._1)}")
  }

  test("blended search returns topk results, deterministically, scores descending") {
    for (tau <- Seq(0.9, 0.6, 0.55)) {
      val h1 = hits(tau)
      val h2 = hits(tau)
      assert(h1.size == 3, s"tau=$tau")
      assert(h1 == h2, s"tau=$tau not deterministic")
      assert(h1.map(_._2) == h1.map(_._2).sorted.reverse, s"tau=$tau not descending")
    }
  }

  test("lambdas are non-degenerate and bounded") {
    val l = model.lambdas.collect().map(_.getDouble(1))
    assert(l.length == 5)
    assert(l.forall(v => v > 0.0 && v < 1.0), l.mkString(","))
    assert(l.distinct.length > 1, "lambdas collapsed to a single value")
  }

  test("lambda_q is nonzero and search_hybrid skips the assert (src/lib.rs:182-219)") {
    assert(model.prepareQueryLambda(query) != 0.0)
    assert(model.searchHybrid(query, 0.62).count() == 3)
  }

  test("zero query vector triggers the reference's lambda-zero error (src/lib.rs:156-159)") {
    val e = intercept[IllegalArgumentException](
      model.search(new Array[Double](24), 0.62))
    assert(e.getMessage.contains("lambdas are zero"))
    // search_hybrid skips the assert (src/lib.rs:182-219) and still runs
    assert(model.searchHybrid(new Array[Double](24), 0.62).count() == 3)
  }

  test("query length validation mirrors src/lib.rs:139-146") {
    val e = intercept[IllegalArgumentException](model.search(Array(1.0, 2.0), 1.0))
    assert(e.getMessage.contains("must match nfeatures"))
  }

  test("graph is symmetric with no self-loops") {
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(es.nonEmpty)
    assert(es.forall { case (s, d, _) => s != d })
    val set = es.map { case (s, d, w) => ((s, d), w) }.toMap
    es.foreach { case (s, d, w) =>
      assert(set.get((d, s)).exists(w2 => math.abs(w2 - w) < 1e-12), s"($s,$d) not symmetric")
    }
  }

  test("scale invariance: normalized topology — scaling all items by 10 keeps orderings (NORMALISATION.md)") {
    val s = spark
    import s.implicits._
    val scaled = items.zipWithIndex.map { case (v, i) => (i.toLong, v.map(_ * 10.0)) }
      .toSeq.toDF("id", "vec")
    val (m2, _) = ArrowSpaceBuilder.build(scaled, params)
    for (tau <- Seq(1.0, 0.6)) {
      val a = hits(tau).map(_._1)
      val b = m2.search(query.map(_ * 10.0), tau).collect().map(_.getLong(0)).toSeq
      assert(a == b, s"tau=$tau scale variance")
    }
  }

  test("batch search matches per-query search results") {
    val s = spark
    import s.implicits._
    val queries = Seq(
      (100L, items(2).map(_ * 1.05)),
      (200L, items(0).map(_ * 0.95))).toDF("query_id", "qvec")
    val batch = model.searchBatch(queries, tau = 0.62, topk = 3)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val single1 = model.search(items(2).map(_ * 1.05), 0.62).collect().map(_.getLong(0)).toSeq
    val single2 = model.search(items(0).map(_ * 0.95), 0.62).collect().map(_.getLong(0)).toSeq
    assert(batch.filter(_._1 == 100L).map(_._2) == single1)
    assert(batch.filter(_._1 == 200L).map(_._2) == single2)
  }

  test("batch search rejects wrong-length qvec on BOTH qlambda branches") {
    val s = spark
    import s.implicits._
    val nf = items(0).length
    // recompute branch: the lamQ UDF checks
    val bad = Seq((1L, Array.fill(nf + 2)(0.1))).toDF("query_id", "qvec")
    val e1 = intercept[Exception](model.searchBatch(bad, 0.62, 3).collect())
    assert(e1.getMessage.contains("must match nfeatures") ||
      Option(e1.getCause).exists(_.getMessage.contains("must match nfeatures")))
    // precomputed-qlambda branch: previously sailed through to the
    // min-length cosine kernel and scored garbage
    val badPre = Seq((1L, Array.fill(nf + 2)(0.1), 0.5))
      .toDF("query_id", "qvec", "qlambda")
    val e2 = intercept[Exception](model.searchBatch(badPre, 0.62, 3).collect())
    assert(e2.getMessage.contains("must match nfeatures") ||
      Option(e2.getCause).exists(_.getMessage.contains("must match nfeatures")))
    // a NULL precomputed qlambda must error too, not rank k null-scored
    // rows NULLS-LAST
    val badNull = Seq((1L, items(1), Option.empty[Double]))
      .toDF("query_id", "qvec", "qlambda")
    val e3 = intercept[Exception](model.searchBatch(badNull, 0.62, 3).collect())
    assert(e3.getMessage.contains("qlambda is null/NaN") ||
      Option(e3.getCause).exists(_.getMessage.contains("qlambda is null/NaN")))
    // and a RIGHT-length precomputed qlambda still works
    val good = Seq((9L, items(1), model.prepareQueryLambda(items(1))))
      .toDF("query_id", "qvec", "qlambda")
    assert(model.searchBatch(good, 0.62, 3).count() == 3L)
  }

  test("fluent Builder facade matches direct builder output") {
    val (m2, _) = graft.api.Builder()
      .withLambdaGraph(eps = 0.05, k = 5, topk = 3, p = 2.0, sigma = Some(0.05))
      .withSeed(42L)
      .withSparsityCheck(false)
      .build(itemsDf)
    val a = hits(0.62).map(_._1)
    val b = m2.search(query, 0.62).collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(math.abs(m2.tau - model.tau) < 1e-12)
  }

  test("save/load round-trips the index and search results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    model.save(dir)
    val loaded = graft.api.ArrowSpaceModel.load(spark, dir)
    assert(loaded.nItems == model.nItems)
    assert(loaded.nFeatures == model.nFeatures)
    assert(math.abs(loaded.tau - model.tau) < 1e-12)
    assert(loaded.featureLaplacian.edges.length == model.featureLaplacian.edges.length)
    val a = hits(0.62)
    val b = loaded.search(query, 0.62).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a.map(_._1) == b.map(_._1))
  }

  test("save/load round-trips the normalise flag (defaults true for old sidecars)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-raw-model").toString
    val (mRaw, _) = ArrowSpaceBuilder.build(
      itemsDf, params.copy(normalise = false))
    mRaw.save(dir)
    val loaded = graft.api.ArrowSpaceModel.load(spark, dir)
    assert(!loaded.params.normalise, "normalise=false was lost on load")
    // a sidecar WITHOUT the field (pre-round-4 layout) reads as true
    val p = new org.apache.hadoop.fs.Path(s"$dir/meta.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val txt = {
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val legacy = txt.replaceAll("\"normalise\":\\d+,\\s*", "")
    val out = fs.create(p, true)
    try out.write(legacy.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    assert(graft.api.ArrowSpaceModel.load(spark, dir).params.normalise)
  }

  test("save/load survives negative-exponent JSON scalars (tau=1e-10)") {
    // tau falls back to 1e-10 when the median energy is 0; the sidecar
    // writes it as 1.0E-10, which the old number regex could not parse.
    val dir = java.nio.file.Files.createTempDirectory("graft-tiny-tau").toString
    val (m2, _) = ArrowSpaceBuilder.build(
      itemsDf, params, graft.spectral.TauMode.Fixed(1e-10))
    m2.save(dir)
    val loaded = graft.api.ArrowSpaceModel.load(spark, dir)
    assert(loaded.tau == 1e-10, s"tau corrupted on reload: ${loaded.tau}")
    assert(loaded.featureLaplacian.edges.length == m2.featureLaplacian.edges.length,
      "lapEdges triples dropped on reload")
    assert(loaded.featureLaplacian.edges.zip(m2.featureLaplacian.edges).forall {
      case (a, b) => a.f == b.f && a.g == b.g && math.abs(a.w - b.w) < 1e-15
    })
  }

  test("searchHybrid reduces to search at alpha=1 and diverges with magnitude spread") {
    // alpha=1 removes the magnitude-penalty term entirely
    val a = hits(0.8)
    val b = model.searchHybrid(query, 0.8, alpha = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, sa), (_, sb)) => assert(math.abs(sa - sb) < 1e-12) }
    // default alpha=0.5 blends exp(-|ln(|q|/|x|)|): with the query
    // scaled 3x, every item's penalty shrinks, so hybrid scores drop
    // below the pure-cosine-blend scores while cosine stays unchanged
    val scaled = query.map(_ * 3.0)
    val hybrid = model.searchHybrid(scaled, 0.8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val plain = model.searchHybrid(scaled, 0.8, alpha = 1.0)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(hybrid.keySet == plain.keySet)
    assert(hybrid.forall { case (id, s) => s < plain(id) },
      "magnitude penalty must lower every blended score for a 3x-scaled query")
  }

  test("energy search returns k results without cosine") {
    val h = model.searchEnergy(query, k = 4)
    assert(h.count() == 4)
  }

  test("searches on README-style 3x3 matrix: cosine scores match (README.md:36-69)") {
    val s = spark
    import s.implicits._
    val m3 = Seq(
      (0L, Array(0.1, 0.2, 0.3)),
      (1L, Array(0.0, 0.5, 0.1)),
      (2L, Array(0.9, 0.1, 0.0))).toDF("id", "vec")
    val p3 = GraphParams(eps = 1.0, k = 6, topk = 3, p = 2.0, sigma = Some(1.0))
    val (mm, _) = ArrowSpaceBuilder.build(m3, p3)
    val res = mm.search(Array(0.05, 0.2, 0.25), 1.0).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // pure-cosine scores from the README example
    val expected = Map(0L -> 0.98974, 1L -> 0.75653, 2L -> 0.22152)
    res.foreach(r => assert(math.abs(r.getDouble(1) - expected(r.getLong(0))) < 1e-4))
  }
}
