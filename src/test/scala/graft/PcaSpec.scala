package graft

import graft.scale.Pca
import org.apache.spark.sql.{functions => F}

class PcaSpec extends SparkSpec {

  /** Seeded anisotropic cloud: strong axis u1 (sd 3), weak axis u2
    * (sd 1), faint isotropic noise, shifted off the origin so the
    * centering path is actually exercised.
    */
  private def cloud(n: Int, nF: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(seed)
    val u1 = Array.tabulate(nF)(i => if (i == 0) 0.6 else if (i == 1) 0.8 else 0.0)
    val u2 = Array.tabulate(nF)(i => if (i == 0) -0.8 else if (i == 1) 0.6 else 0.0)
    (0 until n).map { i =>
      val a = rng.nextGaussian() * 3.0
      val b = rng.nextGaussian() * 1.0
      val v = Array.tabulate(nF)(f =>
        5.0 + a * u1(f) + b * u2(f) + rng.nextGaussian() * 0.01)
      (i.toLong, v)
    }
  }

  test("recovers the known dominant direction of a planar cloud") {
    val s = spark
    import s.implicits._
    val df = cloud(400, 6, seed = 11).toDF("id", "vec")
    val m = Pca.fit(df, "vec", nFeatures = 6, k = 2, iters = 80)
    val v1 = m.components(0)
    // sign-free alignment with (0.6, 0.8, 0, ...)
    val align = math.abs(v1(0) * 0.6 + v1(1) * 0.8)
    assert(align > 0.999, s"dominant component misaligned: ${v1.toSeq}")
    assert(m.eigenvalues(0) > 7.0 && m.eigenvalues(0) < 11.0,
      s"eigenvalue should be near 9 (sd 3 axis): ${m.eigenvalues.toSeq}")
    assert(m.eigenvalues(1) > 0.7 && m.eigenvalues(1) < 1.4,
      s"second eigenvalue should be near 1: ${m.eigenvalues.toSeq}")
  }

  test("components are unit-norm, mutually orthogonal, eigenvalues descending") {
    val s = spark
    import s.implicits._
    val df = cloud(300, 8, seed = 23).toDF("id", "vec")
    val m = Pca.fit(df, "vec", nFeatures = 8, k = 3, iters = 80)
    for (c <- m.components)
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    for (i <- 0 until 3; j <- (i + 1) until 3) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d) < 1e-6, s"components $i,$j not orthogonal: $d")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-9),
      s"eigenvalues not descending: ${m.eigenvalues.toSeq}")
  }

  test("projection variance matches the eigenvalue; projections are centered") {
    val s = spark
    import s.implicits._
    val df = cloud(500, 6, seed = 37).toDF("id", "vec")
    val m = Pca.fit(df, "vec", nFeatures = 6, k = 2, iters = 80)
    val p = Pca.project(df, m, "vec")
      .agg(
        F.avg("pc1").as("m1"),
        (F.avg(F.col("pc1") * F.col("pc1")) -
          F.avg("pc1") * F.avg("pc1")).as("v1"),
        (F.avg(F.col("pc2") * F.col("pc2")) -
          F.avg("pc2") * F.avg("pc2")).as("v2"))
      .head
    assert(math.abs(p.getDouble(0)) < 1e-9, s"pc1 not centered: ${p.getDouble(0)}")
    assert(math.abs(p.getDouble(1) - m.eigenvalues(0)) < 1e-6 * math.max(1.0, m.eigenvalues(0)),
      s"var(pc1)=${p.getDouble(1)} vs eig=${m.eigenvalues(0)}")
    assert(math.abs(p.getDouble(2) - m.eigenvalues(1)) < 1e-4 * math.max(1.0, m.eigenvalues(1)),
      s"var(pc2)=${p.getDouble(2)} vs eig=${m.eigenvalues(1)}")
  }

  test("fit is deterministic up to merge-order rounding") {
    // NOT bitwise: treeAggregate's combOp merge order follows task
    // completion, which off local mode is randomized, so FP
    // non-associativity may move the low bits between runs. The
    // contract (docstring, oracle) is tolerance equality at well
    // under the 6dp oracle comparison.
    val s = spark
    import s.implicits._
    val df = cloud(200, 5, seed = 41).toDF("id", "vec").repartition(7)
    val a = Pca.fit(df, "vec", 5, 2, iters = 50)
    val b = Pca.fit(df, "vec", 5, 2, iters = 50)
    def close(x: Array[Double], y: Array[Double]): Boolean =
      x.length == y.length && x.zip(y).forall { case (p, q) => math.abs(p - q) < 1e-12 }
    assert(close(a.mean, b.mean))
    assert(a.components.zip(b.components).forall { case (p, q) => close(p, q) })
    assert(close(a.eigenvalues, b.eigenvalues))
  }

  test("guards: bad vector length, bad k, empty input") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(1.0, 2.0))).toDF("id", "vec")
    val e = intercept[Exception](Pca.fit(df, "vec", 3, 1))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("expected 3")))
    intercept[IllegalArgumentException](Pca.fit(df, "vec", 2, 3))
    intercept[IllegalArgumentException](
      Pca.fit(df.where(F.lit(false)), "vec", 2, 1))
  }

  test("incremental fit: merged shard moments reproduce the whole-data model") {
    val s = spark
    import s.implicits._
    val rows = cloud(600, 6, seed = 23)
    val whole = rows.toDF("id", "vec")
    // three uneven shards — the per-drop shape: each contributes its
    // own moment sidecar, history is never rescanned
    val shards = Seq(
      rows.filter(_._1 % 5 <= 1), rows.filter(_._1 % 5 == 2),
      rows.filter(_._1 % 5 >= 3)).map(_.toDF("id", "vec"))
    val merged = shards.map(Pca.moments(_, "vec", 6))
      .reduce(Pca.mergeMoments)
    val mInc = Pca.fitFromMoments(merged, 6, k = 2, iters = 80)
    val mAll = Pca.fit(whole, "vec", 6, k = 2, iters = 80)
    assert(mInc.n == mAll.n && mInc.n == 600L)
    (0 until 6).foreach(f =>
      assert(math.abs(mInc.mean(f) - mAll.mean(f)) < 1e-9,
        s"mean diverges at $f"))
    (0 until 2).foreach { c =>
      assert(math.abs(mInc.eigenvalues(c) - mAll.eigenvalues(c)) < 1e-6,
        s"eigenvalue $c diverges: ${mInc.eigenvalues(c)} vs ${mAll.eigenvalues(c)}")
      (0 until 6).foreach(f =>
        assert(math.abs(mInc.components(c)(f) - mAll.components(c)(f)) < 1e-6,
          s"component $c diverges at $f"))
    }
    // moment size guard: a mismatched accumulator fails loudly, not
    // with a garbage covariance
    val bad = intercept[IllegalArgumentException](
      Pca.fitFromMoments(merged.take(10), 6, 2))
    assert(bad.getMessage.contains("accumulator size"))
  }
}
