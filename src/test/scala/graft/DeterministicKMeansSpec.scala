package graft

import graft.scale.DeterministicKMeans

/** The module's contract is BIT-exact reproducibility: same input →
  * same centroids, regardless of which execution path runs or how the
  * input is partitioned. The energy pipeline and IVF oracle replays
  * depend on it.
  */
class DeterministicKMeansSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(11)
    (0 until 300).map { i =>
      val c = i % 3
      (i.toLong, Array.tabulate(8)(f => c * 3.0 + rng.nextDouble() * 0.5 + f * 0.01))
    }.toDF("id", "x")
  }

  test("distributed Lloyd path is bit-identical to the driver-local path") {
    val df = fixture
    val local = DeterministicKMeans.fit(df, k = 5, maxIter = 7)
    // localThreshold = 0 forces the distributed seeding + sorted
    // per-cluster Lloyd sums
    val dist = DeterministicKMeans.fit(df, k = 5, maxIter = 7, localThreshold = 0L)
    assert(local.k == dist.k)
    local.centers.zip(dist.centers).zipWithIndex.foreach { case ((a, b), c) =>
      assert(a.sameElements(b), s"center $c differs: ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("distributed path is invariant to input partition layout") {
    val df = fixture
    val a = DeterministicKMeans.fit(df.repartition(2), 4, 5, localThreshold = 0L)
    val b = DeterministicKMeans.fit(df.repartition(11), 4, 5, localThreshold = 0L)
    a.centers.zip(b.centers).foreach { case (x, y) =>
      assert(x.sameElements(y), "centroids depend on partition layout")
    }
  }
}
