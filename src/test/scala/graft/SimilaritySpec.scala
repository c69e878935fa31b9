package graft

import graft.operators.Similarity
import org.apache.spark.sql.{functions => F}

class SimilaritySpec extends SparkSpec {

  lazy val emb = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(31)
    (0 until 600).map { i =>
      val base = Array.tabulate(32)(f => math.sin((i % 8) * 0.9 + f * 0.4))
      (i.toLong, base.map(_ + rng.nextGaussian() * 0.15))
    }.toDF("id", "vec")
  }

  lazy val query: Array[Double] =
    emb.where(F.col("id") === 11).select("vec").head.getSeq[Double](0).toArray

  test("IVF top-k with full probes equals brute force exactly") {
    val index = Similarity.ivfBuild(emb, nLists = 8)
    val brute = Similarity.annTopK(emb, query, 10).collect().map(_.getLong(0)).toSeq
    val full = Similarity.ivfTopK(index, query, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute)
  }

  test("IVF with nprobe=2 has high recall on clustered data") {
    val index = Similarity.ivfBuild(emb, nLists = 8)
    val brute = Similarity.annTopK(emb, query, 10).collect().map(_.getLong(0)).toSet
    val probed = Similarity.ivfTopK(index, query, 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(probed.intersect(brute).size >= 8, s"recall too low: $probed vs $brute")
  }

  test("persisted IVF probe scan prunes to the probed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val index = Similarity.ivfBuild(emb, nLists = 8)
    Similarity.ivfSave(index, dir)
    val loaded = Similarity.ivfLoad(spark, dir)
    assert(loaded.k == 8 && loaded.centroids.length == 8)
    val res = Similarity.ivfTopK(loaded, query, 10, nprobe = 2)
    // partition pruning visible in the scan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"),
      s"no partition pruning in:\n${plan.take(1500)}")
    // and results match the in-memory index probe
    val a = res.collect().map(_.getLong(0)).toSeq
    val b = Similarity.ivfTopK(index, query, 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }
}
