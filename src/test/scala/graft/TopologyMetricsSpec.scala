package graft

import graft.metrics.TopologyMetrics
import org.apache.spark.sql.{functions => F}

/** Topology-aware metric kernels (reference test_6 semantics) on the
  * two-triangle bridge graph.
  */
class TopologyMetricsSpec extends SparkSpec {

  lazy val edges = {
    val s = spark
    import s.implicits._
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    (und ++ und.map(_.swap))
      .map { case (a, b) => (a, b, 0.0, 1.0) }
      .toDF("src", "dst", "dist", "weight")
  }

  // query anchored at node 0; results ranked [1, 2, 4] with binary grades
  lazy val retrieved = {
    val s = spark
    import s.implicits._
    Seq((7L, 1L, 1, 1.0), (7L, 2L, 2, 1.0), (7L, 4L, 3, 0.0))
      .toDF("query_id", "doc_id", "rank", "grade")
  }
  lazy val sources = {
    val s = spark
    import s.implicits._
    Seq((7L, 0L)).toDF("query_id", "node_id")
  }

  test("evaluate produces all six metric columns with sane ranges") {
    val m = TopologyMetrics.evaluate(edges, retrieved, sources).head
    val names = Seq("g_rbp", "td_ndcg", "it_err", "mrr_topo", "sqi")
    names.zipWithIndex.foreach { case (n, i) =>
      val v = m.getDouble(i + 1)
      assert(!v.isNaN && !v.isInfinite, s"$n = $v")
      assert(v >= 0.0, s"$n = $v negative")
    }
    // first result is relevant at rank 1: mrr_topo = T_1 <= 1ish and > 0
    assert(m.getDouble(4) > 0.0)
    // td_ndcg bounded by 1 for this monotone-grade list
    assert(m.getDouble(2) <= 1.0 + 1e-9)
  }

  test("relevant-first beats relevant-last on rank-discounted metrics") {
    val s = spark
    import s.implicits._
    val relLast = Seq((7L, 4L, 1, 0.0), (7L, 2L, 2, 1.0), (7L, 1L, 3, 1.0))
      .toDF("query_id", "doc_id", "rank", "grade")
    val good = TopologyMetrics.evaluate(edges, retrieved, sources).head
    val bad = TopologyMetrics.evaluate(edges, relLast, sources).head
    assert(good.getDouble(1) > bad.getDouble(1), "g_rbp should prefer relevant-first")
    assert(good.getDouble(3) > bad.getDouble(3), "it_err should prefer relevant-first")
  }

  test("RBO: identical lists ~ (1-p)*sum(p^(d-1)), disjoint lists = 0") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 40L, 1), (1L, 50L, 2), (1L, 60L, 3)).toDF("query_id", "doc_id", "rank")
    val same = TopologyMetrics.rboStability(a, a).head.getDouble(1)
    val none = TopologyMetrics.rboStability(a, b).head.getDouble(1)
    val expect = 0.1 * (1.0 + 0.9 + 0.81)
    assert(math.abs(same - expect) < 1e-9, s"$same vs $expect")
    assert(none == 0.0)
  }
}
