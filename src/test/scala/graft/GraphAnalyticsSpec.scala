package graft

import graft.graph.GraphAnalytics._
import org.apache.spark.sql.{functions => F}

/** Goldens on a hand-built graph: two triangles {0,1,2} and {3,4,5}
  * joined by the bridge 2—3 (all weights 1).
  */
class GraphAnalyticsSpec extends SparkSpec {

  lazy val edges = {
    val s = spark
    import s.implicits._
    val und = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L))
    (und ++ und.map(_.swap))
      .map { case (a, b) => (a, b, 0.0, 1.0) }
      .toDF("src", "dst", "dist", "weight")
  }

  test("triangle count = 2") {
    assert(triangleCount(edges).head.getLong(0) == 2L)
  }

  test("GraphX triangle count matches the relational 3-way join") {
    assert(triangleCountGraphX(edges).head.getLong(0) == 2L)
    // and on a denser graph: K5 has C(5,3) = 10 triangles
    val sp = spark
    import sp.implicits._
    val und = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val k5 = (und ++ und.map(_.swap)).map { case (a, b) => (a, b, 0.0, 1.0) }
      .toDF("src", "dst", "dist", "weight")
    assert(triangleCount(k5).head.getLong(0) == 10L)
    assert(triangleCountGraphX(k5).head.getLong(0) == 10L)
  }

  test("cosineThresholdEdges matches the cartesian-filter definition") {
    val sp = spark
    import sp.implicits._
    val rng = new scala.util.Random(11)
    val items = (0 until 40).map(i => (i.toLong, Array.fill(8)(rng.nextGaussian())))
      .toDF("id", "vec")
    val got = cosineThresholdEdges(items, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = items.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val want = (for {
      (a, va) <- rows; (b, vb) <- rows if a < b
      if graft.functions.VectorKernels.cosine(va, vb) >= 0.3
    } yield (a, b)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("connected components: single component") {
    val comps = connectedComponents(edges).select("component").distinct().count()
    assert(comps == 1L)
  }

  test("conductance of one triangle = 1/7 (cut 1, vol 7)") {
    val c = conductance(edges, Set(0L, 1L, 2L))
    assert(math.abs(c - 1.0 / 7.0) < 1e-9, s"got $c")
  }

  test("personalized PageRank concentrates near the source") {
    val ppr = personalizedPageRank(edges, 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(ppr(0L) > ppr(5L), s"ppr=$ppr")
    assert(ppr.values.forall(_ >= 0.0))
  }

  test("co-partitioned PPR matches GraphX staticPersonalizedPageRank") {
    val mine = personalizedPageRank(edges, 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val g = toGraph(edges)
    val ref =
      try g.staticPersonalizedPageRank(0L, numIter = 15)
        .vertices.collect().toMap
      finally g.unpersist(blocking = false)
    assert(mine.keySet == ref.keySet)
    mine.foreach { case (id, v) =>
      assert(math.abs(v - ref(id)) < 1e-9, s"node $id: $v vs ${ref(id)}")
    }
  }

  test("runMany: concurrent chunks equal one batch and the per-source runs") {
    val eng = new PprEngine(edges, numIter = 15)
    try {
      val anchors = Seq(0L, 1L, 3L, 4L, 5L)
      // one slot-array recurrence for all anchors: the reference
      val one = eng.runMany(anchors, maxBatch = 256)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
      // maxBatch=2 forces 3 chunks; maxConcurrent=3 submits them as
      // concurrent Spark jobs — results must be byte-identical (each
      // chunk's arithmetic is independent of the others)
      val par = eng.runMany(anchors, maxBatch = 2, maxConcurrent = 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
        .toMap
      assert(par == one,
        s"concurrent chunked runMany diverged from the single batch")
      // and both match the single-source operator per anchor
      for (a <- anchors) {
        val single = personalizedPageRank(edges, a)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
        single.foreach { case (id, v) =>
          assert(math.abs(one((a, id)) - v) < 1e-12,
            s"anchor $a node $id: batch ${one((a, id))} vs single $v")
        }
      }
    } finally eng.release()
  }

  test("hop distances: golden BFS, landmark set, cap truncation, directed input") {
    val s = spark
    import s.implicits._
    def hops(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // two triangles bridged at 2—3: distances from node 0
    assert(hops(hopDistances(edges, Seq(0L))) ==
      Seq((0L, 0), (1L, 1), (2L, 1), (3L, 2), (4L, 3), (5L, 3)))
    // landmark SET: min hops over sources {0, 5}
    assert(hops(hopDistances(edges, Seq(0L, 5L))) ==
      Seq((0L, 0), (1L, 1), (2L, 1), (3L, 1), (4L, 1), (5L, 0)))
    // a cap truncates the reachable set rather than mis-measuring it
    assert(hops(hopDistances(edges, Seq(0L), maxHops = 2)) ==
      Seq((0L, 0), (1L, 1), (2L, 1), (3L, 2)))
    // directed input is symmetrized: a one-way chain walks both ways
    val chain = Seq((10L, 11L), (11L, 12L))
      .map { case (a, b) => (a, b, 0.0, 1.0) }
      .toDF("src", "dst", "dist", "weight")
    assert(hops(hopDistances(chain, Seq(12L))) ==
      Seq((10L, 2), (11L, 1), (12L, 0)))
    // disconnected nodes are absent, not infinite
    val two = Seq((0L, 1L, 0.0, 1.0), (5L, 6L, 0.0, 1.0))
      .toDF("src", "dst", "dist", "weight")
    assert(hops(hopDistances(two, Seq(0L))) == Seq((0L, 0), (1L, 1)))
    // per-source face: the full hop matrix for each landmark (the
    // merged face is its per-id MIN — law checked directly)
    val by = hopDistancesBySource(edges, Seq(0L, 5L))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(by((0L, 3L)) == 2 && by((5L, 3L)) == 1 && by((0L, 0L)) == 0)
    val merged = hops(hopDistances(edges, Seq(0L, 5L))).toMap
    for (id <- 0L to 5L)
      assert(merged(id) ==
        math.min(by((0L, id)), by((5L, id))),
        s"merged hops != min over sources for node $id")
    // harmonic: node 3 sees landmark 0 at hops 2 and landmark 5 at
    // hops 1 -> 1/2 + 1 = 1.5; every node checked against the matrix
    val harm = harmonicCentrality(edges, Seq(0L, 5L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(harm(3L) == 1.5)
    for (id <- 0L to 5L) {
      val want = Seq(0L, 5L)
        .map(l => by((l, id)))
        .filter(_ > 0)
        .map(1.0 / _)
        .sum
      assert(harm(id) == math.rint(want * 10000) / 10000 ||
        math.abs(harm(id) - want) < 5e-5,
        s"harmonic($id) = ${harm(id)} want ~$want")
    }
  }

  test("label propagation assigns every node a community") {
    val lp = labelPropagation(edges)
    assert(lp.count() == 6L)
  }

  test("topology factor is bounded and defined for all nodes") {
    val tf = topologyFactor(edges, 0L).collect().map(_.getDouble(1))
    assert(tf.length == 6)
    assert(tf.forall(v => v >= -1e-9 && v <= 1.0 + 1e-9))
  }

  test("disconnected set conductance returns 1 when no cut possible") {
    val s = spark
    import s.implicits._
    val e = Seq((0L, 1L, 0.0, 1.0), (1L, 0L, 0.0, 1.0)).toDF("src", "dst", "dist", "weight")
    assert(conductance(e, Set(0L, 1L)) == 1.0) // V\S empty -> denom 0
  }

  test("kCore: peeling cascade reaches the known core; invariants hold") {
    val s = spark
    import s.implicits._
    // triangle {0,1,2} + a path tail 2-3-4: the 2-core is exactly the
    // triangle, and reaching it takes TWO peeling rounds (4 falls
    // first, then 3 — degree cascades are the point of the operator)
    def und(ps: (Long, Long)*): org.apache.spark.sql.DataFrame =
      (ps ++ ps.map(p => (p._2, p._1))).toDF("src", "dst")
    val g = und((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
    val core = graft.graph.GraphAnalytics.kCore(g, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // a one-round cap must stop mid-cascade (4 gone, 3 still in) —
    // the bounded-unroll contract the SQL replay relies on
    val capped = graft.graph.GraphAnalytics.kCore(g, k = 2, maxRounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(capped == Set(0L, 1L, 2L, 3L))
    // self-consistency + maximality on a bigger random graph: every
    // member's in-core degree >= k, and no removed node would qualify
    val rng = new scala.util.Random(11)
    val ps = (0 until 400).map(_ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong)).filter(p => p._1 != p._2)
    val big = und(ps.distinct: _*)
    val k = 4
    val got = graft.graph.GraphAnalytics.kCore(big, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ >= k), s"core member below degree $k: $got")
    val adj = ps.distinct.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val members = got.keySet
    for (id <- adj.keySet if !members.contains(id))
      assert(adj(id).count(members.contains) < k,
        s"removed node $id would qualify for the core — not maximal")
    // null endpoints must be DROPPED, not peeled forever: anti-join
    // keys never match null, so without the up-front filter a
    // null-endpoint edge survives every round and emits a spurious
    // (null, deg) core row
    val dirty = Seq(
      (Option(0L), Option(1L)), (Option(1L), Option(0L)),
      (Option.empty[Long], Option(0L)), (Option(0L), Option.empty[Long]))
      .toDF("src", "dst")
    val dr = graft.graph.GraphAnalytics.kCore(dirty, k = 1)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(!dr.contains(None), s"null id row in core: ${dr.toSeq}")
    assert(dr.flatten.toSet == Set(0L, 1L), dr.toSeq.toString)
  }
}
