package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.graphx.lib.LabelPropagation
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Graph-analytics operators over the similarity graph — the
  * quantities the reference's topology-aware evaluation computes with
  * networkx on the driver (reference
  * tests/test_6_beir_new_score.py:268-314: personalized PageRank,
  * conductance, modularity communities with topology-factor weights
  * 0.4/0.3/0.3 at :52-55), re-expressed on GraphX so they scale past
  * a single machine.
  *
  * Input edge DataFrames use the engine's (src, dst, [dist,] weight)
  * schema with both directions present (symmetric).
  */
object GraphAnalytics {

  /** Build a GraphX graph from a symmetric weighted edge DataFrame. */
  def toGraph(edges: DataFrame): Graph[Double, Double] = {
    val es = edges
      .select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col("weight").cast("double"))
      .rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    Graph.fromEdges(es, defaultValue = 0.0)
  }

  /** Personalized PageRank from `source` (GraphX built-in).
    * Output: (id, ppr) — reference test_6's PPR term.
    */
  def personalizedPageRank(
      edges: DataFrame, source: Long, tol: Double = 1e-4): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges)
      .personalizedPageRank(source, tol)
      .vertices
      .map { case (id, v) => (id, v) }
      .toDF("id", "ppr")
  }

  /** Connected components. Output: (id, component). */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    toGraph(edges)
      .connectedComponents()
      .vertices
      .map { case (id, c) => (id, c) }
      .toDF("id", "component")
  }

  /** Label-propagation communities (the modularity-communities stand-in
    * the reference computes via networkx greedy modularity).
    * Output: (id, community).
    */
  def labelPropagation(edges: DataFrame, maxSteps: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    LabelPropagation
      .run(toGraph(edges), maxSteps)
      .vertices
      .map { case (id, c) => (id, c) }
      .toDF("id", "community")
  }

  /** Weighted conductance of a node set S:
    * cut(S) / min(vol(S), vol(V∖S)), with vol = sum of incident edge
    * weights (each direction counted once, edges are symmetric).
    */
  def conductance(edges: DataFrame, nodeSet: Set[Long]): Double = {
    val spark = edges.sparkSession
    val bc = spark.sparkContext.broadcast(nodeSet)
    import spark.implicits._
    val typed = edges
      .select($"src".as[Long], $"dst".as[Long], $"weight".as[Double])
    val (cut, volS, volRest) = typed
      .map { case (s, d, w) =>
        val inS = bc.value.contains(s)
        val inD = bc.value.contains(d)
        (if (inS != inD) w else 0.0, if (inS) w else 0.0, if (!inS) w else 0.0)
      }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    // In the directed symmetric list, vol(S) = Σ_{src∈S} w is exactly
    // the degree-weight sum, but each cut edge appears in both
    // directions — halve the cut.
    val denom = math.min(volS, volRest)
    if (denom <= 0.0) 1.0 else (cut / 2.0) / denom
  }

  /** Topology factor per node: 0.4·PPR̂ + 0.3·(1−conductance of its
    * community) + 0.3·(community share), PPR̂ min-max normalized —
    * the reference's T_i blend (test_6:52-55, 268-404).
    */
  def topologyFactor(edges: DataFrame, source: Long): DataFrame = {
    val spark = edges.sparkSession
    val ppr = personalizedPageRank(edges, source)
    val comm = labelPropagation(edges)
    val commSizes = comm.groupBy("community").agg(F.count(F.lit(1)).as("csize"))
    val n = comm.count().toDouble
    val bounds = ppr.agg(F.min("ppr").as("lo"), F.max("ppr").as("hi")).head
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = if (hi - lo <= 0) 1.0 else hi - lo
    val commCond: Map[Long, Double] = comm
      .groupBy("community").agg(F.collect_list("id").as("ids"))
      .collect()
      .map { r =>
        val c = r.getLong(0)
        val ids = r.getSeq[Long](1).toSet
        c -> conductance(edges, ids)
      }
      .toMap
    val condDf = spark.createDataFrame(
      commCond.toSeq.map { case (c, v) => (c, v) }).toDF("community", "cond")
    ppr
      .join(comm, "id")
      .join(F.broadcast(commSizes), "community")
      .join(F.broadcast(condDf), "community")
      .select(
        F.col("id"),
        F.round(
          F.lit(0.4) * ((F.col("ppr") - lo) / span) +
            F.lit(0.3) * (F.lit(1.0) - F.col("cond")) +
            F.lit(0.3) * (F.col("csize") / n), 6).as("topology_factor"))
  }

  /** Exact triangle count on a symmetric edge list via a 3-way
    * DataFrame self-join over the (a < b) orientation — matches the
    * relational oracle exactly; use GraphX TriangleCount at scale.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges.where(F.col("src") < F.col("dst")).select("src", "dst")
    val e1 = und.select(F.col("src").as("a"), F.col("dst").as("b"))
    val e2 = und.select(F.col("src").as("b"), F.col("dst").as("c"))
    val e3 = und.select(F.col("src").as("a2"), F.col("dst").as("c2"))
    e1.join(e2, "b")
      .join(e3, F.col("a") === F.col("a2") && F.col("c") === F.col("c2"))
      .agg(F.count(F.lit(1)).as("n_triangles"))
  }
}
