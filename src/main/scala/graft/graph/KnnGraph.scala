package graft.graph

import graft.core.GraphParams
import graft.functions.VectorFunctions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Distributed eps-kNN similarity graph over item embeddings
  * (reference semantics: GRAPH_VARIABLES.md:7-10 — rectified-cosine
  * distance d = 1−max(0,cos); keep d ≤ eps; cap at the k nearest per
  * node; symmetrize; weight w = 1/(1+(d/σ)^p)).
  *
  * Two physical strategies behind one logical contract:
  *   - brute-force blocked self-join for small N (exact);
  *   - `BucketedRandomProjectionLSH` candidate generation for large N.
  *     On L2-normalized vectors Euclidean distance is monotone in
  *     cosine (d_e² = 2−2·cos), so the eps threshold maps exactly to a
  *     Euclidean radius √(2·eps) — LSH only affects recall of
  *     *candidates*, every surviving edge is exact.
  *
  * Output schema: (src: Long, dst: Long, dist: Double, weight: Double),
  * symmetric (both directions present).
  */
object KnnGraph {

  /** Above this row count the builder switches to the LSH path. */
  val BruteForceMaxRows = 20000L

  /** items: (id: Long, vnorm: Array[Double]) — pre-normalized vectors. */
  def epsKnnEdges(items: DataFrame, params: GraphParams, nItems: Long): DataFrame = {
    val directed =
      if (nItems <= BruteForceMaxRows) directedBruteForce(items, params)
      else directedLsh(items, params)

    // Per-node top-k by smallest distance (deterministic tie-break on dst),
    // then symmetrize: an edge survives if either endpoint selected it.
    val w = Window.partitionBy("src").orderBy(F.col("dist").asc, F.col("dst").asc)
    val capped = directed
      .withColumn("rn", F.row_number().over(w))
      .where(F.col("rn") <= params.k)
      .drop("rn")
    val sym = capped
      .unionByName(capped.select(
        F.col("dst").as("src"), F.col("src").as("dst"), F.col("dist")))
      .groupBy("src", "dst").agg(F.min("dist").as("dist"))
    sym.withColumn("weight", weightKernel(F.col("dist"), params.sigmaValue, params.p))
  }

  private def directedBruteForce(items: DataFrame, params: GraphParams): DataFrame = {
    val a = items.select(F.col("id").as("src"), F.col("vnorm").as("va"))
    val b = items.select(F.col("id").as("dst"), F.col("vnorm").as("vb"))
    a.join(b, F.col("src") =!= F.col("dst"))
      .withColumn("dist", cosineDistance(F.col("va"), F.col("vb")))
      .where(F.col("dist") <= params.eps)
      .select("src", "dst", "dist")
  }

  private def directedLsh(items: DataFrame, params: GraphParams): DataFrame = {
    val withVec = items.withColumn("features", array_to_vector(F.col("vnorm")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features")
      .setOutputCol("hashes")
      .setBucketLength(2.0)
      .setNumHashTables(3)
      .setSeed(params.seed)
    val model = lsh.fit(withVec)
    // eps ≥ 1 ⇒ every pair qualifies (d_rect ≤ 1); cap radius at the
    // unit-sphere diameter so the join threshold stays meaningful.
    val radius = math.sqrt(2.0 * math.min(params.eps, 2.0))
    model
      .approxSimilarityJoin(withVec, withVec, radius, "euclid")
      .select(
        F.col("datasetA.id").as("src"),
        F.col("datasetA.vnorm").as("va"),
        F.col("datasetB.id").as("dst"),
        F.col("datasetB.vnorm").as("vb"))
      .where(F.col("src") =!= F.col("dst"))
      .withColumn("dist", cosineDistance(F.col("va"), F.col("vb")))
      .where(F.col("dist") <= params.eps)
      .select("src", "dst", "dist")
  }

  /** Weighted degree per node: (id, degree). */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(F.col("src").as("id")).agg(F.sum("weight").as("degree"))
}
