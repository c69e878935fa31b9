package graft.scale

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.storage.StorageLevel

/** Fully deterministic k-means: farthest-first (k-center) seeding from
  * the smallest-id point + a FIXED number of Lloyd iterations, with a
  * total order on every decision (argmin/argmax ties break on the
  * smaller index/id). Unlike MLlib's KMeans — whose seeded random init
  * still depends on partition layout, and whose tolerance-based early
  * stop turns float drift into different iteration counts — the same
  * input always yields the same centroids and assignments, so
  * operators built on it (energy compression, IVF) are
  * oracle-checkable by replaying the exact recurrence.
  *
  * Distributed shape: seeding keeps a per-row running min-distance
  * column (one narrow mapPartitions + one reduce per centroid, no
  * shuffle); each Lloyd iteration is one broadcast-assign pass and one
  * aggregateByKey with array-sum combiners (map-side partial sums — at
  * most k·F doubles per partition cross the network). Cost: O(k)
  * passes for seeding + O(iters) single-shuffle jobs; centroids
  * (k × F doubles) are the only driver-side state.
  */
object DeterministicKMeans {

  final case class Model(centers: Array[Array[Double]]) {
    def k: Int = centers.length

    /** Index of the nearest center (squared Euclidean; ties → smaller
      * index). */
    def predict(x: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        val d = sqDist(x, centers(c))
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** items: (id: Long, x: Array[Double]) under the given column names.
    * Returns the fitted model; get assignments with [[assign]].
    */
  def fit(
      items: DataFrame,
      k: Int,
      maxIter: Int,
      idCol: String = "id",
      vecCol: String = "x"): Model = {
    val spark = items.sparkSession
    import spark.implicits._
    val raw = items
      .select(F.col(idCol).cast("long"), F.col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .rdd
    val base = raw.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val sc = spark.sparkContext
      val nRows = base.count()
      val kEff = math.max(1, math.min(k, nRows.toInt))
      val nFProbe = if (nRows > 0) base.first()._2.length else 0
      // Driver-local fast path: seeding + Lloyd are O(k + iters)
      // SEQUENTIAL Spark jobs; when the input fits comfortably on the
      // driver (≤ ~32 MB of doubles — a coarse quantizer's input after
      // sampling/trim usually does) the job-scheduling overhead is the
      // entire cost, ~40 ms per job even on one task. Same recurrence,
      // id-ordered accumulation, so the result is deterministic under
      // any partition layout.
      if (nRows * math.max(1, nFProbe) <= 4000000L)
        return fitLocal(base.collect().sortBy(_._1), kEff, maxIter)

      // ---- farthest-first seeding: c0 = smallest id; c_{i+1} = the
      // point with the largest running min-distance (ties → smaller id).
      // ONE job per chosen center: the argmax reduce doubles as the
      // materializing action for the freshly-persisted generation, so
      // the parent can be dropped right after.
      val c0 = base.min()(Ordering.by(_._1))._2
      val centers = scala.collection.mutable.ArrayBuffer(c0)
      // (id, x, minDist to chosen centers)
      var state = base.map { case (id, x) => (id, x, sqDist(x, c0)) }
        .persist(StorageLevel.MEMORY_AND_DISK)
      // checkpointed generations stay pinned: their lineage is
      // truncated, so unpersisting them would destroy the only copy
      // the NEXT generation's recovery path reads from
      var stateCheckpointed = false
      var prev: org.apache.spark.rdd.RDD[(Long, Array[Double], Double)] = null
      var prevCheckpointed = false
      var i = 1
      while (i < kEff) {
        // this reduce is ALSO the action that materializes the
        // freshly-persisted `state` generation — after it the parent's
        // blocks are no longer needed
        val far = state.reduce { (a, b) =>
          if (a._3 > b._3 || (a._3 == b._3 && a._1 < b._1)) a else b
        }
        if (prev != null && !prevCheckpointed) prev.unpersist(blocking = false)
        centers += far._2
        if (i < kEff - 1) {
          val bcC = sc.broadcast(far._2)
          prev = state
          prevCheckpointed = stateCheckpointed
          state = prev
            .map { case (id, x, md) => (id, x, math.min(md, sqDist(x, bcC.value))) }
            .persist(StorageLevel.MEMORY_AND_DISK)
          stateCheckpointed = i % 8 == 0 // bound the map-chain lineage
          if (stateCheckpointed) state.localCheckpoint()
        }
        i += 1
      }
      if (!stateCheckpointed) state.unpersist(blocking = false)

      // ---- fixed-iteration Lloyd; empty clusters keep their center
      var cs = centers.toArray
      val nF = c0.length
      var iter = 0
      while (iter < maxIter) {
        val bc = sc.broadcast(cs)
        val sums = base
          .map { case (_, x) =>
            var best = 0; var bestD = Double.MaxValue
            val cc = bc.value
            var c = 0
            while (c < cc.length) {
              val d = sqDist(x, cc(c))
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            (best, (x, 1L))
          }
          .aggregateByKey((null: Array[Double], 0L))(
            seqOp = { case ((acc, n), (x, one)) =>
              val a = if (acc == null) new Array[Double](nF) else acc
              var f = 0
              while (f < nF) { a(f) += x(f); f += 1 }
              (a, n + one)
            },
            combOp = { case ((a1, n1), (a2, n2)) =>
              if (a1 == null) (a2, n1 + n2)
              else if (a2 == null) (a1, n1 + n2)
              else {
                var f = 0
                while (f < nF) { a1(f) += a2(f); f += 1 }
                (a1, n1 + n2)
              }
            })
          .collectAsMap()
        cs = Array.tabulate(cs.length) { c =>
          sums.get(c) match {
            case Some((s, n)) if n > 0 => s.map(_ / n)
            case _ => cs(c)
          }
        }
        iter += 1
      }
      Model(cs)
    } finally base.unpersist(blocking = false)
  }

  /** The same farthest-first + fixed-Lloyd recurrence on a collected,
    * id-sorted array — used when the input is driver-small so the
    * O(k + iters) sequential Spark jobs of the distributed path reduce
    * to in-memory loops. Accumulation order is ascending id (for Lloyd:
    * ascending id within each cluster), matching the distributed
    * path's id-ordered scan on a single partition.
    */
  private def fitLocal(
      data: Array[(Long, Array[Double])], kEff: Int, maxIter: Int): Model = {
    require(data.nonEmpty, "items must be non-empty")
    val nF = data(0)._2.length
    val c0 = data.minBy(_._1)._2
    val centers = scala.collection.mutable.ArrayBuffer(c0)
    val minD = data.map { case (_, x) => sqDist(x, c0) }
    var i = 1
    while (i < kEff) {
      var farIdx = 0
      var j = 1
      while (j < data.length) {
        if (minD(j) > minD(farIdx) ||
          (minD(j) == minD(farIdx) && data(j)._1 < data(farIdx)._1)) farIdx = j
        j += 1
      }
      val c = data(farIdx)._2
      centers += c
      j = 0
      while (j < data.length) {
        val d = sqDist(data(j)._2, c)
        if (d < minD(j)) minD(j) = d
        j += 1
      }
      i += 1
    }

    var cs = centers.toArray
    var iter = 0
    while (iter < maxIter) {
      val sums = Array.fill(cs.length)(new Array[Double](nF))
      val counts = new Array[Long](cs.length)
      var j = 0
      while (j < data.length) {
        val x = data(j)._2
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val d = sqDist(x, cs(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var f = 0
        while (f < nF) { s(f) += x(f); f += 1 }
        counts(best) += 1
        j += 1
      }
      cs = Array.tabulate(cs.length) { c =>
        if (counts(c) > 0) sums(c).map(_ / counts(c)) else cs(c)
      }
      iter += 1
    }
    Model(cs)
  }

  /** Assignment frame (idCol, vecCol, clusterCol) for a fitted model —
    * broadcast centers, one narrow pass, no shuffle. */
  def assign(
      items: DataFrame,
      model: Model,
      idCol: String = "id",
      vecCol: String = "x",
      clusterCol: String = "cluster"): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    items
      .select(F.col(idCol).cast("long"), F.col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, x) => (id, x, bc.value.predict(x)) }
      .toDF(idCol, vecCol, clusterCol)
  }
}
