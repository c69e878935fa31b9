package graft.metrics

import org.apache.spark.sql.{DataFrame, functions => F}

/** The reference's six graph-aware retrieval metrics (reference
  * tests/test_6_beir_new_score.py:268-404; factor weights at :52-55):
  * G-RBP, TD-nDCG, IT-ERR, MRR-Topo, SQI@k, and RBO-S, built on a
  * per-rank topology factor
  * T_i = w_ppr·PPR(node) + w_cond·(1−cond(prefix)) + w_mod·modShare(prefix).
  *
  * Distributed shape: the ranked lists are ≤ k rows per query, so the
  * heavy graph quantities are joined ONTO the lists (PPR values,
  * degrees, communities, and the edges among each query's own result
  * nodes), then every metric for a query is computed in one
  * mapGroups over its ≤ k rows — one shuffle keyed by query_id,
  * scaling in #queries. Two structural economies vs the reference's
  * networkx loop: whole-graph PPR does not depend on the prefix (the
  * reference re-runs pagerank per rank and reads the same values), and
  * prefix conductance is incremental from within-list edges:
  * cut(d) = vol(d) − 2·internal(d).
  *
  * Inputs:
  *  - edges: symmetric (src, dst, weight)
  *  - retrieved: (query_id, doc_id, rank, grade) — grade ≥ 0, rank 1-based
  *  - sources: (query_id, node_id) — the query's anchor node in the graph
  */
object TopologyMetrics {

  final case class Weights(ppr: Double = 0.4, cond: Double = 0.3, mod: Double = 0.3)

  def evaluate(
      edges: DataFrame,
      retrieved: DataFrame,
      sources: DataFrame,
      weights: Weights = Weights(),
      k: Int = 10,
      rbpP: Double = 0.9,
      maxGrade: Double = 3.0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val lists = retrieved.where(F.col("rank") <= k)

    // Per-query PPR from the query's anchor node, restricted to its
    // own result nodes. ALL distinct anchors run in ONE batched
    // recurrence (PprEngine.runMany: per-node slot arrays), so anchor
    // fan-out costs one 15-stage chain — not one job DAG per anchor —
    // and queries sharing an anchor share its slot.
    // SIZE NOTE: this collect is bounded by the EVAL-SET size (two
    // longs per judged query — 16 MB per million queries), never by
    // the corpus; an eval harness with more queries than that should
    // evaluate in query-batches. Gated so the failure is a clear
    // message, not a driver OOM.
    require(sources.count() <= 10000000L,
      "TopologyMetrics.evaluate collects (query_id, node_id) pairs " +
        "driver-side; >10M judged queries — evaluate in batches")
    val anchors = sources.select($"query_id".as[Long], $"node_id".as[Long]).collect()
    if (anchors.isEmpty)
      return spark.emptyDataset[(Long, Double, Double, Double, Double, Double)]
        .toDF("query_id", "g_rbp", "td_ndcg", "it_err", "mrr_topo", "sqi")
    val pprEngine = new graft.graph.GraphAnalytics.PprEngine(edges)
    // runMany's output is eagerly localCheckpoint'ed — the engine's
    // cached degree/node RDDs can be released right after
    val pprBySource = pprEngine.runMany(anchors.map(_._2).distinct.toSeq)
      .withColumnRenamed("id", "doc_id")
    pprEngine.release()
    val anchorDf = anchors.toSeq.toDF("query_id", "source")
    val ppr = pprBySource.join(F.broadcast(anchorDf), "source")
      .select("query_id", "doc_id", "ppr")

    val degrees = edges.groupBy(F.col("src").as("doc_id"))
      .agg(F.sum("weight").as("degree"))
    val comm = graft.graph.GraphAnalytics.labelPropagation(edges)
      .withColumnRenamed("id", "doc_id")

    // Edges among each query's own result nodes: join each endpoint to
    // the list membership (src join fans out per query; the dst join
    // then requires same-query membership).
    val listNodes = lists.select("query_id", "doc_id", "rank")
    val eByQuery = edges
      .join(listNodes.select(F.col("query_id"), F.col("doc_id").as("src"),
        F.col("rank").as("rank_src")), "src")
      .join(listNodes.select(F.col("query_id"), F.col("doc_id").as("dst"),
        F.col("rank").as("rank_dst")), Seq("query_id", "dst"))
      .where(F.col("rank_src") < F.col("rank_dst"))
      .select($"query_id".as[Long], $"rank_src".as[Int], $"rank_dst".as[Int],
        $"weight".as[Double])
      .map { case (q, rs, rd, w) => (q, (rs, rd, w)) }

    val enriched = lists
      .join(ppr, Seq("query_id", "doc_id"), "left")
      .join(degrees, Seq("doc_id"), "left")
      .join(comm, Seq("doc_id"), "left")
      .select(
        F.col("query_id").cast("long"),
        F.col("rank").cast("int"),
        F.col("grade").cast("double"),
        F.coalesce($"ppr", F.lit(0.0)).as("ppr"),
        F.coalesce($"degree", F.lit(0.0)).as("degree"),
        F.coalesce($"community", F.lit(-1L)).cast("long").as("community"))
      .as[(Long, Int, Double, Double, Double, Long)]
      .map { case (q, r, g, p, d, c) => (q, (r, g, p, d, c)) }

    val totalVol = edges
      .agg(F.coalesce(F.sum("weight"), F.lit(0.0))).head.getDouble(0)
    val w = weights

    enriched.toDF("query_id", "row")
      .groupBy("query_id")
      .agg(F.collect_list("row").as("rows"))
      .join(
        eByQuery.toDF("query_id", "e")
          .groupBy("query_id").agg(F.collect_list("e").as("es")),
        Seq("query_id"), "left")
      .select($"query_id".as[Long],
        $"rows".as[Seq[(Int, Double, Double, Double, Long)]],
        F.coalesce($"es", F.array()).as[Seq[(Int, Int, Double)]])
      .map { case (qid, rowsRaw, esRaw) =>
        val rows = rowsRaw.sortBy(_._1).toArray // by rank
        val n = rows.length
        val grades = rows.map(_._2)
        val pprs = rows.map(_._3)
        val degs = rows.map(_._4)
        val comms = rows.map(_._5)
        // internal edge weight by (lowRank, highRank)
        val internalAt = new Array[Double](n + 1) // cumulative internal weight at prefix d
        val byHigh = esRaw.groupBy(_._2)
        var d = 1
        while (d <= n) {
          val add = byHigh.getOrElse(d, Seq.empty).map(_._3).sum
          internalAt(d) = internalAt(d - 1) + add
          d += 1
        }
        // prefix quantities
        val t = new Array[Double](n)
        val commCount = scala.collection.mutable.Map.empty[Long, Int]
        var vol = 0.0
        var i = 0
        while (i < n) {
          vol += degs(i)
          commCount(comms(i)) = commCount.getOrElse(comms(i), 0) + 1
          val internal = internalAt(i + 1)
          val cut = math.max(0.0, vol - 2.0 * internal)
          val volRest = totalVol - vol
          val cond =
            if (i + 1 == n && volRest <= 0) 0.0
            else if (math.min(vol, volRest) <= 0) 1.0
            else cut / math.min(vol, volRest)
          val modShare = commCount.values.max.toDouble / (i + 1)
          t(i) = w.ppr * pprs(i) + w.cond * (1.0 - cond) + w.mod * modShare
          i += 1
        }
        // G-RBP
        var gRbp = 0.0
        i = 0
        while (i < n) {
          gRbp += (1 - rbpP) * grades(i) * math.pow(rbpP, i) * t(i); i += 1
        }
        // TD-nDCG
        var dcg = 0.0
        i = 0
        while (i < n) {
          dcg += ((math.pow(2, grades(i)) - 1) * t(i)) / (math.log(i + 2) / math.log(2)); i += 1
        }
        val idealRel = grades.sorted.reverse
        val maxT = if (n > 0) t.max else 1.0
        var idcg = 0.0
        i = 0
        while (i < n) {
          idcg += (math.pow(2, idealRel(i)) - 1) * maxT / (math.log(i + 2) / math.log(2)); i += 1
        }
        val tdNdcg = if (idcg > 0) dcg / idcg else 0.0
        // IT-ERR
        var err = 0.0
        var probStop = 0.0
        i = 0
        while (i < n) {
          val rt = (grades(i) / maxGrade) * t(i)
          err += (1 - probStop) * rt / (i + 1)
          probStop += (1 - probStop) * rt
          i += 1
        }
        // MRR-Topo
        val firstRel = rows.indexWhere(_._2 > 0)
        val mrrTopo = if (firstRel >= 0) t(firstRel) / (firstRel + 1) else 0.0
        // SQI@k (whole-list prefix)
        val sqi =
          if (n > 0) {
            val internal = internalAt(n)
            val cut = math.max(0.0, vol - 2.0 * internal)
            val volRest = totalVol - vol
            val cond = if (math.min(vol, volRest) <= 0) 1.0 else cut / math.min(vol, volRest)
            val modShare = commCount.values.max.toDouble / n
            w.cond * (1 - cond) + w.mod * modShare + w.ppr * pprs.sum
          } else 0.0
        (qid, gRbp, tdNdcg, err, mrrTopo, sqi)
      }
      .toDF("query_id", "g_rbp", "td_ndcg", "it_err", "mrr_topo", "sqi")
  }

  /** Rank-Biased Overlap between two rankings of the same query set
    * (reference rbo_stability, test_6:395-404). Inputs: two
    * (query_id, doc_id, rank) frames. Output: (query_id, rbo).
    */
  def rboStability(a: DataFrame, b: DataFrame, p: Double = 0.9): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def lists(df: DataFrame) = df
      .select($"query_id".as[Long], $"doc_id".as[Long], $"rank".as[Int])
      .map { case (q, doc, r) => (q, (r, doc)) }
      .toDF("query_id", "rd")
      .groupBy("query_id").agg(F.collect_list("rd").as("l"))
    lists(a).withColumnRenamed("l", "la")
      .join(lists(b).withColumnRenamed("l", "lb"), "query_id")
      .select($"query_id".as[Long],
        $"la".as[Seq[(Int, Long)]], $"lb".as[Seq[(Int, Long)]])
      .map { case (q, la, lb) =>
        val sa = la.sortBy(_._1).map(_._2).toArray
        val sb = lb.sortBy(_._1).map(_._2).toArray
        val depth = math.min(sa.length, sb.length)
        var score = 0.0
        var dd = 1
        while (dd <= depth) {
          val overlap = sa.take(dd).toSet.intersect(sb.take(dd).toSet).size
          score += math.pow(p, dd - 1) * overlap.toDouble / dd
          dd += 1
        }
        (q, (1 - p) * score)
      }
      .toDF("query_id", "rbo")
  }
}
