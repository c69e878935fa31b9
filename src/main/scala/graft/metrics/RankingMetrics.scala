package graft.metrics

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Retrieval-evaluation kernels — the reference implements these ad hoc
  * in its Python harness (reference: tests/test_3_beir.py:224-277
  * recall/MRR/DCG, tests/test_8_CVE_db_sweep.py:112-157 MRR/MAP,
  * tests/test_2_CVE_db.py:159-243 rank correlation + tail analysis);
  * here they are first-class distributed operators.
  *
  * Conventions:
  *  - `retrieved`: (query_id, doc_id, rank) — rank 1-based, dense per
  *    query. Use [[withRanks]] to derive ranks from scores.
  *  - `relevant`: (query_id, doc_id[, grade]) — binary relevance when
  *    no grade column; graded for nDCG.
  *
  * All metrics aggregate per query then average — one shuffle per
  * join/agg, no driver-side loops, scales to any number of queries.
  */
object RankingMetrics {

  /** Attach dense 1-based ranks from a score column (desc, doc_id
    * tie-break).
    */
  def withRanks(scored: DataFrame, scoreCol: String = "score"): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(F.col(scoreCol).desc, F.col("doc_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
  }

  /** Recall@k per query and macro-averaged.
    * Output: (recall_at_k) single row.
    */
  def recallAtK(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    val hits = retrieved
      .where(F.col("rank") <= k)
      .join(relevant, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id")
      .agg(F.count(F.lit(1)).as("n_hits"))
    val totals = relevant.groupBy("query_id").agg(F.count(F.lit(1)).as("n_rel"))
    totals
      .join(hits, Seq("query_id"), "left")
      .select(
        F.col("query_id"),
        (F.coalesce(F.col("n_hits"), F.lit(0L)).cast("double") / F.col("n_rel")).as("recall"))
      .agg(F.round(F.avg("recall"), 6).as("recall_at_k"))
  }

  /** Mean Reciprocal Rank: 1/rank of the first relevant hit, averaged
    * over queries (0 when no hit).
    */
  def mrr(retrieved: DataFrame, relevant: DataFrame): DataFrame = {
    val firstHit = retrieved
      .join(relevant, Seq("query_id", "doc_id"), "left_semi")
      .groupBy("query_id")
      .agg(F.min("rank").as("first_rank"))
    val queries = retrieved.select("query_id").distinct()
    queries
      .join(firstHit, Seq("query_id"), "left")
      .select(
        F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)).as("rr"))
      .agg(F.round(F.avg("rr"), 6).as("mrr"))
  }

  /** nDCG@k with log2 discount; graded when `relevant` has a `grade`
    * column, binary otherwise (reference tests/test_3_beir.py:224-259).
    */
  def ndcgAtK(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    val rel =
      if (relevant.columns.contains("grade")) relevant
      else relevant.withColumn("grade", F.lit(1.0))
    val dcg = retrieved
      .where(F.col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(F.sum(
        (F.pow(F.lit(2.0), F.col("grade")) - 1.0) /
          F.log2(F.col("rank") + 1.0)).as("dcg"))
    val idealW = Window.partitionBy("query_id")
      .orderBy(F.col("grade").desc, F.col("doc_id").asc)
    val idcg = rel
      .withColumn("irank", F.row_number().over(idealW))
      .where(F.col("irank") <= k)
      .groupBy("query_id")
      .agg(F.sum(
        (F.pow(F.lit(2.0), F.col("grade")) - 1.0) /
          F.log2(F.col("irank") + 1.0)).as("idcg"))
    idcg
      .join(dcg, Seq("query_id"), "left")
      .select(
        (F.coalesce(F.col("dcg"), F.lit(0.0)) /
          F.when(F.col("idcg") === 0.0, 1.0).otherwise(F.col("idcg"))).as("ndcg"))
      .agg(F.round(F.avg("ndcg"), 6).as("ndcg_at_k"))
  }

  /** MAP@k — mean average precision (reference
    * tests/test_8_CVE_db_sweep.py:127-151).
    */
  def mapAtK(retrieved: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    val marked = retrieved
      .where(F.col("rank") <= k)
      .join(
        relevant.select("query_id", "doc_id").withColumn("is_rel", F.lit(1)),
        Seq("query_id", "doc_id"), "left")
      .withColumn("is_rel", F.coalesce(F.col("is_rel"), F.lit(0)))
    val w = Window.partitionBy("query_id").orderBy("rank")
    val ap = marked
      .withColumn("cum_hits", F.sum("is_rel").over(w))
      .where(F.col("is_rel") === 1)
      .withColumn("prec", F.col("cum_hits").cast("double") / F.col("rank"))
      .groupBy("query_id")
      .agg(F.sum("prec").as("sum_prec"))
    val totals = relevant.groupBy("query_id").agg(F.count(F.lit(1)).as("n_rel"))
    totals
      .join(ap, Seq("query_id"), "left")
      .select(
        (F.coalesce(F.col("sum_prec"), F.lit(0.0)) /
          F.least(F.col("n_rel"), F.lit(k)).cast("double")).as("ap"))
      .agg(F.round(F.avg("ap"), 6).as("map_at_k"))
  }

  /** Spearman rank correlation between two rankings of shared items
    * (reference tests/test_2_CVE_db.py:159-174). Inputs: two
    * (query_id, doc_id, rank) frames; ranks are re-densified over the
    * shared items per query.
    */
  def spearman(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = a.select("query_id", "doc_id", "rank").withColumnRenamed("rank", "ra")
      .join(b.select("query_id", "doc_id", "rank").withColumnRenamed("rank", "rb"),
        Seq("query_id", "doc_id"))
    val wa = Window.partitionBy("query_id").orderBy(F.col("ra").asc, F.col("doc_id").asc)
    val wb = Window.partitionBy("query_id").orderBy(F.col("rb").asc, F.col("doc_id").asc)
    val dense = shared
      .withColumn("da", F.row_number().over(wa).cast("double"))
      .withColumn("db", F.row_number().over(wb).cast("double"))
    dense
      .groupBy("query_id")
      .agg(F.corr("da", "db").as("rho"))
      .agg(F.round(F.avg("rho"), 6).as("spearman"))
  }

  /** Tail analysis (reference tests/test_2_CVE_db.py:201-243): mean
    * score of head ranks (1-3) vs tail ranks (4-maxRank), their ratio,
    * and the coefficient of variation — per query, macro-averaged.
    * Input: (query_id, doc_id, rank, score).
    */
  def tailAnalysis(retrieved: DataFrame, maxRank: Int = 20): DataFrame = {
    val in = retrieved.where(F.col("rank") <= maxRank)
    in.groupBy("query_id")
      .agg(
        F.avg(F.when(F.col("rank") <= 3, F.col("score"))).as("head_mean"),
        F.avg(F.when(F.col("rank") > 3, F.col("score"))).as("tail_mean"),
        (F.stddev_pop("score") / F.avg("score")).as("cv"))
      .withColumn("th_ratio", F.col("tail_mean") / F.col("head_mean"))
      .agg(
        F.round(F.avg("head_mean"), 6).as("head_mean"),
        F.round(F.avg("tail_mean"), 6).as("tail_mean"),
        F.round(F.avg("th_ratio"), 6).as("th_ratio"),
        F.round(F.avg("cv"), 6).as("cv"))
  }
}
