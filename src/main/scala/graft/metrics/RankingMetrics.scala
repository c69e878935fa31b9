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
    // the query universe is the JUDGED set (same as recall/nDCG/MAP):
    // a judged query with zero retrieved rows scores 0, it does not
    // shrink the denominator and silently inflate the average
    val queries = relevant.select("query_id").distinct()
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
    // zero denominators yield null (averaged away), not an ANSI
    // DIVIDE_BY_ZERO that kills the job on one all-zero-score query
    def safeDiv(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      F.when(den === 0.0, F.lit(null)).otherwise(num / den)
    in.groupBy("query_id")
      .agg(
        F.avg(F.when(F.col("rank") <= 3, F.col("score"))).as("head_mean"),
        F.avg(F.when(F.col("rank") > 3, F.col("score"))).as("tail_mean"),
        safeDiv(F.stddev_pop("score"), F.avg("score")).as("cv"))
      .withColumn("th_ratio", safeDiv(F.col("tail_mean"), F.col("head_mean")))
      .agg(
        F.round(F.avg("head_mean"), 6).as("head_mean"),
        F.round(F.avg("tail_mean"), 6).as("tail_mean"),
        F.round(F.avg("th_ratio"), 6).as("th_ratio"),
        F.round(F.avg("cv"), 6).as("cv"))
  }

  /** Kendall τ-b between two rankings of the shared items per query,
    * macro-averaged (reference tests/test_2_CVE_db.py:171 —
    * scipy.stats.kendalltau, which is τ-b: tie-corrected). Inputs: two
    * (query_id, doc_id, rank) frames. The pair enumeration is an
    * equi-join on query_id with doc_i < doc_j — per-query-quadratic in
    * LIST length (lists are ≤ k items), linear in #queries.
    */
  def kendallTau(a: DataFrame, b: DataFrame): DataFrame = {
    val shared = a.select("query_id", "doc_id", "rank").withColumnRenamed("rank", "ra")
      .join(b.select("query_id", "doc_id", "rank").withColumnRenamed("rank", "rb"),
        Seq("query_id", "doc_id"))
    val x = shared.select(
      F.col("query_id"), F.col("doc_id").as("di"),
      F.col("ra").as("rai"), F.col("rb").as("rbi"))
    val y = shared.select(
      F.col("query_id"), F.col("doc_id").as("dj"),
      F.col("ra").as("raj"), F.col("rb").as("rbj"))
    val pairs = x.join(y, Seq("query_id")).where(F.col("di") < F.col("dj"))
      .withColumn("sa", F.signum(F.col("rai") - F.col("raj")))
      .withColumn("sb", F.signum(F.col("rbi") - F.col("rbj")))
    val counts = pairs.groupBy("query_id").agg(
      F.sum(F.when(F.col("sa") * F.col("sb") > 0, 1).otherwise(0)).as("c"),
      F.sum(F.when(F.col("sa") * F.col("sb") < 0, 1).otherwise(0)).as("d"),
      F.sum(F.when(F.col("sa") === 0, 1).otherwise(0)).as("ta"),
      F.sum(F.when(F.col("sb") === 0, 1).otherwise(0)).as("tb"),
      F.count(F.lit(1)).as("n0"))
    counts
      .withColumn("den",
        F.sqrt((F.col("n0") - F.col("ta")).cast("double") *
          (F.col("n0") - F.col("tb")).cast("double")))
      .withColumn("tau",
        F.when(F.col("den") === 0.0, 0.0)
          .otherwise((F.col("c") - F.col("d")).cast("double") / F.col("den")))
      .agg(F.round(F.avg("tau"), 6).as("kendall"))
  }

  /** Paired two-sided t-test between two per-observation measures
    * (reference tests/test_3_beir.py:358-381 — scipy.stats.ttest_rel
    * on per-query metric arrays): t = mean(d) / (sd(d)/√n) over
    * d = x − y, df = n−1, p from the Student-t CDF. The aggregation is
    * one distributed pass; the p-value is a driver-side scalar via the
    * regularized incomplete beta.
    * Output: (n, t_stat, dof, p_value).
    */
  def pairedTTest(pairsDf: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = pairsDf.sparkSession
    import spark.implicits._
    val agg = pairsDf
      .select((F.col(xCol) - F.col(yCol)).cast("double").as("diff"))
      .agg(
        F.count(F.lit(1)).as("n"),
        F.avg("diff").as("mean"),
        F.stddev_samp("diff").as("sd"))
      .head
    val n = agg.getLong(0)
    require(n >= 2, s"paired t-test needs >= 2 observations, got $n")
    val mean = agg.getDouble(1)
    val sd = agg.getDouble(2)
    val dof = (n - 1).toDouble
    val t = if (sd == 0.0) {
      if (mean == 0.0) 0.0 else Double.PositiveInfinity * math.signum(mean)
    } else mean / (sd / math.sqrt(n.toDouble))
    val p = twoSidedTPValue(t, dof)
    Seq((n, t, dof, p)).toDF("n", "t_stat", "dof", "p_value")
  }

  /** Two-sided p-value for Student's t: p = I_{df/(df+t²)}(df/2, 1/2)
    * (regularized incomplete beta). */
  def twoSidedTPValue(t: Double, dof: Double): Double = {
    if (t.isInfinite) return 0.0
    if (t == 0.0) return 1.0
    regIncompleteBeta(dof / 2.0, 0.5, dof / (dof + t * t))
  }

  /** Regularized incomplete beta I_x(a,b) via the standard continued-
    * fraction expansion (modified Lentz), accurate to ~1e-12. */
  private def regIncompleteBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0.0) return 0.0
    if (x >= 1.0) return 1.0
    val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
    val front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
    if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(a, b, x) / a
    else 1.0 - front * betaCf(b, a, 1.0 - x) / b
  }

  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val eps = 1e-14
    val fpmin = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1.0)
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((a + m2 - 1.0) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1.0))
      d = 1.0 + aa * d
      if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c
      if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  /** Lanczos log-gamma (g=7, n=9), |err| < 1e-13 for positive args. */
  private def logGamma(xIn: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    val x = xIn - 1.0
    var acc = g(0)
    var i = 1
    while (i < 9) { acc += g(i) / (x + i); i += 1 }
    val t = x + 7.5
    0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(acc)
  }
}
