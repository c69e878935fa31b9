package graft

import graft.metrics.RankingMetrics._

/** Hand-computed goldens for the ranking-metric kernels
  * (semantics from reference tests/test_3_beir.py:224-277 and
  * tests/test_8_CVE_db_sweep.py:112-157).
  */
class MetricsSpec extends SparkSpec {

  // one query; retrieved a,b,c at ranks 1..3; relevant {b, d}
  lazy val retrieved = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3)).toDF("query_id", "doc_id", "rank")
  }
  lazy val relevant = {
    val s = spark
    import s.implicits._
    Seq((1L, "b"), (1L, "d")).toDF("query_id", "doc_id")
  }

  private def one(df: org.apache.spark.sql.DataFrame): Double =
    df.head.getDouble(0)

  test("recall@3 = 1/2") {
    assert(math.abs(one(recallAtK(retrieved, relevant, 3)) - 0.5) < 1e-9)
  }

  test("MRR = 1/2 (first hit at rank 2)") {
    assert(math.abs(one(mrr(retrieved, relevant)) - 0.5) < 1e-9)
  }

  test("binary nDCG@3 = (1/log2 3) / (1 + 1/log2 3)") {
    val dcg = 1.0 / (math.log(3.0) / math.log(2.0))
    val idcg = 1.0 + dcg
    assert(math.abs(one(ndcgAtK(retrieved, relevant, 3)) - dcg / idcg) < 1e-6)
  }

  test("MAP@3 = 0.25 (one hit, prec 1/2, over min(nRel,k)=2)") {
    assert(math.abs(one(mapAtK(retrieved, relevant, 3)) - 0.25) < 1e-9)
  }

  test("spearman of identical rankings is 1, reversed is -1") {
    val s = spark
    import s.implicits._
    val r1 = Seq((1L, "a", 1), (1L, "b", 2), (1L, "c", 3)).toDF("query_id", "doc_id", "rank")
    val r2 = Seq((1L, "a", 3), (1L, "b", 2), (1L, "c", 1)).toDF("query_id", "doc_id", "rank")
    assert(math.abs(one(spearman(r1, r1)) - 1.0) < 1e-9)
    assert(math.abs(one(spearman(r1, r2)) + 1.0) < 1e-9)
  }

  test("withRanks densifies by score desc") {
    val s = spark
    import s.implicits._
    val scored = Seq((1L, "x", 0.3), (1L, "y", 0.9), (1L, "z", 0.5))
      .toDF("query_id", "doc_id", "score")
    val ranked = withRanks(scored).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getInt(3))).toSeq
    assert(ranked == Seq(("y", 1), ("z", 2), ("x", 3)))
  }

  test("tail analysis on monotone scores: th_ratio < 1") {
    val s = spark
    import s.implicits._
    val scored = (1 to 20).map(r => (1L, s"d$r", r, 1.0 / r))
      .toDF("query_id", "doc_id", "rank", "score")
    val row = tailAnalysis(scored).head
    assert(row.getDouble(2) < 1.0) // th_ratio
  }
}
