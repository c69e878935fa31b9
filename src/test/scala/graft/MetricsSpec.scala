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

  test("Kendall tau-b golden: [1,2,3,4,5] vs [1,3,2,5,4] = 0.6") {
    val sp = spark
    import sp.implicits._
    val a = (1 to 5).map(i => (1L, s"d$i", i)).toDF("query_id", "doc_id", "rank")
    val b = Seq(1, 3, 2, 5, 4).zipWithIndex
      .map { case (r, i) => (1L, s"d${i + 1}", r) }.toDF("query_id", "doc_id", "rank")
    // 10 pairs, discordant: (d2,d3) and (d4,d5) -> tau = (8-2)/10
    assert(math.abs(one(kendallTau(a, b)) - 0.6) < 1e-9)
    assert(math.abs(one(kendallTau(a, a)) - 1.0) < 1e-9)
  }

  test("Kendall tau-b tie correction: ties shrink the denominator") {
    val sp = spark
    import sp.implicits._
    val a = (1 to 4).map(i => (1L, s"d$i", i)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, "d1", 1), (1L, "d2", 1), (1L, "d3", 2), (1L, "d4", 3))
      .toDF("query_id", "doc_id", "rank")
    // n0=6, tb=1 (pair d1-d2 tied in b), C=5, D=0:
    // tau-b = 5 / sqrt(6*5)
    assert(math.abs(one(kendallTau(a, b)) - 5.0 / math.sqrt(30.0)) < 1e-6)
  }

  test("paired t-test golden: diffs [1,2,3,4] -> t = 2.5/(sqrt(5/3)/2), df = 3") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1.0, 0.0), (2.0, 0.0), (3.0, 0.0), (4.0, 0.0)).toDF("x", "y")
    val r = pairedTTest(df, "x", "y").head
    val tWant = 2.5 / (math.sqrt(5.0 / 3.0) / 2.0)
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - tWant) < 1e-12, s"t=${r.getDouble(1)}")
    assert(r.getDouble(2) == 3.0)
    // closed form for df=3: F(t) = 1/2 + (arctan(x) + x/(1+x^2))/pi, x = t/sqrt(3)
    val x = tWant / math.sqrt(3.0)
    val pWant = 2.0 * (1.0 - (0.5 + (math.atan(x) + x / (1.0 + x * x)) / math.Pi))
    assert(math.abs(r.getDouble(3) - pWant) < 1e-10, s"p=${r.getDouble(3)} want $pWant")
  }

  test("student-t p-value matches df=1 (Cauchy) and df=2 closed forms") {
    for (t <- Seq(0.3, 1.0, 2.2281388519649385, 5.0)) {
      val p1 = 2.0 * (1.0 - (0.5 + math.atan(t) / math.Pi))
      assert(math.abs(twoSidedTPValue(t, 1.0) - p1) < 1e-10,
        s"df=1 t=$t: ${twoSidedTPValue(t, 1.0)} vs $p1")
      val p2 = 1.0 - t / math.sqrt(2.0 + t * t)
      assert(math.abs(twoSidedTPValue(t, 2.0) - p2) < 1e-10,
        s"df=2 t=$t: ${twoSidedTPValue(t, 2.0)} vs $p2")
    }
    // symmetric in t; 1 at t=0
    assert(twoSidedTPValue(0.0, 7.0) == 1.0)
    assert(math.abs(twoSidedTPValue(-2.0, 9.0) - twoSidedTPValue(2.0, 9.0)) < 1e-14)
  }
}
