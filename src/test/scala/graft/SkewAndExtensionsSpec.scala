package graft

import graft.scale.Skew
import org.apache.spark.sql.{SparkSession, functions => F}

class SkewAndExtensionsSpec extends SparkSpec {

  test("salted top-k per key equals plain window top-k") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(9)
    val df = (1 to 5000).map { i =>
      (i % 7L, rng.nextDouble(), i.toLong)
    }.toDF("key", "dist", "dst")
    val plain = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("key").orderBy(F.col("dist").asc, F.col("dst").asc)
      df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5).drop("rn")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    }
    val salted = Skew.saltedTopKPerKey(
      df, "key", Seq(F.col("dist").asc, F.col("dst").asc), 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("heap top-k per key: bit-identical to the salted window form; ObjectHashAggregate plan") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    // duplicate scores across ties + a hot key exercise the tiebreak
    // and the bounded-heap admission on every path
    // duplicate scores, a hot key, AND NaN scores: the heap comparator
    // must match Spark's double ordering (NaN above everything, -0.0 ==
    // 0.0) or a NaN row could permanently displace a real candidate
    val df = (1 to 8000).map { i =>
      val key = if (i % 3 == 0) 0L else i % 11L
      val score =
        if (i % 500 == 0) Double.NaN
        else math.round(rng.nextDouble() * 50) / 50.0
      (key, score, i.toLong)
    }.toDF("qid", "score", "id").repartition(16)
    for (desc <- Seq(true, false); k <- Seq(1, 7, 100000)) {
      val order =
        if (desc) Seq(F.col("score").desc, F.col("id").asc)
        else Seq(F.col("score").asc, F.col("id").asc)
      val want = Skew.saltedTopKPerKey(df, "qid", order, k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val got = Skew.heapTopKPerKey(df, "qid", "score", "id", k, desc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"heap top-k diverged at desc=$desc k=$k")
    }
    // best-first output order within each key (the window convention)
    val rows = Skew.heapTopKPerKey(df, "qid", "score", "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // best-first under SPARK's double order (NaN above everything —
    // scala's TotalOrdering would sort it last and disagree)
    def sparkBetter(a: (Long, Long, Double), b: (Long, Long, Double)): Boolean = {
      val c = if (a._3 == b._3) 0 else java.lang.Double.compare(a._3, b._3)
      if (c != 0) c > 0 else a._2 < b._2
    }
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.toSeq == g.toSeq.sortWith(sparkBetter),
        s"within-key order not best-first: ${g.toSeq}")
    }
    // the point of the operator: per-partition heaps reduce the map
    // output BEFORE any exchange, and only ONE window (over the ≤
    // keys × partitions × k survivors) remains — vs the salted form's
    // two windows over the full candidate mass
    val plan = Skew.heapTopKPerKey(df, "qid", "score", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      s"expected the heap mapPartitions stage in:\n$plan")
    assert("[+:]- Window \\[".r.findAllIn(plan).size == 1,
      s"expected exactly one Window node in:\n$plan")
  }

  test("heap top-k fuzz: random frames, partitionings, k and direction agree with the window form") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(97)
    for (trial <- 1 to 5) {
      val n = 500 + rng.nextInt(4000)
      val nKeys = 1 + rng.nextInt(40)
      val k = 1 + rng.nextInt(12)
      val desc = rng.nextBoolean()
      val parts = 1 + rng.nextInt(24)
      val df = (1 to n).map { i =>
        (rng.nextInt(nKeys).toLong,
          math.round(rng.nextDouble() * 30) / 30.0, i.toLong)
      }.toDF("key", "score", "tie").repartition(parts)
      val order =
        if (desc) Seq(F.col("score").desc, F.col("tie").asc)
        else Seq(F.col("score").asc, F.col("tie").asc)
      val want = Skew.saltedTopKPerKey(df, "key", order, k)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val got = Skew.heapTopKPerKey(df, "key", "score", "tie", k, desc)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"trial $trial: n=$n keys=$nKeys k=$k desc=$desc parts=$parts")
    }
  }

  test("GraftExtensions applies cleanly; registerAll covers the live-session path") {
    // Extensions bind at session construction (verified end-to-end via
    // spark-shell --conf spark.sql.extensions=graft.GraftExtensions);
    // a shared-session suite can only exercise the apply() wiring and
    // the runtime registration path.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.VectorFunctions.registerAll(spark)
    val row = spark.sql(
      "SELECT graft_cosine(array(1.0,0.0), array(1.0,1.0)) AS c, " +
        "graft_dot(array(1.0,2.0), array(3.0,4.0)) AS d, " +
        "graft_l2norm(array(3.0,4.0)) AS n").head
    assert(math.abs(row.getDouble(0) - math.sqrt(0.5)) < 1e-12)
    assert(row.getDouble(1) == 11.0)
    assert(row.getDouble(2) == 5.0)
    // SQ8 kernels are SQL citizens too: encode to BINARY, score the
    // codes asymmetrically — round-trips the quantizer in pure SQL
    val sq8 = spark.sql(
      "SELECT graft_sq8_cosine(" +
        "graft_sq8_encode(array(0.5,1.0), array(0.0,0.0), array(1.0,2.0)), " +
        "array(0.5,1.0), array(0.0,0.0), array(1.0,2.0)) AS c, " +
        "length(graft_sq8_encode(array(0.5,1.0), array(0.0,0.0), " +
        "array(1.0,2.0))) AS w").head
    assert(math.abs(sq8.getDouble(0) - 1.0) < 1e-6, sq8.toString)
    assert(sq8.getInt(1) == 2)
  }

  test("Skew.report: ranks, shares, cumulative shares, visible NULL keys") {
    val s = spark
    import s.implicits._
    // 100 rows: key A×50, B×30, C×15, null×5
    val df = (Seq.fill(50)("A") ++ Seq.fill(30)("B") ++ Seq.fill(15)("C") ++
        Seq.fill[String](5)(null)).toDF("k")
    val rows = graft.scale.Skew.report(df, "k", topN = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (1, "A", 50L, 0.5, 0.5),
      (2, "B", 30L, 0.3, 0.8),
      (3, "C", 15L, 0.15, 0.95)))
    // null keys surface as the literal "NULL" when topN covers them
    val all = graft.scale.Skew.report(df, "k", topN = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(all("NULL") == 5L)
  }

  test("heavyTokens: exact output, invariant under repartitioning") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(7)
    // zipf-ish: token t_i appears ~ 1/(i+1) — a few heavy, long tail
    val docs = (0 until 300).map { d =>
      val words = (0 until 40).map { _ =>
        val r = rng.nextDouble()
        val i = math.min(99, (1.0 / (r + 0.01)).toInt)
        s"t$i"
      }
      (d.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val brute = docs
      .select(org.apache.spark.sql.functions.explode(
        graft.operators.TextOps.tokens(
          org.apache.spark.sql.functions.col("text"))).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = brute.values.sum
    val minCount = math.ceil(0.01 * total).toLong
    val want = brute.filter(_._2 >= minCount)
    for (parts <- Seq(1, 7, 32)) {
      val got = graft.operators.TextOps
        .heavyTokens(docs.repartition(parts), phi = 0.01)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"parts=$parts: ${got.keySet diff want.keySet} extra, " +
          s"${want.keySet diff got.keySet} missing")
    }
  }
}
