package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.{functions => F}

class BloomJoinSpec extends SparkSpec {

  lazy val big = {
    val s = spark
    import s.implicits._
    (0L until 5000L).map(i => (i, s"v$i", i % 7)).toDF("k", "payload", "grp")
  }

  lazy val small = {
    val s = spark
    import s.implicits._
    // every 13th key, plus keys the big side doesn't have at all
    ((0L until 5000L by 13L) ++ (9000L until 9050L)).map(k => (k, "x"))
      .toDF("k", "tag")
  }

  test("semiJoin is bit-identical to the plain left-semi join") {
    val got = BloomJoin.semiJoin(big, small, "k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = big.join(small.select("k"), Seq("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("antiJoin is bit-identical to the plain left-anti join; nulls kept") {
    val s = spark
    import s.implicits._
    val withNull = big.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "nullrow", 0L))
        .toDF("k", "payload", "grp").select(
          F.col("k").cast("long"), F.col("payload"), F.col("grp")))
    val got = BloomJoin.antiJoin(withNull, small, "k")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    val want = withNull.join(small.select("k"), Seq("k"), "left_anti")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(got == want)
    assert(got.exists(_._2 == "nullrow"),
      "a null-key row matches nothing and must be KEPT by the anti join")
  }

  test("string keys probe through UTF-8 bytes consistently") {
    val s = spark
    import s.implicits._
    val bigS = (0 until 2000).map(i => (s"key_$i", i)).toDF("k", "v")
    val smallS = (0 until 2000 by 11).map(i => (s"key_$i", 0)).toDF("k", "z")
    val got = BloomJoin.semiJoin(bigS, smallS, "k")
      .collect().map(_.getString(0)).toSet
    val want = bigS.join(smallS.select("k"), Seq("k"), "left_semi")
      .collect().map(_.getString(0)).toSet
    assert(got == want && got.size == smallS.count())
  }

  test("plan shape: the Bloom probe filters the big side BELOW the join") {
    // a LocalRelation would eagerly fold the probe away at optimize
    // time (ConvertToLocalRelation) — the claim under test is about a
    // real scan, so park the big side on parquet first
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    big.write.mode("overwrite").parquet(dir)
    val bigP = spark.read.parquet(dir)
    val plan = BloomJoin.semiJoin(bigP, small, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_contains"),
      s"probe expression missing from the plan:\n${plan.take(1200)}")
    // the probe must sit under the join (prefilter), not above it —
    // in the tree string the join node prints before its children
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("graft_bloom_contains")
    assert(joinAt >= 0 && probeAt > joinAt,
      "probe should appear inside the join's left subtree (printed after the join node)")
  }

  test("no false negatives ever: every true member passes the probe at any fpp") {
    // even a deliberately tiny/over-saturated filter may only ADD
    // false positives, never lose members — semi-join output is
    // invariant in fpp
    val loose = BloomJoin.semiJoin(big, small, "k", expectedItems = 4, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    val tight = BloomJoin.semiJoin(big, small, "k", fpp = 0.0001)
      .collect().map(_.getLong(0)).toSet
    val want = big.join(small.select("k"), Seq("k"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(loose == want && tight == want)
  }

  test("validation: unsupported key type and bad fpp fail fast") {
    val e1 = intercept[IllegalArgumentException](
      BloomJoin.semiJoin(big, small.select(F.col("k").cast("int")), "k"))
    assert(e1.getMessage.contains("BIGINT or STRING"))
    val e2 = intercept[IllegalArgumentException](
      BloomJoin.semiJoin(big, small, "k", fpp = 1.5))
    assert(e2.getMessage.contains("fpp"))
  }
}
