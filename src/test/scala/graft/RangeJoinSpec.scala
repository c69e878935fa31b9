package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.{functions => F}

/** Bucketed range join vs the brute-force inequality definition:
  * the 3-bucket probe must find exactly the pairs |Δt| ≤ tolerance,
  * including pairs that straddle a bucket boundary.
  */
class RangeJoinSpec extends SparkSpec {

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")

  test("range join equals the brute-force inequality join on random data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(31)
    val left = (0 until 150).map(i => (i.toLong, rng.nextInt(4).toLong, ts(rng.nextInt(3000))))
      .toDF("lid", "k", "t")
    val right = (0 until 150).map(i => (1000L + i, rng.nextInt(4).toLong, ts(rng.nextInt(3000))))
      .toDF("rid", "k", "t")
    val got = RangeJoin
      .rangeJoin(left, right, "k", "t", "t", Seq("rid"), toleranceSec = 60)
      .select("lid", "r_rid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lRows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val rRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val want = (for {
      (lid, lk, lt) <- lRows; (rid, rk, rt) <- rRows
      if lk == rk && math.abs(lt - rt) <= 60000L
    } yield (lid, rid)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("boundary inclusion: a pair exactly at the tolerance matches") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, ts(100))).toDF("lid", "k", "t")
    val right = Seq((2L, 7L, ts(40)), (3L, 7L, ts(161))).toDF("rid", "k", "t")
    val got = RangeJoin.rangeJoin(left, right, "k", "t", "t", Seq("rid"), 60L)
      .select("r_rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L), s"exactly-at-tolerance must match, 61s must not: $got")
  }

  test("interval overlap join equals the brute-force inequality join, exactly once per pair") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(97)
    def mk(base: Long) = (0 until 120).map { i =>
      val st = rng.nextInt(2400)
      (base + i, rng.nextInt(4).toLong, ts(st), ts(st + 1 + rng.nextInt(300)))
    }
    val left = mk(0L).toDF("lid", "k", "s", "e")
    val right = mk(1000L).toDF("rid", "k", "s", "e")
    // width (60 s) much smaller than the longest interval (300 s): every
    // pair shares many buckets, so this exercises the emit-once guard,
    // not just correctness of the candidate set
    val gotRows = RangeJoin
      .intervalOverlapJoin(left, right, "k", "s", "e", "s", "e", Seq("rid"), 60L)
      .select("lid", "r_rid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = gotRows.toSet
    assert(gotRows.length == got.size,
      s"duplicate pair emissions: ${gotRows.length} rows, ${got.size} distinct")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getTimestamp(3).getTime))
    val want = (for {
      (lid, lk, ls, le) <- rows(left); (rid, rk, rs, re) <- rows(right)
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("interval overlap: touching endpoints count; disjoint do not") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, ts(100), ts(200))).toDF("lid", "k", "s", "e")
    val right = Seq(
      (2L, 7L, ts(200), ts(300)),  // touches at e1 == s2 -> overlap
      (3L, 7L, ts(201), ts(300)),  // gap of 1 s -> no
      (4L, 7L, ts(0), ts(100)),    // touches at s1 == e2 -> overlap
      (5L, 8L, ts(100), ts(200))   // wrong key -> no
    ).toDF("rid", "k", "s", "e")
    val got = RangeJoin
      .intervalOverlapJoin(left, right, "k", "s", "e", "s", "e", Seq("rid"), 60L)
      .select("r_rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 4L), s"inclusive-touch semantics violated: $got")
  }

  test("interval overlap: over-long interval trips the fan-out guard") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, ts(0), ts(2900))).toDF("lid", "k", "s", "e")
    val right = Seq((2L, 7L, ts(10), ts(20))).toDF("rid", "k", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlapJoin(
        left, right, "k", "s", "e", "s", "e", Seq("rid"), 60L, maxBucketsPerRow = 10)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxBucketsPerRow")), s"wrong error: $e")
  }

  test("interval overlap candidate join is an equi-join, never a cartesian") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, ts(100), ts(200))).toDF("lid", "k", "s", "e")
    val right = Seq((2L, 7L, ts(150), ts(250))).toDF("rid", "k", "s", "e")
    val plan = RangeJoin
      .intervalOverlapJoin(left, right, "k", "s", "e", "s", "e", Seq("rid"), 60L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"expected pure equi-join plan, got:\n$plan")
  }
}
