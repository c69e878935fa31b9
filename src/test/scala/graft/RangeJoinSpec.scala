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
}
