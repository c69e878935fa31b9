package graft

import graft.operators.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.{functions => F}

class TimeSeriesSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")

  test("resampleGapFill: dense per-key grid, forward-filled across gaps") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("a", ts(0, 10), 1.0), ("a", ts(0, 50), 2.0), // hour 0: sum 3.0
      ("a", ts(3, 5), 7.0),                         // hours 1,2 are gaps
      ("b", ts(9, 0), 5.0)                          // single-bucket key
    ).toDF("k", "t", "v")
    val out = TimeSeries.resampleGapFill(events, "k", "t", "v")
      .orderBy("k", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.length == 4, "span 0..3 inclusive = 4 hourly buckets")
    // (n_events, sum_value, filled_value, is_gap) per bucket
    val got = a.map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getBoolean(5))).toSeq
    assert(got == Seq(
      (2L, 3.0, 3.0, false),
      (0L, 0.0, 3.0, true),   // gap carries hour 0's sum forward
      (0L, 0.0, 3.0, true),
      (1L, 7.0, 7.0, false)), got.toString)
    // key spans are independent: b has exactly its one active bucket
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b.head.getDouble(4) == 5.0 &&
      !b.head.getBoolean(5))
  }

  test("resampleGapFill: other bucket widths via date_trunc unit") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("a", Timestamp.valueOf("2024-03-01 00:00:00"), 1.0),
      ("a", Timestamp.valueOf("2024-03-03 12:00:00"), 2.0)
    ).toDF("k", "t", "v")
    val days = TimeSeries.resampleGapFill(events, "k", "t", "v",
      bucket = "day").orderBy("bucket_ts").collect()
    assert(days.length == 3)
    assert(days.map(_.getBoolean(5)).toSeq == Seq(false, true, false))
  }

  test("funnelStages: ordered strictly-after semantics per key") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      ("a", ts(1), "view"), ("a", ts(2), "click"), ("a", ts(3), "purchase"),
      // click BEFORE the first view does not count
      ("b", ts(2), "view"), ("b", ts(1), "click"),
      // purchase without an intervening click stays unreached
      ("c", ts(2), "view"), ("c", ts(3), "purchase"),
      // no view at all: absent from the funnel
      ("d", ts(1), "click"),
      // simultaneous events are not strictly after
      ("e", ts(1), "view"), ("e", ts(1), "click"),
      // earliest-first: the 2nd view is ignored, click@3 counts
      ("f", ts(1), "view"), ("f", ts(4), "view"), ("f", ts(3), "click")
    ).toDF("k", "t", "typ")
    val out = TimeSeries.funnelStages(ev, "k", "t", "typ",
      Seq("view", "click", "purchase"))
      .orderBy("k").collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out == Map("a" -> 3L, "b" -> 1L, "c" -> 1L, "e" -> 1L,
      "f" -> 2L), out.toString)
    intercept[IllegalArgumentException](
      TimeSeries.funnelStages(ev, "k", "t", "typ", Seq.empty))
    intercept[IllegalArgumentException](
      TimeSeries.funnelStages(ev, "k", "t", "typ", Seq("view", "view")))
  }
}
