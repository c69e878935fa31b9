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

  test("anomalyZScore: spike scored against trailing baseline that excludes it") {
    val s = spark
    import s.implicits._
    // 8 steady hours at 10, then a 100-spike: baseline of the spike
    // row is the 8 steady values only (self excluded)
    val series = ((0 until 8).map(h => ("a", ts(h), 10.0)) :+ ("a", ts(8), 100.0))
      .toDF("k", "t", "v")
    val out = TimeSeries.anomalyZScore(series, "k", "t", "v",
      trailing = 24, minPoints = 8, zThreshold = 2.0)
      .orderBy("t").collect()
    // steady prefix: fewer than minPoints predecessors OR zero
    // variance -> null z, never flagged
    assert(out.take(8).forall(r => r.isNullAt(r.fieldIndex("z")) &&
      !r.getBoolean(r.fieldIndex("is_anomaly"))))
    val spike = out.last
    // baseline is constant 10 -> sd = 0 -> no evidence, null z... but
    // with 8 identical predecessors stddev_samp = 0, so z stays null:
    assert(spike.isNullAt(spike.fieldIndex("z")),
      "zero-variance baseline must yield null z, not infinity")
  }

  test("anomalyZScore: z matches the closed form and flags only the spike") {
    val s = spark
    import s.implicits._
    // alternating 9/11 baseline (mean 10, sd_samp = sqrt(8/7*1)) then
    // a spike at 20 and a normal 10
    val vals = (0 until 8).map(h => if (h % 2 == 0) 9.0 else 11.0)
    val series = (vals.zipWithIndex.map { case (v, h) => ("a", ts(h), v) } ++
      Seq(("a", ts(8), 20.0), ("a", ts(9), 10.0))).toDF("k", "t", "v")
    val out = TimeSeries.anomalyZScore(series, "k", "t", "v",
      trailing = 24, minPoints = 8, zThreshold = 2.0)
      .orderBy("t").collect()
    val spike = out(8)
    val sd = math.sqrt(8.0 / 7.0)  // samp variance of 4x9, 4x11
    val expected = BigDecimal((20.0 - 10.0) / sd)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(spike.getDouble(spike.fieldIndex("z")) == expected &&
      spike.getBoolean(spike.fieldIndex("is_anomaly")),
      s"spike z=${spike.getDouble(spike.fieldIndex("z"))} want $expected")
    // the row after the spike: baseline now contains the spike (rows
    // -24..-1), sd inflated, 10 is not anomalous
    val after = out(9)
    assert(!after.getBoolean(after.fieldIndex("is_anomaly")))
    // per-key isolation: an unrelated key's rows never enter the frame
    val twoKeys = series.union(Seq(("b", ts(8), 1e6)).toDF("k", "t", "v"))
    val a8 = TimeSeries.anomalyZScore(twoKeys, "k", "t", "v",
      trailing = 24, minPoints = 8, zThreshold = 2.0)
      .where(F.col("k") === "a" && F.col("t") === ts(8)).head
    assert(a8.getDouble(a8.fieldIndex("z")) == expected)
  }

  test("anomalyZScore: rejects input columns that collide with its output") {
    val s = spark
    import s.implicits._
    // withColumn would silently overwrite a same-named input column —
    // the guard must raise instead
    val series = Seq(("a", ts(0), 1.0, 9.9))
      .toDF("k", "t", "v", "z")
    val e = intercept[IllegalArgumentException](
      TimeSeries.anomalyZScore(series, "k", "t", "v"))
    assert(e.getMessage.contains("z"), e.getMessage)
    assert(e.getMessage.contains("overwritten"), e.getMessage)
    // case-INSENSITIVE: withColumn resolves case-insensitively under
    // the default spark.sql.caseSensitive=false, so "Z" collides too
    val upper = Seq(("a", ts(0), 1.0, 9.9)).toDF("k", "t", "v", "Z")
    intercept[IllegalArgumentException](
      TimeSeries.anomalyZScore(upper, "k", "t", "v"))
  }
}
