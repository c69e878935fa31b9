package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{functions => F}

/** Hand-computed goldens for the as-of join: inclusive match at equal
  * timestamps, NULL when no prior right row, per-key isolation, and
  * the tolerance horizon.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")

  lazy val left = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts(10), "l-a"), // after r@5 -> 50.0
      (1L, ts(20), "l-b"), // after r@20 (inclusive) -> 200.0
      (1L, ts(3), "l-c"),  // before any right row -> null
      (2L, ts(30), "l-d")  // key 2 has no right rows -> null
    ).toDF("k", "t", "name")
  }

  lazy val right = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts(5), 50.0),
      (1L, ts(20), 200.0),
      (1L, ts(25), 250.0),
      (3L, ts(1), 999.0)
    ).toDF("k", "t", "v")
  }

  test("as-of join picks the most recent prior row, inclusively, per key") {
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("l-a") == Some(50.0))
    assert(out("l-b") == Some(200.0), s"equal-ts match must be inclusive: $out")
    assert(out("l-c") == None)
    assert(out("l-d") == None)
  }

  test("a matched row's NULL payload stays NULL (no older value leaks forward)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 7L, ts(10), "probe")).toDF("lid", "k", "t", "name")
    val r = Seq(
      (7L, ts(5), Some(50.0)),
      (7L, ts(8), None: Option[Double]) // the matched row — payload NULL
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asofJoin(l, r, "k", "t", "t", Seq("v")).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("asof_v")),
      s"matched row's NULL payload must not be replaced by an older value: ${out.head}")
  }

  test("multi-column payloads always come from the same matched row") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 7L, ts(10), "probe")).toDF("lid", "k", "t", "name")
    val r = Seq(
      (7L, ts(5), Some(50.0), Some("old")),
      (7L, ts(8), None: Option[Double], Some("new"))
    ).toDF("k", "t", "v", "tag")
    val out = AsOfJoin.asofJoin(l, r, "k", "t", "t", Seq("v", "tag")).collect().head
    assert(out.isNullAt(out.fieldIndex("asof_v")))
    assert(out.getString(out.fieldIndex("asof_tag")) == "new",
      s"columns must come from the ts=8 row together: $out")
  }

  test("tolerance horizon is microsecond-exact at the boundary") {
    val s = spark
    import s.implicits._
    val t10_9 = new java.sql.Timestamp(ts(10).getTime + 900) // 00:00:10.900
    val t6_1 = new java.sql.Timestamp(ts(6).getTime + 100)   // 00:00:06.100
    val l = Seq((1L, 7L, t10_9, "probe")).toDF("lid", "k", "t", "name")
    val r = Seq((7L, t6_1, 50.0)).toDF("k", "t", "v")
    // true age 4.8s > 4s tolerance: must be nulled even though the
    // second-truncated delta is 10 - 6 = 4
    val out = AsOfJoin.asofJoinWithin(l, r, "k", "t", "t", Seq("v"), 4L).collect().head
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      s"4.8s-old match must be stale at 4s tolerance: $out")
  }

  test("tolerance horizon nulls out stale matches") {
    val out = AsOfJoin
      .asofJoinWithin(left, right, "k", "t", "t", Seq("v"), toleranceSec = 4)
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    // l-a at t=10 matches r@5: age 5s > 4s tolerance -> nulled
    assert(out("l-a") == None, s"stale match must be nulled: $out")
    // l-b at t=20 matches r@20: age 0 -> kept
    assert(out("l-b") == Some(200.0))
  }

  test("as-of enrichment matches a per-row reference scan on random data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    val l = (0 until 200).map(i => (rng.nextInt(5).toLong, ts(rng.nextInt(60)), s"l$i")).toDF("k", "t", "name")
    val r = (0 until 100).map(i => (rng.nextInt(5).toLong, ts(rng.nextInt(60)), i.toDouble)).toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(l, r, "k", "t", "t", Seq("v"))
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    val rRows = r.collect().map(x => (x.getLong(0), x.getTimestamp(1), x.getDouble(2)))
    val lRows = l.collect().map(x => (x.getLong(0), x.getTimestamp(1), x.getString(2)))
    lRows.foreach { case (k, t, name) =>
      val cands = rRows.filter(rr => rr._1 == k && !rr._2.after(t))
      val want =
        if (cands.isEmpty) None
        else Some(cands.maxBy(c => (c._2.getTime, c._3))._3)
      // ties on timestamp: any of the tied values is acceptable
      val tiedVals = if (cands.isEmpty) Set.empty[Double] else {
        val maxT = cands.map(_._2.getTime).max
        cands.filter(_._2.getTime == maxT).map(_._3).toSet
      }
      got(name) match {
        case None => assert(want.isEmpty, s"$name: expected $want, got none")
        case Some(v) =>
          assert(tiedVals.contains(v.asInstanceOf[Double]), s"$name: got $v not in $tiedVals")
      }
    }
  }
}
