package graft

import graft.operators.Cdc
import org.apache.spark.sql.{functions => F}

class CdcSpec extends SparkSpec {

  private def snap = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
  }

  test("mergeChanges applies insert/update/delete, untouched keys pass through") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (2L, "b2", 21.0, "U", 1L),  // update key 2
      (3L, "c", 30.0, "D", 1L),   // delete key 3
      (9L, "i", 90.0, "I", 1L)    // insert new key 9
    ).toDF("k", "name", "v", "op", "seq")
    val out = Cdc.mergeChanges(snap, changes, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (9L, "i", 90.0)))
  }

  test("last writer per key wins; seq ties break by op descending") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (1L, "x1", 1.0, "U", 1L),
      (1L, "x2", 2.0, "U", 3L),   // winner: highest seq
      (1L, "x3", 3.0, "U", 2L),
      (2L, "y1", 5.0, "D", 7L),   // same seq: 'U' > 'I' > 'D'
      (2L, "y2", 6.0, "U", 7L),
      (5L, "z", 9.0, "I", 1L),    // 'I' on an existing key upserts too
      (3L, "w", 0.0, "D", 1L)
    ).toDF("k", "name", "v", "op", "seq")
    val base = {
      import s.implicits._
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
        (5L, "e", 50.0)).toDF("k", "name", "v")
    }
    val out = Cdc.mergeChanges(base, changes, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "x2", 2.0), (2L, "y2", 6.0), (5L, "z", 9.0)))
    // delete of a key absent from the snapshot contributes nothing
    val delOnly = Seq((42L, "n", 0.0, "D", 1L))
      .toDF("k", "name", "v", "op", "seq")
    assert(Cdc.mergeChanges(base, delOnly, Seq("k")).count() == 4)
  }

  test("schema contract and plan shape") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, "a", "U", 1L)).toDF("k", "name", "op", "seq")
    val e = intercept[IllegalArgumentException](
      Cdc.mergeChanges(snap, bad, Seq("k")))
    assert(e.getMessage.contains("v") &&
      e.getMessage.contains("snapshot schema"))
    intercept[IllegalArgumentException](
      Cdc.mergeChanges(snap, bad, Seq.empty))
    // last-writer-wins must be an aggregate (map-side combinable), not
    // a per-key window sort over the whole changelog
    val changes = Seq((1L, "x", 1.0, "U", 1L))
      .toDF("k", "name", "v", "op", "seq")
    val plan = Cdc.mergeChanges(snap, changes, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no Window exec:\n$plan")
  }

  test("scd2History: version intervals close at the next change, deletes emit none") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (1L, "x1", 1.0, "U", 1L),   // [1,2)
      (1L, "x3", 3.0, "U", 3L),   // [3, open) current
      (1L, "x2", 2.0, "U", 2L),   // [2,3)
      (2L, "y", 5.0, "U", 1L),    // [1,2) then deleted: no current row
      (2L, "y", 5.0, "D", 2L),
      (3L, "z", 9.0, "I", 1L),    // single open version
      (4L, "t1", 1.0, "D", 5L),   // seq tie: 'D' orders first (op asc),
      (4L, "t2", 2.0, "U", 5L)    // 'U' is the last = current version
    ).toDF("k", "name", "v", "op", "seq")
    val h = Cdc.scd2History(changes, Seq("k"))
      .orderBy("k", "valid_from_seq").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5)))
    assert(h.toSeq == Seq(
      (1L, "x1", 1L, Some(2L), false),
      (1L, "x2", 2L, Some(3L), false),
      (1L, "x3", 3L, None, true),
      (2L, "y", 1L, Some(2L), false),
      (3L, "z", 1L, None, true),
      (4L, "t2", 5L, None, true)), h.mkString("; "))
    // law: current versions == mergeChanges applied to an empty
    // snapshot (history's open rows ARE the merged state)
    val empty = Seq.empty[(Long, String, Double)].toDF("k", "name", "v")
    val merged = Cdc.mergeChanges(empty, changes, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val current = Cdc.scd2History(changes, Seq("k"))
      .where(F.col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(merged == current, s"merged=$merged current=$current")
  }

  test("corpusDiff: added/removed/changed/unchanged; cosmetic edits don't count") {
    val s = spark
    import s.implicits._
    val old = Seq(
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon"),
      (3L, "zeta eta theta"),
      (4L, "iota kappa")
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha beta gamma"),        // unchanged
      (2L, "delta epsilon REVISED"),   // changed
      // 3 removed
      (4L, "  iota   KAPPA "),         // cosmetic only: normalization
                                       // (trim/case/whitespace) → unchanged
      (5L, "brand new doc")            // added
    ).toDF("doc_id", "text")
    val out = graft.operators.Cdc.corpusDiff(old, neu)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"), out.toString)
  }
}
