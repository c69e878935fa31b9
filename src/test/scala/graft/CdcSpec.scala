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
}
