package graft

import graft.scale.Bucketing
import org.apache.spark.sql.{functions => F}

/** Bucketed co-located join: same-bucket-spec tables join without any
  * shuffle Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero Exchange in the plan") {
    val s = spark
    import s.implicits._
    val orders = (1L to 2000L).map(i => (i, s"o$i", i % 7)).toDF("key", "o_payload", "grp")
    val items = (1L to 6000L).map(i => (i % 2000 + 1, s"i$i")).toDF("key", "i_payload")

    Bucketing.writeBucketed(orders, "b_orders", "key", 8)
    Bucketing.writeBucketed(items, "b_items", "key", 8)

    // disable broadcast so the join would otherwise shuffle
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(s, "b_orders", "b_items", "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle, got:\n${plan.take(2000)}")
      assert(joined.count() == 6000L)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_items")
    }
  }
}
