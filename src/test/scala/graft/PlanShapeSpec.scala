package graft

import graft.api.ArrowSpaceBuilder
import graft.core.GraphParams
import org.apache.spark.sql.{functions => F}

/** Physical-plan regression guards for the shapes SCALE.md promises:
  * scans prune and push down, top-k compiles to TakeOrderedAndProject
  * (partial per-partition top-k, no global sort), small dimension
  * sides broadcast. These break loudly if a refactor trades the plan
  * for a slower one that still returns correct rows.
  */
class PlanShapeSpec extends SparkSpec {

  test("filtered projection pushes the filter and prunes columns at the parquet scan") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(F.col("lang") === "en")
      .select("doc_id", "lang")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"),
      plan.take(1000))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      plan.take(1000))
  }

  test("lambda-aware search compiles to TakeOrderedAndProject, no global Sort") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Array(1.0, 0.1, 0.2, 0.3)),
      (1L, Array(0.9, 0.2, 0.1, 0.4)),
      (2L, Array(0.1, 1.0, 0.3, 0.2)),
      (3L, Array(0.2, 0.9, 0.4, 0.1)),
      (4L, Array(0.3, 0.2, 1.0, 0.5))
    ).toDF("id", "vec")
    val (model, _) = ArrowSpaceBuilder.build(emb, GraphParams(eps = 1.0, k = 3, topk = 3))
    val res = model.search(Array(1.0, 0.1, 0.2, 0.3), tau = 0.62)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1000))
    assert(!plan.split("\n").exists(l => l.trim.startsWith("+- Sort") ||
      l.trim.startsWith(":- Sort")), plan.take(1000))
  }

  test("small dimension side of a fact join broadcasts") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val joined = customer
      .join(F.broadcast(nation), F.col("c_nationkey") === F.col("n_nationkey"))
      .groupBy("n_name").agg(F.count(F.lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1000))
    assert(!plan.contains("SortMergeJoin"), plan.take(1000))
  }

  test("SQ8 plans: indexed top-k is scan+TakeOrdered+broadcast rerank; batch bounds shuffle via WindowGroupLimit") {
    val s = spark
    import s.implicits._
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(f => math.sin(i * 0.3 + f)))).toDF("id", "vec")
    val index = graft.operators.Similarity.sq8Encode(emb, persist = false)
    val q = Array.tabulate(8)(f => math.cos(f * 0.2))
    val single = graft.operators.Similarity.sq8TopK(index, emb, q, 5, 20)
      .queryExecution.executedPlan.toString
    // candidate cut is a partial per-partition top-k, the rerank joins
    // a broadcast candidate list — never a sort-merge or cartesian
    assert(single.contains("TakeOrderedAndProject"), single.take(1200))
    assert(single.contains("BroadcastHashJoin"), single.take(1200))
    assert(!single.contains("SortMergeJoin") &&
      !single.contains("CartesianProduct"), single.take(1200))
    val qs = emb.where(F.col("id") < 3)
      .select(F.col("id").as("qid"), F.col("vec").as("qvec"))
    val batch = graft.operators.Similarity.sq8TopKBatch(index, emb, qs, 5, 20)
      .queryExecution.executedPlan.toString
    // the salted per-query cut must push a group-limit BELOW the
    // exchange (WindowGroupLimit) so only ~rerank rows per (qid, salt)
    // ever shuffle — the Q×N scored rows stay in their map tasks
    assert(batch.contains("WindowGroupLimit"), batch.take(1500))
    assert(!batch.contains("SortMergeJoin"), batch.take(1500))
  }

  test("gopherFlags is a map-only scan: no exchange in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = graft.operators.TextOps.gopherFlags(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
    assert(plan.contains("Scan parquet") || plan.contains("FileScan"),
      plan.take(1000))
  }

  test("heavyTokens: exact count aggregates ONLY the semi-joined candidates") {
    val s = spark
    import s.implicits._
    val docs = (0 until 200).map(i => (i.toLong, s"tok$i the a b c"))
      .toDF("doc_id", "text")
    val plan = graft.operators.TextOps.heavyTokens(docs, phi = 0.01)
      .queryExecution.executedPlan.toString
    // the candidate filter must be a broadcast semi join sitting below
    // the count aggregate — the whole scale claim of the operator
    assert(plan.contains("LeftSemi"), plan.take(1500))
    val semiAt = plan.indexOf("LeftSemi")
    val aggAt = plan.indexOf("HashAggregate")
    assert(aggAt >= 0 && aggAt < semiAt,
      "semi join should be under the aggregate (printed after it)")
  }

}
