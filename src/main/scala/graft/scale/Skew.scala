package graft.scale

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Skew-handling primitives (SURVEY.md §7.4: hub nodes in the
  * similarity self-join are the 100 TB hot spot; AQE rebalances
  * shuffle joins, but window functions over a skewed key still put an
  * entire hot key's rows in one task).
  */
object Skew {

  /** Two-phase top-k per key, salted. Phase 1 computes top-k inside
    * (key, salt) sub-groups — bounded task size no matter how hot a
    * key is; phase 2 reduces the ≤ salt·k survivors per key to the
    * exact global top-k (top-k of a union of per-salt top-ks is the
    * exact top-k). Output columns = input columns.
    *
    * `order` must be ascending-ordered columns (e.g. dist asc).
    */
  def saltedTopKPerKey(
      df: DataFrame,
      keyCol: String,
      order: Seq[Column],
      k: Int,
      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    val w1 = Window.partitionBy(F.col(keyCol), F.col("__salt")).orderBy(order: _*)
    val phase1 = salted
      .withColumn("__rn", F.row_number().over(w1))
      .where(F.col("__rn") <= k)
      .drop("__rn", "__salt")
    val w2 = Window.partitionBy(F.col(keyCol)).orderBy(order: _*)
    phase1
      .withColumn("__rn", F.row_number().over(w2))
      .where(F.col("__rn") <= k)
      .drop("__rn")
  }

  /** Key-skew diagnostic — the pre-join measurement that decides
    * whether a shuffle needs salting / AQE skew handling BEFORE the
    * job is launched at 100 TB, instead of discovering the hot key
    * from a straggler task three hours in.
    *
    * ONE partial-aggregated count shuffle of (key) pairs, then the
    * top-N keys via TakeOrderedAndProject (never a global window over
    * all keys); rank and cumulative share are window math over the N
    * surviving rows only. Output: (rank, key STRING, n, share round-4,
    * cum_share round-4) — `cum_share` at rank N tells you how
    * concentrated the shuffle is (e.g. top-20 keys = 60% of rows ⇒
    * salt or broadcast), `share` at rank 1 bounds the biggest task.
    * NULL keys count as the literal key "NULL" so they are visible —
    * a null-heavy join key is the most common skew of all.
    */
  def report(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN > 0, s"topN must be positive; got $topN")
    val total = df.count()
    require(total > 0, "skew report of an empty frame")
    val counts = df
      .select(F.coalesce(F.col(keyCol).cast("string"), F.lit("NULL")).as("key"))
      .groupBy("key")
      .agg(F.count(F.lit(1)).as("n"))
      .orderBy(F.col("n").desc, F.col("key").asc)
      .limit(topN)
    val w = Window.orderBy(F.col("n").desc, F.col("key").asc)
    // shares via EXACT integer half-up at 4dp — round(x/t, 4) on a
    // DOUBLE diverges from the oracle at .5 ulp boundaries (Spark's
    // round goes through BigDecimal.valueOf = shortest decimal repr,
    // DuckDB rounds the raw binary double; a cum/total landing on
    // 0.00465 produced 0.0047 vs 0.0046 at sf0.1). Integer DIV is
    // bit-identical in both engines; overflow-safe to total ~4.6e14
    // rows (count*20000 < 2^63).
    def share4(numerCol: String): org.apache.spark.sql.Column =
      F.expr(s"CAST(($numerCol * 20000 + $total) DIV ${2L * total} " +
        "AS DOUBLE) / 10000.0")
    counts
      .withColumn("rank", F.row_number().over(w))
      .withColumn("cum_n", F.sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("share", share4("n"))
      .withColumn("cum_share", share4("cum_n"))
      .select("rank", "key", "n", "share", "cum_share")
      .orderBy("rank")
  }
}
