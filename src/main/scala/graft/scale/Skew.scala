package graft.scale

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Skew-handling primitives (SURVEY.md §7.4: hub nodes in the
  * similarity self-join are the 100 TB hot spot; AQE rebalances
  * shuffle joins, but window functions over a skewed key still put an
  * entire hot key's rows in one task).
  */
object Skew {

  /** Exact per-key top-k with an EXPLICIT map-side combine, for the
    * dominant call shape: integral key + ONE double ordering column +
    * ONE long tiebreak (ascending). Phase 1 is a mapPartitions pass
    * holding one bounded [[TopKHeap]] per key seen in the partition —
    * each (key, map partition) reduces to ≤ k pairs BEFORE any
    * exchange, so the shuffle carries |keys| × partitions × k rows
    * instead of the whole candidate mass (the same reduction map-side
    * combine gives a count, applied to top-k). Phase 2 is one window
    * over those survivors only. Skew needs no salting: a hot key's
    * candidates heap down inside every map task.
    *
    * Deliberately NOT a [[org.apache.spark.sql.catalyst.expressions
    * .aggregate.TypedImperativeAggregate]]: past
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * distinct keys per task (default 128 — every batch-retrieval
    * workload exceeds it) ObjectHashAggregate abandons the hash map
    * and SORTS the remaining input, which measured slower and far
    * noisier than the window form it was meant to beat. The explicit
    * heap map owns its memory instead: #distinct keys per partition ×
    * k × 16 B (+64 B/entry overhead) — bound it by sizing partitions,
    * or fall back to [[saltedTopKPerKey]] for unbounded keyspaces.
    *
    * Kept rows are bit-identical to [[saltedTopKPerKey]] with order
    * (score desc|asc, tie asc) — (score, tie) is unique per key at
    * every call site (tie is a row id), so the orders agree on one
    * set (parity spec-pinned). Output columns: (key, tie, score).
    * Rows with a null key, tie or score are dropped (the hot-path
    * frames never produce them — scores are rounded cosines over
    * non-null vectors).
    *
    * Use [[saltedTopKPerKey]] when rows carry payload columns that
    * must ride through selection, when keys are non-integral or
    * nullable, when the primary sort column is a LONG whose magnitude
    * exceeds a double's 53-bit mantissa (hash sort keys), or when the
    * ordering has more than two columns.
    */
  def heapTopKPerKey(
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      tieCol: String,
      k: Int,
      desc: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df
      .select(F.col(keyCol).cast("long"), F.col(tieCol).cast("long"),
        F.col(scoreCol).cast("double"))
      .where(F.col(keyCol).isNotNull && F.col(tieCol).isNotNull &&
        F.col(scoreCol).isNotNull)
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = new java.util.HashMap[Long, TopKHeap]()
        it.foreach { case (key, tie, score) =>
          var h = heaps.get(key)
          if (h == null) { h = new TopKHeap(k, desc); heaps.put(key, h) }
          h.add(score, tie)
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        heaps.forEach { (key, h) =>
          var i = 0
          while (i < h.n) { out += ((key, h.ties(i), h.scores(i))); i += 1 }
        }
        out.iterator
      }
      .toDF(keyCol, tieCol, scoreCol)
    val order =
      if (desc) Seq(F.col(scoreCol).desc, F.col(tieCol).asc)
      else Seq(F.col(scoreCol).asc, F.col(tieCol).asc)
    val w = Window.partitionBy(F.col(keyCol)).orderBy(order: _*)
    partials
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") <= k)
      .drop("__rn")
  }

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
