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
}
