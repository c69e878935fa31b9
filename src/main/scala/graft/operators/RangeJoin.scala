package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Bucketed range join — the scalable shape for time-window joins
  * (engine addition; Spark plans a plain inequality join as a
  * BroadcastNestedLoopJoin cartesian).
  *
  * To join left and right rows sharing `key` with
  * |leftTs − rightTs| ≤ toleranceSec, each right row is assigned to a
  * time bucket of width toleranceSec and each left row probes its own
  * bucket plus both neighbors: any qualifying pair is at most one
  * bucket apart, so the candidate join is a pure EQUI-join on
  * (key, bucket) — one shuffle, AQE-skew-splittable — and the exact
  * |Δt| predicate refines candidates afterwards. Candidate blowup is
  * 3× the left side, independent of data size.
  */
object RangeJoin {

  /** Output: left columns + `payload` columns from the matched right
    * rows (inner semantics: left rows with no match in range drop;
    * one output row per qualifying pair). Timestamps must be TIMESTAMP.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0, s"tolerance must be positive, got $toleranceSec")
    // microsecond precision end-to-end: second-truncated epochs would
    // mis-classify sub-second deltas at the tolerance boundary
    val w = toleranceSec * 1000000L
    val r = right.select(
      (F.col(key).as("__k") +:
        (F.unix_micros(F.col(rightTs))).as("__rt") +:
        payload.map(c => F.col(c).as(s"r_$c"))): _*)
      .withColumn("__bucket", F.floor(F.col("__rt") / w))
    val l = left
      .withColumn("__k", F.col(key))
      .withColumn("__lt", F.unix_micros(F.col(leftTs)))
      .withColumn(
        "__bucket",
        F.explode(F.array(
          F.floor(F.col("__lt") / w) - 1,
          F.floor(F.col("__lt") / w),
          F.floor(F.col("__lt") / w) + 1)))
    l.join(r, Seq("__k", "__bucket"))
      .where(F.abs(F.col("__lt") - F.col("__rt")) <= w)
      .drop("__k", "__bucket", "__lt", "__rt")
  }
}
