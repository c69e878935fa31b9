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

  /** Interval-overlap join (engine addition): pairs of rows sharing
    * `key` whose [start, end] intervals overlap (INCLUSIVE bounds:
    * touching endpoints count — `s1 ≤ e2 AND s2 ≤ e1`). Spark plans
    * the naive formulation as a BroadcastNestedLoopJoin; here each
    * interval explodes into the width-`bucketWidthSec` time buckets it
    * covers and candidates meet in a pure EQUI-join on (key, bucket) —
    * one shuffle, AQE-skew-splittable. A pair overlapping across many
    * shared buckets would be emitted once per bucket, so emission is
    * restricted to the bucket containing `greatest(start_l, start_r)`
    * (the overlap region's first instant, covered by BOTH intervals by
    * definition of overlap) — exactly-once without a distinct shuffle.
    *
    * Fan-out contract: a row covers `span/width + 1` buckets. Size
    * `bucketWidthSec` to the typical interval length; rows longer than
    * `maxBucketsPerRow` buckets fail loudly (executor-side
    * raise_error, no extra job) rather than silently exploding a task.
    *
    * INVALID intervals (start > end) are EXCLUDED on both sides before
    * bucketing — note this is stricter than the naive predicate
    * `s1 ≤ e2 AND s2 ≤ e1` alone, which can still match an inverted
    * interval (e.g. [200, 100] against [50, 250]): an inverted
    * interval denotes no time span, so it pairs with nothing here.
    * Callers that consider inverted intervals a data bug should assert
    * `start ≤ end` upstream (profile/checks), since this join drops
    * them silently by design.
    *
    * Output: left columns + `payload` right columns as `r_<name>`.
    * Interval columns must be TIMESTAMP; microsecond precision
    * end-to-end (same rationale as [[rangeJoin]]).
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      payload: Seq[String],
      bucketWidthSec: Long,
      maxBucketsPerRow: Int = 1024): DataFrame = {
    require(bucketWidthSec > 0, s"bucket width must be positive, got $bucketWidthSec")
    require(maxBucketsPerRow > 0, s"maxBucketsPerRow must be positive, got $maxBucketsPerRow")
    val w = bucketWidthSec * 1000000L
    def buckets(s: String, e: String) = {
      val b0 = F.floor(F.col(s) / w)
      val b1 = F.floor(F.col(e) / w)
      F.explode(F.when(
        b1 - b0 >= maxBucketsPerRow,
        F.raise_error(F.concat_ws(
          "", F.lit("intervalOverlapJoin: interval spans "), (b1 - b0 + 1).cast("string"),
          F.lit(s" buckets (> maxBucketsPerRow=$maxBucketsPerRow); raise bucketWidthSec " +
            "toward the interval length or raise the cap")))
          .cast("array<bigint>"))
        .otherwise(F.sequence(b0, b1)))
    }
    val r = right.select(
      (F.col(key).as("__k") +:
        F.unix_micros(F.col(rightStart)).as("__rs") +:
        F.unix_micros(F.col(rightEnd)).as("__re") +:
        payload.map(c => F.col(c).as(s"r_$c"))): _*)
      .where(F.col("__rs") <= F.col("__re"))
      .withColumn("__bucket", buckets("__rs", "__re"))
    val l = left
      .withColumn("__k", F.col(key))
      .withColumn("__ls", F.unix_micros(F.col(leftStart)))
      .withColumn("__le", F.unix_micros(F.col(leftEnd)))
      .where(F.col("__ls") <= F.col("__le"))
      .withColumn("__bucket", buckets("__ls", "__le"))
    l.join(r, Seq("__k", "__bucket"))
      .where(
        F.col("__ls") <= F.col("__re") && F.col("__rs") <= F.col("__le") &&
          F.col("__bucket") === F.floor(F.greatest(F.col("__ls"), F.col("__rs")) / w))
      .drop("__k", "__bucket", "__ls", "__le", "__rs", "__re")
  }
}
