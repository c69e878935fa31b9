package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Time-series regularization operators: event streams are irregular,
  * training/feature pipelines want dense per-key grids.
  */
object TimeSeries {

  /** Resample an event stream onto a dense per-key time grid with
    * forward-filled values — `pandas.resample().ffill()` semantics as
    * one distributed plan. Events are bucketed by `date_trunc(bucket,
    * ts)` and summed; every key then gets EVERY bucket between its own
    * first and last active bucket (missing ones materialized as gap
    * rows), and `filled_value` carries the most recent non-gap sum
    * forward across gaps.
    *
    * 100 TB shape: one groupBy((key, bucket)) with partial aggregation
    * (the exchange carries one row per key-bucket, not per event); the
    * per-key span is a second partial agg over the already-collapsed
    * buckets; the grid is a map-side `sequence`/`explode` bounded by
    * span-hours per key (never a cartesian against a global calendar
    * — a key active for a day contributes 24 rows regardless of the
    * corpus span); the forward fill is a per-key ordered window, the
    * irreducible contract of ffill, whose partitions are key-spans
    * (bounded), not the corpus.
    *
    * Output: (key, bucket_ts, n_events, sum_value, filled_value,
    * is_gap), one row per key × in-span bucket; `sum_value` is 0.0 on
    * gap rows while `filled_value` repeats the last active bucket's
    * sum (rounded to 2dp at the bucket, so fills replay bit-stably).
    */
  def resampleGapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      bucket: String = "hour"): DataFrame = {
    val bucketed = events
      .groupBy(F.col(keyCol), F.date_trunc(bucket, F.col(tsCol)).as("bucket_ts"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.round(F.sum(valueCol), 2).as("sum_value"))
    val grid = bucketed
      .groupBy(keyCol)
      .agg(F.min("bucket_ts").as("lo"), F.max("bucket_ts").as("hi"))
      .select(
        F.col(keyCol),
        F.explode(F.sequence(
          F.col("lo"), F.col("hi"),
          F.expr(s"interval 1 $bucket"))).as("bucket_ts"))
    val ffill = Window.partitionBy(keyCol).orderBy("bucket_ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(bucketed, Seq(keyCol, "bucket_ts"), "left")
      .select(
        F.col(keyCol), F.col("bucket_ts"),
        F.coalesce(F.col("n_events"), F.lit(0L)).as("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).as("sum_value"),
        F.last(F.col("sum_value"), ignoreNulls = true).over(ffill)
          .as("filled_value"),
        F.col("n_events").isNull.as("is_gap"))
  }

  /** Trailing-window z-score anomaly scoring over a regular per-key
    * series (compose with [[resampleGapFill]] to densify an event
    * stream first — on a gappy series "previous `trailing` rows" are
    * not contiguous hours and the baseline silently skips quiet
    * periods). Each row is scored against the mean/stddev of the
    * `trailing` rows strictly BEFORE it (the row itself excluded, so a
    * spike cannot dilute its own baseline); rows with fewer than
    * `minPoints` predecessors or a zero-variance baseline get a null
    * z (cold start / constant series are "no evidence", not "normal").
    *
    * 100 TB shape: one per-key ordered window — the irreducible
    * contract of a trailing statistic; partitions are per-key series
    * (bounded by key span, never the corpus), and stddev_samp/avg are
    * streaming single-pass inside the frame. No self-join, no second
    * scan: mean and variance come from the same window frame.
    *
    * Output: input columns + (n_baseline, baseline_mean, z,
    * is_anomaly); z rounded to 4dp so the score replays bit-stably.
    */
  def anomalyZScore(
      series: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      trailing: Int = 24,
      minPoints: Int = 8,
      zThreshold: Double = 2.0): DataFrame = {
    require(trailing > 0, s"trailing window must be positive, got $trailing")
    require(minPoints > 0 && minPoints <= trailing,
      s"minPoints must be in 1..trailing, got $minPoints")
    require(zThreshold > 0, s"zThreshold must be positive, got $zThreshold")
    // loud failure on output-name collisions: withColumn would silently
    // OVERWRITE same-named input columns (the one quiet data-loss path
    // in this file — every other guard here raises). Case-INSENSITIVE,
    // because withColumn resolves case-insensitively under the default
    // spark.sql.caseSensitive=false — a column named "Z" would be
    // replaced just the same.
    val outCols = Seq("n_baseline", "baseline_mean", "z", "is_anomaly")
    val lower = series.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val clash = outCols.filter(lower.contains)
    require(clash.isEmpty,
      s"anomalyZScore output column(s) ${clash.mkString(", ")} already " +
        "exist on the input series and would be overwritten; rename or " +
        "drop them first")
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
      .rowsBetween(-trailing, -1)
    val n = F.count(F.col(valueCol)).over(w)
    val mean = F.avg(F.col(valueCol)).over(w)
    val std = F.stddev_samp(F.col(valueCol)).over(w)
    val z = F.when(
      n >= minPoints && std > 0,
      F.round((F.col(valueCol) - mean) / std, 4))
    series
      .withColumn("n_baseline", n)
      .withColumn("baseline_mean", F.round(mean, 4))
      .withColumn("z", z)
      .withColumn("is_anomaly", F.coalesce(F.abs(F.col("z")) >= zThreshold, F.lit(false)))
  }

  /** Ordered conversion funnel: for each key, the earliest time it
    * completed stage 1, then stage 2 STRICTLY AFTER stage 1, and so on
    * — the "view → click → purchase" question, with the standard
    * earliest-completion semantics (greedy first-match minimizes each
    * stage time, which maximizes the set of keys that can complete
    * later stages). Keys that never reach stage 1 are absent; a key
    * stalled at stage i carries nulls from `ts_(i+1)` on.
    *
    * 100 TB shape: one filtered groupBy(key) aggregation per stage —
    * every stage is a partial-aggregating min (the exchange carries
    * one row per surviving key), chained by slim key equi-joins;
    * stages.length is small and fixed, so this is k map-combined
    * shuffles, never a per-key event sort or a collect_list of event
    * histories.
    *
    * Output: (key, ts_1 .. ts_k, n_stages).
    */
  def funnelStages(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct, got ${stages.mkString(", ")}")
    val first = events.where(F.col(typeCol) === stages.head)
      .groupBy(keyCol).agg(F.min(tsCol).as("ts_1"))
    val full = stages.drop(1).zipWithIndex.foldLeft(first) {
      case (acc, (stage, i)) =>
        val prev = s"ts_${i + 1}"
        val cur = s"ts_${i + 2}"
        val reached = acc
          .join(
            events.where(F.col(typeCol) === stage)
              .select(F.col(keyCol), F.col(tsCol).as("_evt")),
            Seq(keyCol))
          .where(F.col("_evt") > F.col(prev))
          .groupBy(keyCol).agg(F.min("_evt").as(cur))
        acc.join(reached, Seq(keyCol), "left")
    }
    val reachedCount = stages.indices
      .map(i => F.when(F.col(s"ts_${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumn("n_stages", reachedCount)
  }
}
