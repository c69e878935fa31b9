package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types.NumericType

/** One-pass table profiling — the Deequ-style data-quality summary a
  * pipeline runs before trusting a new corpus drop: per column, row
  * count, null count, exact distinct count, and (numeric columns)
  * min/max/mean/stddev.
  *
  * Plan shape: ONE aggregate over ONE scan. The multi-column exact
  * `count(DISTINCT …)` is planned by Spark as a single scan through
  * an Expand (data multiplied ×|cols| into the partial aggregate —
  * the standard trade for exactness); at 100 TB swap
  * `approx_count_distinct` in via `exact = false` for a plain
  * one-pass HLL sketch per column, same output schema, ±2% by
  * default. The long (one-row-per-column) shape comes from a `stack`
  * over the single aggregate row — no second scan, no driver collect.
  */
object Profile {

  /** Output: (column, n_rows, n_nulls, n_distinct, min_v, max_v,
    * mean_v, std_v) — the numeric stats are NULL for non-numeric
    * columns, mean/std rounded to 4 decimals, one row per requested
    * column ordered by column name.
    */
  def profile(
      df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns requested")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"profile: column '$c' not in ${schema.fieldNames.mkString(", ")}"))
    val aggs = cols.flatMap { c =>
      val col = F.col(c)
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      val d = col.cast("double")
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        F.sum(F.when(col.isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (exact) F.count_distinct(col)
         else F.approx_count_distinct(col)).as(s"__dist_$c"),
        (if (isNum) F.min(d) else F.lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum) F.max(d) else F.lit(null).cast("double")).as(s"__max_$c"),
        (if (isNum) F.round(F.avg(d), 4)
         else F.lit(null).cast("double")).as(s"__mean_$c"),
        (if (isNum) F.round(F.stddev_samp(d), 4)
         else F.lit(null).cast("double")).as(s"__std_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__n_$c`, `__nulls_$c`, CAST(`__dist_$c` AS BIGINT), " +
        s"`__min_$c`, `__max_$c`, `__mean_$c`, `__std_$c`"
    }.mkString(", ")
    one.select(F.expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(column, n_rows, n_nulls, n_distinct, min_v, max_v, mean_v, std_v)"))
      .orderBy("column")
  }

  /** Declarative constraint checks over a profile — the assertion face
    * of [[profile]]: each check is (name, passed 0/1, observed,
    * detail). Runs on the SAME single-aggregate profile frame.
    *
    *   - `notNull`: columns that must have zero nulls
    *   - `unique`: columns whose distinct count must equal the
    *     non-null row count (primary-key-ness)
    *   - `bounds`: (column, min, max) inclusive range on the observed
    *     min/max
    */
  def check(
      df: DataFrame, cols: Seq[String],
      notNull: Seq[String] = Nil,
      unique: Seq[String] = Nil,
      bounds: Seq[(String, Double, Double)] = Nil): DataFrame = {
    val p = profile(df, cols).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val checks =
        notNull.map { c =>
          p.where(F.col("column") === c).select(
            F.lit(s"not_null($c)").as("check"),
            (F.col("n_nulls") === 0L).cast("int").as("passed"),
            F.col("n_nulls").cast("double").as("observed"),
            F.lit("nulls").as("metric"))
        } ++ unique.map { c =>
          p.where(F.col("column") === c).select(
            F.lit(s"unique($c)").as("check"),
            (F.col("n_distinct") === F.col("n_rows") - F.col("n_nulls"))
              .cast("int").as("passed"),
            F.col("n_distinct").cast("double").as("observed"),
            F.lit("distinct").as("metric"))
        } ++ bounds.map { case (c, lo, hi) =>
          p.where(F.col("column") === c).select(
            F.lit(s"bounds($c,$lo,$hi)").as("check"),
            (F.col("min_v") >= lo && F.col("max_v") <= hi)
              .cast("int").as("passed"),
            F.col("max_v").as("observed"),
            F.lit("range").as("metric"))
        }
      require(checks.nonEmpty, "check: no constraints given")
      checks.reduce(_ unionByName _).orderBy("check")
        .localCheckpoint() // materialize before the profile cache drops
    } finally p.unpersist(blocking = false)
  }
}
