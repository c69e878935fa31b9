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

  // ---- incremental profiling: mergeable per-shard sketch sidecars --
  //
  // [[profile]] rescans the whole table per run — correct, but at
  // 100 TB a corpus lands as SHARDS (daily drops, partitions), and
  // re-profiling history on every drop is a full-corpus scan for a
  // per-drop question. The incremental face keeps one tiny sidecar
  // frame per shard holding MERGEABLE state only: counts, moment sums,
  // min/max (exactly mergeable) and a Datasketches HLL binary for
  // distincts (union-mergeable and deterministic for a GIVEN sharding;
  // across different shardings the union's internal promotion mode can
  // differ from the whole-data sketch's, moving the estimate by a few
  // counts — inside the sketch's own ±2% error either way, ProfileSpec
  // measures it at ±1 on 500). Profiling after the Nth drop = sketch
  // the NEW shard + re-aggregate N sidecar rows — the history is never
  // rescanned.

  /** One shard's mergeable profile state, one row per column:
    * (column, n_rows, n_nulls, sum_v, sum_sq, min_v, max_v,
    * distinct_hll). Numeric moments are NULL for non-numeric columns;
    * the HLL sketch covers every type. Persist these rows next to the
    * shard (a few KB) and feed their union to [[mergeShards]].
    */
  def sketchShard(
      df: DataFrame, cols: Seq[String], lgK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "sketchShard: no columns requested")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c),
      s"sketchShard: column '$c' not in ${schema.fieldNames.mkString(", ")}"))
    val aggs = cols.flatMap { c =>
      val col = F.col(c)
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      val d = col.cast("double")
      Seq(
        F.count(F.lit(1)).as(s"__n_$c"),
        F.sum(F.when(col.isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (isNum) F.sum(d) else F.lit(null).cast("double")).as(s"__sum_$c"),
        (if (isNum) F.sum(d * d) else F.lit(null).cast("double")).as(s"__sq_$c"),
        (if (isNum) F.min(d) else F.lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum) F.max(d) else F.lit(null).cast("double")).as(s"__max_$c"),
        // HLL wants a concrete hashable type; strings cover every
        // input uniformly and keep shard and whole-table sketches
        // identical (the sketch hashes the SAME bytes either way)
        F.hll_sketch_agg(col.cast("string"), F.lit(lgK))
          .as(s"__hll_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__n_$c`, `__nulls_$c`, `__sum_$c`, `__sq_$c`, " +
        s"`__min_$c`, `__max_$c`, `__hll_$c`"
    }.mkString(", ")
    one.select(F.expr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_rows, n_nulls, " +
        "sum_v, sum_sq, min_v, max_v, distinct_hll)"))
  }

  /** Fold a union of [[sketchShard]] sidecars into the [[profile]]
    * output shape: (column, n_rows, n_nulls, n_distinct, min_v, max_v,
    * mean_v, std_v). Counts/min/max are EXACT across any shard split;
    * n_distinct is the HLL union estimate (±~2% at the default lgK —
    * and split-invariant: any sharding of the same rows merges to the
    * same estimate); mean/std come from the merged moment sums
    * (sample std via the sum-of-squares identity — adequate for
    * profile-grade magnitudes; values spanning ≫ 1e8 with tiny
    * variance lose digits the one-pass Welford form would keep).
    */
  def mergeShards(sidecars: DataFrame): DataFrame = {
    val m = F.col("n_rows") - F.col("n_nulls") // non-null count
    val mean = F.col("sum_v") / m
    val varS = (F.col("sum_sq") - F.col("sum_v") * F.col("sum_v") / m) /
      (m - 1)
    sidecars
      .groupBy("column")
      .agg(
        F.sum("n_rows").as("n_rows"),
        F.sum("n_nulls").as("n_nulls"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("distinct_hll")))
          .as("n_distinct"),
        F.sum("sum_v").as("sum_v"),
        F.sum("sum_sq").as("sum_sq"),
        F.min("min_v").as("min_v"),
        F.max("max_v").as("max_v"))
      .select(
        F.col("column"), F.col("n_rows"), F.col("n_nulls"),
        F.col("n_distinct"), F.col("min_v"), F.col("max_v"),
        F.when(m > 0 && F.col("sum_v").isNotNull, F.round(mean, 4))
          .cast("double").as("mean_v"),
        // greatest() absorbs the tiny negative variances the
        // sum-of-squares identity can produce — but it also swallows
        // NULL, so non-numeric columns must short-circuit first
        F.when(m > 1 && F.col("sum_sq").isNotNull,
            F.round(F.sqrt(F.greatest(varS, F.lit(0.0))), 4))
          .cast("double").as("std_v"))
      .orderBy("column")
  }

  /** Fold a union of [[sketchShard]] sidecars into ONE shard with the
    * SAME schema — the compaction primitive: counts/moments/min/max
    * add exactly, and the HLL binaries union into one sketch (HLL
    * register-max is associative, so later [[mergeShards]] over the
    * folded shard + new drops estimates within the same ±~2% contract
    * as over the originals). Used by
    * [[graft.streaming.StreamingOps.profileCompact]] to bound the
    * streamed sidecar table's segment count; also the natural "roll
    * up last month's drops into one sidecar" maintenance call.
    */
  def mergeShardsToShard(sidecars: DataFrame): DataFrame =
    sidecars
      .groupBy("column")
      .agg(
        F.sum("n_rows").as("n_rows"),
        F.sum("n_nulls").as("n_nulls"),
        F.sum("sum_v").as("sum_v"),
        F.sum("sum_sq").as("sum_sq"),
        F.min("min_v").as("min_v"),
        F.max("max_v").as("max_v"),
        F.hll_union_agg(F.col("distinct_hll")).as("distinct_hll"))
      .select("column", "n_rows", "n_nulls", "sum_v", "sum_sq",
        "min_v", "max_v", "distinct_hll")

  // ---- mergeable histogram sidecars: per-drop QUANTILES ------------
  //
  // The moment sidecars above merge min/max/mean/std exactly, but
  // QUANTILES don't fall out of moments, and `percentile`-style
  // aggregates are not mergeable across drops without re-scanning
  // history. A fixed-bounds equi-width histogram is: with (lo, hi,
  // nBuckets) pinned once per column, every shard buckets identically,
  // per-bucket counts add EXACTLY (no sketch, no tolerance — the
  // merge is a sum, so SQL replays it verbatim), and any quantile is
  // a deterministic interpolation over the merged counts with error
  // bounded by one bucket width. At 100 TB this is the standard
  // "profile quantiles without rescans" shape (Hive/Presto numeric
  // histograms do the same trade); pick bounds from the first drop's
  // min/max with headroom — out-of-range values CLAMP into the edge
  // buckets, visible as edge-bucket mass, never dropped.

  /** One shard's histogram state for one numeric column: (bucket INT
    * in [0, nBuckets), n LONG), equi-width over [lo, hi) with values
    * below `lo` clamped into bucket 0 and at/above `hi` into the last
    * bucket. NULLs and NaNs are excluded (the moment sidecar already
    * counts nulls). One partial aggregate over one scan; ≤ nBuckets
    * output rows.
    */
  def histShard(
      df: DataFrame, col: String, lo: Double, hi: Double,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"histShard: nBuckets must be positive; got $nBuckets")
    require(hi > lo, s"histShard: need hi > lo; got [$lo, $hi)")
    require(!lo.isNaN && !hi.isNaN && !lo.isInfinite && !hi.isInfinite,
      s"histShard: bounds must be finite; got [$lo, $hi)")
    val w = (hi - lo) / nBuckets
    val x = F.col(col).cast("double")
    // clamp in LONG space BEFORE the int cast: a value far above hi
    // (epoch micros profiled with bounds picked in seconds) floors to
    // billions, and an early int cast would WRAP it into bucket 0 or
    // an arbitrary middle bucket instead of the top edge
    df.where(x.isNotNull && !F.isnan(x))
      .select(
        F.least(F.lit((nBuckets - 1).toLong), F.greatest(F.lit(0L),
          F.floor((x - F.lit(lo)) / F.lit(w)))).cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(F.count(F.lit(1)).as("n"))
  }

  /** Merge any number of shard histograms (same bounds by contract):
    * per-bucket sum — exact, associative, the compaction fold. */
  def histMerge(sidecars: DataFrame): DataFrame =
    sidecars.groupBy("bucket").agg(F.sum("n").as("n"))

  /** Histogram bounds from a profile row (VERDICT r12 #6):
    * [[histShard]] takes hand-picked `[lo, hi)` and silently clamps
    * out-of-range mass into the edge buckets — a wrong guess (the
    * epoch-micros example in histShard's own clamp comment) quietly
    * breaks the ≤-one-bucket-width quantile contract for the clamped
    * values. The engine already profiles every corpus drop
    * ([[profile]] / [[mergeShards]] over streamed sidecars), so take
    * the bounds FROM that state instead of guessing: (min_v, max_v)
    * of the named column. Values AT the max land in the top bucket
    * via the clamp, so the contract holds for the whole profiled
    * range; a constant column (min == max) widens to width 1 — every
    * row in bucket 0, quantile error still ≤ one bucket width.
    * Works on [[profile]] output and on [[mergeShards]] over
    * [[graft.streaming.StreamingOps.profileStream]] sidecars alike
    * (same columns). Drift note: bounds from LAST drop's profile
    * still clamp a shifted current drop — [[histQuantile]] warns when
    * edge buckets carry implausible mass, closing that loop.
    */
  def histBoundsFromProfile(
      profile: DataFrame, col: String): (Double, Double) = {
    val rows = profile.where(F.col("column") === col)
      .select(F.col("min_v").cast("double"), F.col("max_v").cast("double"))
      .collect()
    require(rows.nonEmpty,
      s"histBoundsFromProfile: no profile row for column '$col'")
    val r = rows.head
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"histBoundsFromProfile('$col'): profile carries no numeric " +
        "min/max — non-numeric column, or all values null")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    require(!lo.isNaN && !hi.isNaN && !lo.isInfinite && !hi.isInfinite,
      s"histBoundsFromProfile('$col'): non-finite bounds [$lo, $hi]")
    if (hi > lo) (lo, hi) else (lo, lo + 1.0)
  }

  /** Deterministic quantile estimate from merged bucket counts:
    * target rank q·N, linear interpolation inside the holding bucket
    * (the first bucket whose cumulative count reaches the target).
    * Error ≤ one bucket width by construction. Same arithmetic as the
    * SQL replay in the oracle, so the estimate is value-pinned, not
    * tolerance-pinned.
    */
  def histQuantile(
      counts: Seq[(Int, Long)], q: Double, lo: Double, hi: Double,
      nBuckets: Int): Double = {
    require(q >= 0.0 && q <= 1.0, s"histQuantile: q must be in [0,1]; got $q")
    require(nBuckets > 0 && hi > lo,
      s"histQuantile: bad geometry ($lo, $hi, $nBuckets)")
    val w = (hi - lo) / nBuckets
    val sorted = counts.filter(_._2 > 0L).sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    require(total > 0L, "histQuantile: empty histogram")
    // mis-chosen bounds clamp out-of-range mass into the edge buckets
    // (histShard's long-space clamp), and clamped values void the
    // ≤-one-bucket-width contract silently. A quarter of the mass on
    // the two edges of an ≥8-bucket histogram is implausible for
    // bounds that actually cover the data — warn with the fix
    if (nBuckets >= 8) {
      val edge = sorted.iterator
        .filter(t => t._1 == 0 || t._1 == nBuckets - 1).map(_._2).sum
      if (edge * 4L > total)
        org.apache.logging.log4j.LogManager.getLogger("graft").warn(
          s"histQuantile: ${edge * 100 / total}% of the mass sits in " +
            s"the two edge buckets of [$lo, $hi) — the bounds likely " +
            "clamp out-of-range values, and quantiles inside clamped " +
            "buckets are unreliable. Derive bounds from the profiled " +
            "corpus (Profile.histBoundsFromProfile) and re-shard.")
    }
    val target = q * total
    var cum = 0L
    sorted.foreach { case (b, n) =>
      require(b >= 0 && b < nBuckets,
        s"histQuantile: bucket $b outside [0, $nBuckets)")
      if (cum + n >= target) {
        val frac = math.min(1.0, math.max(0.0, (target - cum) / n))
        return lo + w * (b + frac)
      }
      cum += n
    }
    hi // unreachable for q ≤ 1 (cum+n ≥ total ≥ target at the last bucket)
  }

  /** PSI between two PERSISTED histograms ([[histShard]]/[[histMerge]]
    * frames over the same fixed bounds) — drift between any two drops,
    * or a drop and the stream-so-far ([[graft.streaming.StreamingOps
    * .histOf]]), from a few KB of sidecar state with NO corpus scan.
    * Same index formula and conventions as [[psiBuckets]] (fractions
    * floored at 1e-6 inside the log, psi_term round-6), but over the
    * sidecars' equi-width buckets instead of reference deciles — at
    * 100 TB the reference was profiled months ago; its sidecar is
    * what you still have. Output: (bucket, n_ref, n_cur, psi_term)
    * over the FULL 0..nBuckets-1 domain (absent buckets count 0),
    * ordered by bucket; sum psi_term for the index.
    */
  def psiFromHists(
      ref: DataFrame, cur: DataFrame, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"psiFromHists: nBuckets must be positive; got $nBuckets")
    // mirror histQuantile's empty-histogram guard: an all-zero side
    // makes every fraction 0/0 → NULL psi_terms, and "no drift terms"
    // is the WRONG reading of "no reference data". ONE combined probe
    // job for both sides; note the inputs' plans still execute again
    // for the returned frame — persisted sidecar reads (the intended
    // input, ≤ nBuckets rows) are free, but callers passing expensive
    // UNMATERIALIZED frames should persist them first
    locally {
      val t = ref.agg(F.coalesce(F.sum("n"), F.lit(0L)).as("t_ref"))
        .crossJoin(cur.agg(F.coalesce(F.sum("n"), F.lit(0L)).as("t_cur")))
        .head
      require(t.getLong(0) > 0L,
        "psiFromHists: reference histogram is empty (sum(n)=0)")
      require(t.getLong(1) > 0L,
        "psiFromHists: current histogram is empty (sum(n)=0)")
    }
    val all = ref.sparkSession.range(nBuckets)
      .select(F.col("id").cast("int").as("bucket"))
    val eps = 1e-6
    val joined = all
      .join(ref.select(F.col("bucket"), F.col("n").as("n_ref")),
        Seq("bucket"), "left")
      .join(cur.select(F.col("bucket"), F.col("n").as("n_cur")),
        Seq("bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val pRef = F.col("n_ref") / F.sum("n_ref").over()
    val pCur = F.col("n_cur") / F.sum("n_cur").over()
    joined
      .withColumn("psi_term", F.round(
        (pRef - pCur) *
          F.log(F.greatest(pRef, F.lit(eps)) / F.greatest(pCur, F.lit(eps))),
        6))
      .select("bucket", "n_ref", "n_cur", "psi_term")
      .orderBy("bucket")
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard drift monitor a pipeline runs between a
    * reference corpus drop and the current one (PSI < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 shifted, the published banking-industry
    * rule of thumb). Buckets are REFERENCE deciles (exact interpolated
    * percentiles, rounded to 6 decimals so both engines bucket
    * identically), so the reference distributes ~uniformly and the
    * index measures how far the current snapshot departs from that.
    *
    * PSI = Σ_i (p_i − q_i) · ln(p_i / q_i), fractions floored at 1e-6
    * inside the log so empty buckets contribute a large-but-finite
    * term instead of ±∞.
    *
    * Shape: one exact-percentile aggregate over the reference (swap
    * `approx_percentile` at 100 TB — same plan), then ONE partial-agg
    * bucket count per side; the per-bucket frame is `buckets` rows.
    * Output: (bucket, lo, hi, n_ref, n_cur, psi_term round-6) ordered
    * by bucket — sum psi_term for the index, or eyeball which buckets
    * moved.
    */
  def psiBuckets(
      ref: DataFrame, cur: DataFrame, col: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      s"buckets must be in 2..1000; got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val edges = ref
      .agg(F.expr(
        s"percentile($col, array(${ps.mkString(",")}))").as("e"))
      .head.getSeq[Double](0)
      .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
      .toArray
    def side(df: DataFrame, name: String): DataFrame = df
      .select(F.col(col).cast("double").as("v")).na.drop()
      .select(bucketExpr(edges, buckets, F.col("v")).as("bucket"))
      .groupBy("bucket").agg(F.count(F.lit(1)).as(name))
    val all = ref.sparkSession.range(buckets)
      .select(F.col("id").cast("int").as("bucket"))
    val eps = 1e-6
    val joined = all
      .join(side(ref, "n_ref"), Seq("bucket"), "left")
      .join(side(cur, "n_cur"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tRef = F.sum("n_ref").over()
    val tCur = F.sum("n_cur").over()
    val pRef = F.col("n_ref") / tRef
    val pCur = F.col("n_cur") / tCur
    joined
      .withColumn("psi_term", F.round(
        (pRef - pCur) *
          F.log(F.greatest(pRef, F.lit(eps)) / F.greatest(pCur, F.lit(eps))),
        6))
      .withColumn("lo",
        edges.zipWithIndex.foldLeft(F.lit(null).cast("double")) {
          case (acc, (e, i)) =>
            F.when(F.col("bucket") === i + 1, F.lit(edges(i))).otherwise(acc)
        })
      .withColumn("hi",
        edges.zipWithIndex.foldLeft(F.lit(null).cast("double")) {
          case (acc, (e, i)) =>
            F.when(F.col("bucket") === i, F.lit(e)).otherwise(acc)
        })
      .select("bucket", "lo", "hi", "n_ref", "n_cur", "psi_term")
      .orderBy("bucket")
  }

  /** Reference side of a drift monitor, precomputed once: the round-6
    * decile edges and the reference's per-bucket fractions — the
    * driver-sized state (2·buckets doubles) a STREAMING monitor
    * carries as literals ([[graft.streaming.StreamingOps.psiStream]]).
    */
  def psiReference(
      ref: DataFrame, col: String,
      buckets: Int = 10): (Array[Double], Array[Double]) = {
    require(buckets >= 2 && buckets <= 1000,
      s"buckets must be in 2..1000; got $buckets")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val edges = ref
      .agg(F.expr(
        s"percentile($col, array(${ps.mkString(",")}))").as("e"))
      .head.getSeq[Double](0)
      .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
      .toArray
    val counts = ref
      .select(F.col(col).cast("double").as("v")).na.drop()
      .select(bucketExpr(edges, buckets, F.col("v")).as("bucket"))
      .groupBy("bucket").agg(F.count(F.lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    require(total > 0, "psiReference: empty reference")
    (edges, Array.tabulate(buckets)(i => counts.getOrElse(i, 0L) / total))
  }

  /** Shared CASE-chain bucketing against round-6 edges — one code path
    * for the batch monitor, the reference builder, and the streaming
    * face, so the three cannot drift. */
  private[graft] def bucketExpr(
      edges: Array[Double], buckets: Int,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    edges.zipWithIndex.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, (e, i)) =>
        Some(acc match {
          case None    => F.when(c <= e, i)
          case Some(w) => w.when(c <= e, i)
        })
    }.get.otherwise(buckets - 1)

  /** The scalar index: Σ psi_term of [[psiBuckets]]. */
  def psi(ref: DataFrame, cur: DataFrame, col: String,
      buckets: Int = 10): Double =
    psiBuckets(ref, cur, col, buckets)
      .agg(F.sum("psi_term")).head.getDouble(0)

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
