package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Physical-layout operators — the part of 100 TB performance that
  * lives in HOW the parquet is arranged, not in any query plan:
  *
  *   - [[zvalue]]/[[zorderWrite]]: Morton (Z-order) interleaving of
  *     two quantized dimensions, so files become tiles of the 2-D key
  *     space and a predicate on EITHER dimension prunes most files by
  *     footer min/max — a single-column sort gives perfect pruning on
  *     one dimension and none on the other; Z-order gives ~√ pruning
  *     on both (the Delta/Iceberg OPTIMIZE ZORDER design).
  *   - [[compact]]: bin-packed rewrite of a small-files directory —
  *     the other half of layout hygiene; a 100 TB table accreted from
  *     streaming micro-batches reads 100× slower through a million
  *     8 MB files than through right-sized ones.
  */
object Layout {

  /** Quantize a numeric column to the [0, 2^bits) integer grid given
    * its (min, max) domain — the rank proxy [[zvalue]] interleaves.
    * Constant domains map to 0. Out-of-domain values clamp.
    */
  def quantize(c: Column, min: Double, max: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31; got $bits")
    val span = max - min
    val top = (1L << bits) - 1L
    if (span <= 0) F.lit(0L)
    else F.greatest(F.lit(0L), F.least(F.lit(top),
      F.floor((c.cast("double") - min) / span * top).cast("long")))
  }

  /** Morton interleave of two `bits`-bit non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    * bitwise column algebra — 2·bits shift/mask terms, all inside
    * WholeStageCodegen, no UDF.
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in 1..31; got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      (F.shiftleft(F.shiftright(al, i).bitwiseAND(1L), 2 * i))
        .bitwiseOR(F.shiftleft(F.shiftright(bl, i).bitwiseAND(1L), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as Z-ordered parquet on (c1, c2): both columns are
    * quantized over their MEASURED domains (one min/max aggregate),
    * rows are range-partitioned and sorted by the interleaved key, and
    * each output file therefore covers a small tile of the (c1, c2)
    * space — its parquet footer min/max on BOTH columns is narrow, and
    * any engine that does footer-based pruning (Spark row-group skip,
    * DuckDB zone maps, Presto) reads ~√(selectivity) of the files for
    * a box predicate instead of all of them.
    *
    * `nFiles` bounds the output file count (range partitioner), the
    * compaction knob a writer owns at scale.
    */
  def zorderWrite(
      df: DataFrame, path: String, c1: String, c2: String,
      bits: Int = 16, nFiles: Int = 8): Unit =
    zorderFrame(df, c1, c2, bits, nFiles)
      .drop("__zv")
      .write.mode("overwrite").parquet(path)

  /** The frame [[zorderWrite]] writes, still carrying the `__zv` key:
    * range-partitioned into `nFiles` and sorted within partitions by
    * the Morton value. Factored out so PlanShapeSpec can pin the plan
    * (one range Exchange on __zv + a NON-global sort — a global sort
    * here would be a second exchange for nothing).
    */
  private[graft] def zorderFrame(
      df: DataFrame, c1: String, c2: String,
      bits: Int, nFiles: Int): DataFrame = {
    require(nFiles >= 1, s"nFiles must be >= 1; got $nFiles")
    val stats = df.agg(
      F.min(F.col(c1).cast("double")), F.max(F.col(c1).cast("double")),
      F.min(F.col(c2).cast("double")), F.max(F.col(c2).cast("double"))).head()
    require(!stats.anyNull, s"zorderWrite: NULL min/max for '$c1'/'$c2'")
    val zv = zvalue(
      quantize(F.col(c1), stats.getDouble(0), stats.getDouble(1), bits),
      quantize(F.col(c2), stats.getDouble(2), stats.getDouble(3), bits),
      bits)
    df.withColumn("__zv", zv)
      .repartitionByRange(nFiles, F.col("__zv"))
      .sortWithinPartitions("__zv")
  }

  /** Rewrite a parquet directory into ≈`targetFileMB` files: measures
    * the directory's on-disk bytes (one filesystem listing, no data
    * read), coalesces/repartitions to ⌈bytes/target⌉ output files, and
    * writes to `destPath`. Coalesce (no shuffle) when shrinking the
    * file count — the streaming-small-files case; repartition (one
    * shuffle) when files must SPLIT, where a shuffle is unavoidable.
    * Returns the output file count.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, srcPath: String,
      destPath: String, targetFileMB: Int = 512): Int = {
    require(targetFileMB >= 1, s"targetFileMB must be >= 1; got $targetFileMB")
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(p).getLength
    val df = spark.read.parquet(srcPath)
    val nParts = math.max(1, math.ceil(
      bytes.toDouble / (targetFileMB.toLong << 20)).toInt)
    val currentFiles = df.inputFiles.length
    val out =
      if (nParts < currentFiles) df.coalesce(nParts)
      else df.repartition(nParts)
    out.write.mode("overwrite").parquet(destPath)
    spark.read.parquet(destPath).inputFiles.length
  }
}
