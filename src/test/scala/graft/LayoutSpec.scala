package graft

import graft.operators.Layout
import org.apache.spark.sql.{functions => F}

class LayoutSpec extends SparkSpec {

  test("zvalue interleaves bits; quantize hits the grid edges and clamps") {
    val s = spark
    import s.implicits._
    val r = Seq((3L, 1L)).toDF("a", "b")
      .select(Layout.zvalue(F.col("a"), F.col("b"), 2).as("zv"))
      .head.getLong(0)
    // a=11b lands at bits 0,2 (=5); b=01b lands at bit 1 (=2)
    assert(r == 7L)
    val q = Seq((0.0, 10.0, 5.0, -3.0, 99.0)).toDF("lo", "hi", "mid", "und", "ov")
      .select(
        Layout.quantize(F.col("lo"), 0.0, 10.0, 8).as("lo"),
        Layout.quantize(F.col("hi"), 0.0, 10.0, 8).as("hi"),
        Layout.quantize(F.col("mid"), 0.0, 10.0, 8).as("mid"),
        Layout.quantize(F.col("und"), 0.0, 10.0, 8).as("und"),
        Layout.quantize(F.col("ov"), 0.0, 10.0, 8).as("ov"))
      .head
    assert(q.getLong(0) == 0L && q.getLong(1) == 255L)
    assert(q.getLong(2) == 127L) // floor(0.5 * 255)
    assert(q.getLong(3) == 0L && q.getLong(4) == 255L) // clamped
  }

  test("zorderWrite: files tile BOTH dimensions; single-sort files tile one") {
    val s = spark
    import s.implicits._
    // a 64x64 grid — uniform in both dims, so layout is the only
    // variable. Metric: mean per-file bounding-box AREA in the (x, y)
    // space; footer min/max pruning skips a file iff the predicate box
    // misses its bounding box, so area IS expected scan fraction.
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val dirZ = java.nio.file.Files.createTempDirectory("graft-z").toString
    val dirS = java.nio.file.Files.createTempDirectory("graft-s").toString
    Layout.zorderWrite(grid, dirZ, "x", "y", bits = 6, nFiles = 16)
    grid.repartitionByRange(16, F.col("x"))
      .sortWithinPartitions("x").write.mode("overwrite").parquet(dirS)
    def meanTileArea(dir: String): Double = {
      val rows = spark.read.parquet(dir)
        .groupBy(F.input_file_name().as("f"))
        .agg(
          (F.max("x") - F.min("x") + 1).as("rx"),
          (F.max("y") - F.min("y") + 1).as("ry"))
        .select((F.col("rx") * F.col("ry")).cast("double").as("area"))
        .collect().map(_.getDouble(0))
      rows.sum / rows.length
    }
    val zArea = meanTileArea(dirZ)
    val sArea = meanTileArea(dirS)
    // x-sorted files: narrow in x, FULL range in y — area ≈ 4·64=256.
    // Z-ordered 16 files of a 64×64 grid ≈ 16×16 tiles — area ≈ 256
    // too in the perfect case? No: z-range partitioning cuts along the
    // curve, giving ~contiguous Morton ranges ≈ square-ish tiles; the
    // win shows in the MAX dimension range, so assert both: z tiles
    // are bounded in BOTH dims while sorted files span all of y.
    val zy = spark.read.parquet(dirZ)
      .groupBy(F.input_file_name()).agg((F.max("y") - F.min("y")).as("ry"))
      .agg(F.max("ry")).head.getLong(0)
    val sy = spark.read.parquet(dirS)
      .groupBy(F.input_file_name()).agg((F.max("y") - F.min("y")).as("ry"))
      .agg(F.max("ry")).head.getLong(0)
    assert(sy == 63L, s"x-sorted files must span all of y; got $sy")
    assert(zy <= 31L,
      s"z-ordered files must be bounded in y too; got max range $zy " +
        s"(areas: z=$zArea sorted=$sArea)")
    // content round trip
    assert(spark.read.parquet(dirZ).count() == 4096L)
    assert(spark.read.parquet(dirZ).agg(F.sum("id")).head.getLong(0) ==
      grid.agg(F.sum("id")).head.getLong(0))
  }

  test("compact: shrinks a small-files directory without losing rows") {
    val s = spark
    import s.implicits._
    val dirSrc = java.nio.file.Files.createTempDirectory("graft-c1").toString
    val dirDst = java.nio.file.Files.createTempDirectory("graft-c2").toString
    val df = (0L until 20000L).map(i => (i, s"payload_$i")).toDF("id", "v")
    df.repartition(40).write.mode("overwrite").parquet(dirSrc)
    assert(spark.read.parquet(dirSrc).inputFiles.length == 40)
    val n = Layout.compact(spark, dirSrc, dirDst, targetFileMB = 512)
    assert(n < 40, s"compaction should shrink the file count; got $n")
    assert(spark.read.parquet(dirDst).count() == 20000L)
    assert(spark.read.parquet(dirDst)
      .agg(F.sum("id")).head.getLong(0) == (0L until 20000L).sum)
  }
}
