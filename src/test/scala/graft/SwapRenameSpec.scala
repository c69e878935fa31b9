package graft

import org.apache.hadoop.fs.Path

/** A local FileSystem whose `rename` returns FALSE (the HDFS failure
  * mode — no exception) whenever a test-controlled predicate matches.
  * Registered under the `failrename:` scheme so operators resolve it
  * through the ordinary `Path.getFileSystem(conf)` path; everything
  * except the matched renames delegates to RawLocalFileSystem, so
  * parquet reads/writes (and the committer's own renames) behave
  * normally.
  */
class FailRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "failrename"
  override def getUri: java.net.URI = FailRenameFileSystem.uri
  override def rename(src: Path, dst: Path): Boolean =
    if (FailRenameFileSystem.failWhen(src, dst)) false
    else super.rename(src, dst)
}

object FailRenameFileSystem {
  val uri: java.net.URI = java.net.URI.create("failrename:///")
  @volatile var failWhen: (Path, Path) => Boolean = (_, _) => false
}

/** The swap-rename law (VERDICT r13 #1): every directory-swap in the
  * rebuild/compaction/takedown family must FAIL LOUDLY when a rename
  * returns false, leaving the pre-swap state intact (and the swap
  * marker behind where the protocol has one) — never report success
  * over untouched data. Each test drives the real operator on a
  * `failrename:` layout with exactly one swap rename forced false.
  */
class SwapRenameSpec extends SparkSpec {

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      "fs.failrename.impl", classOf[FailRenameFileSystem].getName)

  /** Fail every rename whose DESTINATION directory name matches. */
  private def failDst(name: String => Boolean)(body: => Unit): Unit = {
    FailRenameFileSystem.failWhen = (_, dst) => name(dst.getName)
    try body
    finally FailRenameFileSystem.failWhen = (_, _) => false
  }

  private def tmp(prefix: String): String =
    "failrename:" + java.nio.file.Files.createTempDirectory(prefix).toString

  private def vec(i: Int) = Array.tabulate(8)(f =>
    math.sin((i % 5) * 0.9 + f * 0.7) + (if (f == i % 8) 1.5 else 0.0))

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** A saved IVF layout with two committed append segments. */
  private def ivfFixture(prefix: String): String = {
    val s = spark
    import s.implicits._
    import graft.operators.Similarity
    val dir = tmp(prefix)
    val built = Similarity.ivfBuild(
      (0L until 30L).map(i => (i, vec(i.toInt))).toDF("id", "vec"), nLists = 4)
    Similarity.ivfSave(built, dir)
    Similarity.ivfRelease(built)
    val model = graft.scale.DeterministicKMeans.Model(
      Similarity.ivfLoad(s, dir).centroids.sortBy(_._1).map(_._2))
    for (seg <- 0L to 1L)
      graft.streaming.StreamingOps.ivfAppendSegment(
        graft.scale.DeterministicKMeans.assign(
          Seq((100L + seg, vec(seg.toInt + 1))).toDF("id", "vec"),
          model, idCol = "id", vecCol = "vec")
          .select("id", "vec", "cluster"),
        dir, seg)
    dir
  }

  private def ivfIds(dir: String): Seq[Long] = {
    val F = org.apache.spark.sql.functions
    graft.operators.Similarity.ivfLoad(spark, dir).assigned
      .select(F.col("id").cast("long")).collect().map(_.getLong(0)).sorted.toSeq
  }

  test("ivfRebuild fails loudly when the root swap rename returns false; stale layout never reports success") {
    registerScheme()
    val s = spark
    import graft.operators.Similarity
    val dir = ivfFixture("graft-swap-reb1")
    val before = ivfIds(dir)
    val ex = failDstIntercept(_ == new Path(dir).getName + "__rebuild_old") {
      Similarity.ivfRebuild(s, dir, targetListSize = 5)
    }
    assert(ex.getMessage.contains("still serves"),
      s"wrong failure message: ${ex.getMessage}")
    // pre-swap layout untouched and still loads; the fresh layout
    // survives under the staging sibling for diagnosis
    assert(ivfIds(dir) == before, "failed rebuild disturbed the live layout")
    assert(fsOf(dir).exists(new Path(dir + "__rebuild_tmp")),
      "staged fresh layout was not left for diagnosis")
  }

  test("ivfRebuild fails loudly when the staging swap rename returns false; pre-rebuild layout survives under _old") {
    registerScheme()
    val s = spark
    import graft.operators.Similarity
    val dir = ivfFixture("graft-swap-reb2")
    val before = ivfIds(dir)
    // fail the SECOND rename (staging -> root): dst is the root itself
    val ex = failDstIntercept(_ == new Path(dir).getName) {
      Similarity.ivfRebuild(s, dir, targetListSize = 5)
    }
    assert(ex.getMessage.contains("survives under"),
      s"wrong failure message: ${ex.getMessage}")
    val fs = fsOf(dir)
    val old = new Path(dir + "__rebuild_old")
    assert(fs.exists(new Path(old, "lists")),
      "pre-rebuild layout did not survive under the _old sibling")
    // the documented recovery: restore _old as the root
    fs.delete(new Path(dir), true)
    assert(fs.rename(old, new Path(dir)))
    assert(ivfIds(dir) == before, "restored pre-rebuild layout diverged")
  }

  test("ivfCompactAppends fails loudly on a false swap rename; marker left, appends intact") {
    registerScheme()
    val s = spark
    import graft.operators.Similarity
    val dir = ivfFixture("graft-swap-icomp")
    val before = ivfIds(dir)
    val ex = failDstIntercept(_ == "applists_compact_old") {
      Similarity.ivfCompactAppends(s, dir)
    }
    assert(ex.getMessage.contains("marker left"),
      s"wrong failure message: ${ex.getMessage}")
    val fs = fsOf(dir)
    val marker = new Path(s"$dir/applists_swap_marker")
    assert(fs.exists(marker), "failed swap did not leave its marker")
    // the documented recovery: state is intact — clear the marker
    fs.delete(marker, false)
    assert(ivfIds(dir) == before, "failed compaction disturbed the appends")
  }

  test("sidecar compactSegDir fails loudly on a false swap rename; marker left, sidecar intact") {
    registerScheme()
    val s = spark
    import s.implicits._
    val F = org.apache.spark.sql.functions
    val dir = tmp("graft-swap-prof") + "/sidecar"
    val docs = (1L to 20L).map(i => (i, i * 1.5)).toDF("id", "score")
    for (seg <- 0 to 1)
      graft.operators.Profile.sketchShard(docs, Seq("score"))
        .withColumn("seg", F.lit(seg))
        .coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seg")
        .parquet(dir)
    def profRows() = graft.streaming.StreamingOps.profileOf(s, dir)
      .collect().map(_.toString).sorted.toSeq
    val before = profRows()
    val ex = failDstIntercept(_ == "sidecar_old") {
      graft.streaming.StreamingOps.profileCompact(s, dir)
    }
    assert(ex.getMessage.contains("marker left"),
      s"wrong failure message: ${ex.getMessage}")
    val fs = fsOf(dir)
    val marker = graft.streaming.StreamingOps.sidecarSwapMarker(dir)
    assert(fs.exists(marker), "failed swap did not leave its marker")
    fs.delete(marker, false)
    assert(profRows() == before, "failed fold disturbed the sidecar")
  }

  test("minhashCompactAppends fails loudly on a false swap rename; marker left, gate state intact") {
    registerScheme()
    val s = spark
    import s.implicits._
    import graft.operators.Dedup
    val rng = new scala.util.Random(7)
    val vocab = Vector("data", "spark", "query", "join", "scan", "table",
      "row", "batch", "agg", "filter", "merge", "sort", "hash", "key")
    def doc(): String =
      Seq.fill(40)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val base = (0L until 12L).map(i => (i, doc()))
    val dir = tmp("graft-swap-mh")
    val out = tmp("graft-swap-mh-out")
    val built = Dedup.minhashIndexBuild(base.toDF("doc_id", "text"))
    Dedup.minhashIndexSave(built, dir)
    Dedup.minhashIndexRelease(built)
    for (seg <- 0 to 1)
      graft.streaming.StreamingOps.minhashGateBatch(
        Seq((100L + seg, doc())).toDF("doc_id", "text"), seg.toLong,
        dir, out, 0.8)
    def bands() = s.read.parquet(s"$dir/bands_appends")
      .select("band", "bh", "doc_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val before = bands()
    val ex = failDstIntercept(_ == "bands_appends_old") {
      Dedup.minhashCompactAppends(s, dir)
    }
    assert(ex.getMessage.contains("marker left"),
      s"wrong failure message: ${ex.getMessage}")
    val fs = fsOf(dir)
    val marker = Dedup.gateSwapMarkerPath(dir)
    assert(fs.exists(marker), "failed swap did not leave its marker")
    fs.delete(marker, false)
    assert(bands() == before, "failed fold disturbed the band state")
  }

  /** Run `body` with renames into a matching destination forced false,
    * expecting the operator to throw the require message. */
  private def failDstIntercept(name: String => Boolean)(
      body: => Any): IllegalArgumentException = {
    var caught: IllegalArgumentException = null
    failDst(name) {
      caught = intercept[IllegalArgumentException] { body }
    }
    caught
  }
}
