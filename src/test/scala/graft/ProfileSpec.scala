package graft

import graft.operators.Profile
import graft.operators.TextOps
import org.apache.spark.sql.{functions => F}

class ProfileSpec extends SparkSpec {

  lazy val frame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (3L, None, Some(20.0)),
      (4L, Some("a"), None),
      (5L, Some("c"), Some(50.0))
    ).toDF("id", "tag", "score")
  }

  test("profile: counts, nulls, exact distinct, numeric stats, in one row per column") {
    val p = Profile.profile(frame, Seq("id", "tag", "score"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "tag", "score"))
    val id = p("id")
    assert(id.getLong(1) == 5L && id.getLong(2) == 0L && id.getLong(3) == 5L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 5.0)
    assert(id.getDouble(6) == 3.0) // mean
    val tag = p("tag")
    assert(tag.getLong(2) == 1L && tag.getLong(3) == 3L)
    assert(tag.isNullAt(4) && tag.isNullAt(5) && tag.isNullAt(6) && tag.isNullAt(7),
      "non-numeric columns must have NULL numeric stats")
    val sc = p("score")
    assert(sc.getLong(2) == 1L && sc.getLong(3) == 3L)
    assert(sc.getDouble(4) == 10.0 && sc.getDouble(5) == 50.0)
    assert(sc.getDouble(6) == 25.0)
  }

  test("profile: approx mode keeps the schema and lands near exact") {
    val ap = Profile.profile(frame, Seq("id", "tag"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at this cardinality is exact in practice; allow slack anyway
    assert(math.abs(ap("id") - 5L) <= 1 && math.abs(ap("tag") - 3L) <= 1)
  }

  test("check: not_null / unique / bounds verdicts") {
    val out = Profile.check(frame, Seq("id", "tag", "score"),
        notNull = Seq("id", "tag"),
        unique = Seq("id", "score"),
        bounds = Seq(("score", 0.0, 100.0), ("score", 0.0, 30.0)))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("not_null(id)") == 1)
    assert(out("not_null(tag)") == 0)
    assert(out("unique(id)") == 1)
    assert(out("unique(score)") == 0) // 20.0 repeats
    assert(out("bounds(score,0.0,100.0)") == 1)
    assert(out("bounds(score,0.0,30.0)") == 0) // max 50 > 30
  }

  test("profile validation: unknown column and empty request fail fast") {
    val e = intercept[IllegalArgumentException](
      Profile.profile(frame, Seq("nope")))
    assert(e.getMessage.contains("nope"))
    intercept[IllegalArgumentException](Profile.profile(frame, Nil))
  }

  test("psiBuckets: zero on self, trips on a planted shift, finite on empty buckets") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(19)
    val ref = (0 until 5000).map(_ => rng.nextGaussian() * 10 + 100)
      .toDF("x")
    // self-drift is identically zero: p_i == q_i for every bucket
    assert(graft.operators.Profile.psi(ref, ref, "x") == 0.0)
    // reference deciles spread the reference ~uniformly
    val selfB = graft.operators.Profile.psiBuckets(ref, ref, "x").collect()
    assert(selfB.length == 10)
    assert(selfB.forall(r => math.abs(r.getLong(3) - 500L) <= 1),
      s"deciles should hold ~N/10 each: ${selfB.map(_.getLong(3)).toSeq}")
    // a mean shift of one sigma is far past the 0.25 "shifted" line
    val shifted = (0 until 5000).map(_ => rng.nextGaussian() * 10 + 110)
      .toDF("x")
    val p = graft.operators.Profile.psi(ref, shifted, "x")
    assert(p > 0.25, s"one-sigma shift should trip the index: $p")
    // a disjoint current snapshot empties reference buckets — the eps
    // floor keeps every term finite
    val disjoint = (0 until 100).map(_ => 1e6 + rng.nextDouble()).toDF("x")
    val terms = graft.operators.Profile.psiBuckets(ref, disjoint, "x")
      .collect().map(_.getDouble(5))
    assert(terms.forall(t => !t.isNaN && !t.isInfinite), terms.toSeq.toString)
    intercept[IllegalArgumentException](
      graft.operators.Profile.psiBuckets(ref, ref, "x", buckets = 1))
  }

  test("madOutliers: injected extreme flagged per stratum; MAD=0 stratum inert") {
    val s = spark
    import s.implicits._
    // stratum A: tight lengths + one monster; stratum B: all identical
    // (MAD = 0 — must define mz = 0, not divide by zero)
    val docs = ((0L until 40L).map(i => (i, "A", 100L + i % 5)) ++
        Seq((99L, "A", 100000L)) ++
        (200L until 220L).map(i => (i, "B", 777L)))
      .toDF("doc_id", "source", "n_chars")
    val out = TextOps.madOutliers(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(4))).toSeq
    val flaggedA = out.filter(t => t._2 == "A" && t._3 == 1).map(_._1)
    assert(flaggedA == Seq(99L), s"only the monster should flag: $flaggedA")
    assert(out.filter(_._2 == "B").forall(_._3 == 0),
      "a zero-MAD stratum must produce no outliers")
    // modified z of the monster is enormous
    val mz99 = TextOps.madOutliers(docs).where(F.col("doc_id") === 99L)
      .select("mz").head.getDouble(0)
    assert(mz99 > 1000.0)
  }

  test("incremental profile: merged shard sidecars equal the whole-table profile and are split-invariant") {
    val s = spark
    import s.implicits._
    val big = (0L until 500L).map(i =>
      (i, if (i % 7 == 0) null else s"t${i % 23}",
        if (i % 11 == 0) None else Some((i % 97).toDouble)))
      .toDF("id", "tag", "score")
    val cols = Seq("id", "tag", "score")

    def shardsBy(k: Int) =
      (0 until k).map(r => Profile.sketchShard(
        big.where(F.col("id") % k === r), cols)).reduce(_ unionByName _)

    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r).toMap

    val m2 = rowsOf(Profile.mergeShards(shardsBy(2)))
    val m5 = rowsOf(Profile.mergeShards(shardsBy(5)))
    val whole = rowsOf(Profile.mergeShards(Profile.sketchShard(big, cols)))

    for (c <- cols; (name, m) <- Seq(("2-way", m2), ("5-way", m5))) {
      val a = m(c); val w = whole(c)
      // SPLIT NEAR-INVARIANCE: counts and extremes exact; the HLL
      // union estimate tracks the whole-data sketch within the
      // sketch's own error (internal promotion modes can differ
      // between a union and a direct build — measured ±6 on 500)
      assert(a.getLong(1) == w.getLong(1) && a.getLong(2) == w.getLong(2),
        s"$name counts diverge on $c")
      assert(math.abs(a.getLong(3) - w.getLong(3)) <=
          math.max(8L, (0.025 * w.getLong(3)).toLong),
        s"$name HLL estimate diverges on $c: ${a.getLong(3)} vs ${w.getLong(3)}")
      Seq(4, 5, 6, 7).foreach { i =>
        assert(a.isNullAt(i) == w.isNullAt(i) &&
          (a.isNullAt(i) || a.getDouble(i) == w.getDouble(i)),
          s"$name stat $i diverges on $c")
      }
    }

    // vs the full-scan profile: counts/min/max/mean/std agree (std via
    // moment sums vs Welford — equal at round-4 on these magnitudes);
    // the distinct estimate lands within ±5% of exact
    val exact = rowsOf(Profile.profile(big, cols))
    for (c <- cols) {
      val a = whole(c); val e = exact(c)
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2))
      val exDist = e.getLong(3).toDouble
      assert(math.abs(a.getLong(3) - exDist) <= 0.05 * exDist,
        s"HLL estimate off on $c: ${a.getLong(3)} vs $exDist")
      Seq(4, 5, 6, 7).foreach { i =>
        assert(a.isNullAt(i) == e.isNullAt(i) &&
          (a.isNullAt(i) || math.abs(a.getDouble(i) - e.getDouble(i)) < 5e-4),
          s"numeric stat $i diverges on $c")
      }
    }

    // INCREMENTAL: a new drop = one new sidecar unioned in — the
    // combined merge equals profiling the combined data
    val drop = (1000L until 1200L).map(i =>
      (i, s"t${i % 31}", Some(i.toDouble % 13))).toDF("id", "tag", "score")
    val incr = rowsOf(Profile.mergeShards(
      shardsBy(2).unionByName(Profile.sketchShard(drop, cols))))
    val full = rowsOf(Profile.mergeShards(
      Profile.sketchShard(big.unionByName(drop), cols)))
    for (c <- cols) {
      assert(incr(c).getLong(1) == full(c).getLong(1))
      assert(math.abs(incr(c).getLong(3) - full(c).getLong(3)) <=
          math.max(8L, (0.025 * full(c).getLong(3)).toLong),
        s"incremental HLL diverges on $c")
    }
  }

  test("histShard/histMerge: exact merge across uneven shards; clamping and null/NaN exclusion") {
    val s = spark
    import s.implicits._
    // values straddling the bounds: -5 clamps into bucket 0, 100 and
    // 250 into the last; null and NaN vanish
    val vals = Seq[Option[Double]](
      Some(-5.0), Some(0.0), Some(7.5), Some(10.0), Some(49.9),
      Some(50.0), Some(99.9), Some(100.0), Some(250.0), None,
      Some(Double.NaN)) ++ (0 until 89).map(i => Some(i.toDouble + 0.5))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "x")
    val whole = Profile.histShard(df, "x", lo = 0.0, hi = 100.0, nBuckets = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    // 98 non-null finite values land somewhere; every bucket id in range
    assert(whole.map(_._2).sum == 98L)
    assert(whole.forall { case (b, _) => b >= 0 && b < 10 })
    // clamp accounting: bucket 0 holds -5.0, 0.0, 7.5 + 0.5..9.5 (10) = 13
    assert(whole.toMap.apply(0) == 13L)
    // last bucket holds 99.9, 100.0, 250.0 + 90..98.5? (0..88)+0.5 < 90 — none
    assert(whole.toMap.apply(9) == 3L)
    // merge of three uneven shards == the one-shot histogram, exactly
    val shards = Seq(
      df.where(F.col("id") % 5 === 0),
      df.where(F.col("id") % 5 === 1),
      df.where(F.col("id") % 5 >= 2))
    val merged = Profile.histMerge(
        shards.map(Profile.histShard(_, "x", 0.0, 100.0, 10))
          .reduce(_ unionByName _))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(merged == whole, s"merged $merged != whole $whole")
    intercept[IllegalArgumentException](
      Profile.histShard(df, "x", lo = 5.0, hi = 5.0, nBuckets = 10))
    intercept[IllegalArgumentException](
      Profile.histShard(df, "x", lo = 0.0, hi = 100.0, nBuckets = 0))
  }

  test("histQuantile: edges, monotonicity, one-bucket-width error bound") {
    val s = spark
    import s.implicits._
    // 1000 uniform values 0..999 over [0, 1000) in 20 buckets of 50
    val df = (0 until 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "x")
    val counts = Profile.histShard(df, "x", 0.0, 1000.0, 20)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val exact = (q: Double) => q * 999.0 // exact interpolated percentile
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95)) {
      val est = Profile.histQuantile(counts, q, 0.0, 1000.0, 20)
      assert(math.abs(est - exact(q)) <= 50.0 + 1e-9,
        s"q=$q: est $est vs exact ${exact(q)} off by more than one bucket")
    }
    // monotone in q
    val qs = (0 to 20).map(_ / 20.0)
    val ests = qs.map(Profile.histQuantile(counts, _, 0.0, 1000.0, 20))
    assert(ests.zip(ests.tail).forall { case (a, b) => a <= b })
    // q = 0 → start of the first non-empty bucket; q = 1 → within the
    // last bucket's right edge
    assert(Profile.histQuantile(counts, 0.0, 0.0, 1000.0, 20) == 0.0)
    assert(Profile.histQuantile(counts, 1.0, 0.0, 1000.0, 20) <= 1000.0)
    intercept[IllegalArgumentException](
      Profile.histQuantile(counts, 1.5, 0.0, 1000.0, 20))
    intercept[IllegalArgumentException](
      Profile.histQuantile(Seq((0, 0L)), 0.5, 0.0, 1000.0, 20))
    intercept[IllegalArgumentException](
      Profile.histQuantile(Seq((25, 3L)), 0.5, 0.0, 1000.0, 20))
  }

  test("psiFromHists: zero on self, trips on a planted shift, full domain with finite empty-bucket terms") {
    val s = spark
    import s.implicits._
    val base = (0 until 600).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "x")
    val h = Profile.histShard(base, "x", 0.0, 100.0, 10)
    val self = Profile.psiFromHists(h, h, nBuckets = 10).collect()
    assert(self.length == 10)
    assert(self.forall(_.getDouble(3) == 0.0), "PSI on self must be 0")
    // planted shift: the current drop loses its top half entirely
    val shifted = Profile.histShard(
      base.where(F.col("x") < 50.0), "x", 0.0, 100.0, 10)
    val drift = Profile.psiFromHists(h, shifted, nBuckets = 10).collect()
    val psi = drift.map(_.getDouble(3)).sum
    assert(psi > 0.25, s"half the distribution vanished but PSI reads $psi")
    // empty current buckets floor at 1e-6 inside the log — finite terms
    assert(drift.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    // absent buckets surface as zero counts over the full domain
    assert(drift.count(_.getLong(2) == 0L) == 5)
    intercept[IllegalArgumentException](
      Profile.psiFromHists(h, h, nBuckets = 0))
  }

  test("histStream: merged sidecars equal the one-shot histogram; compaction is invisible") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i =>
      (i.toLong, (i % 97).toDouble * 6.0)).toDF("id", "x")
    val side = java.nio.file.Files
      .createTempDirectory("graft_histspec").toString + "/hist"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_histspec_ck").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](s)
    val q = graft.streaming.StreamingOps.histStream(
      ms.toDF.toDF("id", "x"), "x", lo = 0.0, hi = 600.0, nBuckets = 12,
      side, ckpt, compactEverySegs = 2)
    try {
      (0 until 3).foreach { r =>
        ms.addData(df.where(F.col("id") % 3 === r)
          .as[(Long, Double)].collect().toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def read() = graft.streaming.StreamingOps.histOf(s, side)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    val preFold = read()
    val whole = Profile.histShard(df, "x", 0.0, 600.0, 12)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(preFold == whole, s"streamed $preFold != one-shot $whole")
    // the in-stream cadence already folded once; the explicit full
    // fold leaves ONE merged segment and identical reads
    graft.streaming.StreamingOps.histCompact(s, side)
    assert(read() == whole)
    val segs = new java.io.File(side).list().count(_.startsWith("seg="))
    assert(segs == 1, s"full fold must leave one merged segment, found $segs")
  }

  test("histStream: an all-null first batch neither kills the stream nor the read") {
    val s = spark
    import s.implicits._
    // an all-null batch's shard frame is EMPTY, so its partitioned
    // write leaves no seg= leaf — histOf must read that as an empty
    // histogram, and the stream must keep going
    val side = java.nio.file.Files
      .createTempDirectory("graft_hist0").toString + "/hist"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_hist0_ck").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Option[Double])](s)
    val q = graft.streaming.StreamingOps.histStream(
      ms.toDF.toDF("id", "x"), "x", lo = 0.0, hi = 100.0, nBuckets = 10,
      side, ckpt)
    try {
      ms.addData(Seq((1L, None), (2L, None)))
      q.processAllAvailable()
      assert(graft.streaming.StreamingOps.histOf(s, side).count() == 0L)
      ms.addData(Seq((3L, Some(55.0)), (4L, Some(5.0))))
      q.processAllAvailable()
    } finally q.stop()
    val out = graft.streaming.StreamingOps.histOf(s, side)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
    assert(out == Seq((0, 1L), (5, 1L)), s"post-recovery histogram: $out")
  }

  test("histBoundsFromProfile: profiled min/max cover the data; degenerate and error cases") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).map(i => (i, 13.0 + (i * 37 % 401)))
      .toDF("id", "v")
    val prof = Profile.profile(df, Seq("v"))
    val (lo, hi) = Profile.histBoundsFromProfile(prof, "v")
    assert(lo == 13.0 && hi == 413.0, s"bounds: [$lo, $hi)")
    // nothing clamps under profiled bounds: quantiles hold the
    // ≤-one-bucket-width contract against the exact percentiles
    val nB = 16
    val counts = Profile.histShard(df, "v", lo, hi, nB)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(counts.map(_._2).sum == 400L)
    val w = (hi - lo) / nB
    val exact = df.stat.approxQuantile("v", Array(0.5, 0.95), 0.0)
    val est50 = Profile.histQuantile(counts, 0.5, lo, hi, nB)
    val est95 = Profile.histQuantile(counts, 0.95, lo, hi, nB)
    assert(math.abs(est50 - exact(0)) <= w, s"p50 $est50 vs ${exact(0)}")
    assert(math.abs(est95 - exact(1)) <= w, s"p95 $est95 vs ${exact(1)}")
    // constant column: widened to width 1, everything in bucket 0
    val const = Seq((1L, 7.0), (2L, 7.0)).toDF("id", "v")
    val (cl, ch) = Profile.histBoundsFromProfile(
      Profile.profile(const, Seq("v")), "v")
    assert(cl == 7.0 && ch == 8.0)
    val cCounts = Profile.histShard(const, "v", cl, ch, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(cCounts == Seq((0, 2L)))
    assert(math.abs(Profile.histQuantile(cCounts, 0.5, cl, ch, 8) - 7.0)
      <= (ch - cl) / 8)
    // merged STREAM sidecar profiles feed it the same way
    val shards = Profile.mergeShards(
      Profile.sketchShard(df.where(F.col("id") < 200), Seq("v"))
        .unionByName(
          Profile.sketchShard(df.where(F.col("id") >= 200), Seq("v"))))
    val (sl, sh) = Profile.histBoundsFromProfile(shards, "v")
    assert(sl == lo && sh == hi, s"sidecar bounds diverge: [$sl, $sh)")
    // error surfaces: unknown column, non-numeric column
    intercept[IllegalArgumentException](
      Profile.histBoundsFromProfile(prof, "nope"))
    val txt = Seq((1L, "a")).toDF("id", "t")
    intercept[IllegalArgumentException](
      Profile.histBoundsFromProfile(Profile.profile(txt, Seq("t")), "t"))
  }
}
