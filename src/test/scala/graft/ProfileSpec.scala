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
}
