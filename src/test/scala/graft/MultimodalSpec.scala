package graft

import graft.operators.Multimodal
import org.apache.spark.sql.{functions => F}

/** Multimodal plumbing: schema, deterministic stub decode, frame
  * explosion, payload stats.
  */
class MultimodalSpec extends SparkSpec {

  lazy val media = {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "a " * 300), (1L, "b " * 100), (2L, "c " * 600), (3L, "d " * 50))
      .toDF("doc_id", "text")
    Multimodal.syntheticMedia(docs, "doc_id", "text")
  }

  test("canonical schema: media_id, kind, payload BINARY, typed meta struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("stub decode is deterministic and fixed-dim") {
    val f1 = Multimodal.decodeFeatures(media, dim = 32).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2)))
    val f2 = Multimodal.decodeFeatures(media, dim = 32).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](2)))
    assert(f1.map(_._1).toSeq == f2.map(_._1).toSeq)
    assert(f1.zip(f2).forall { case ((_, a), (_, b)) => a == b })
    assert(f1.forall(_._2.length == 32))
    // different payloads decode to different features
    assert(f1(0)._2 != f1(1)._2)
  }

  test("frame sampling explodes to ~payload/256 rows, respecting everyN") {
    val all = Multimodal.frameSample(media, everyN = 1)
    val sampled = Multimodal.frameSample(media, everyN = 2)
    assert(all.count() > media.count()) // real explosion
    assert(sampled.count() <= all.count())
    // frame 0 of each media is identical across runs
    val a = all.where(F.col("frame_idx") === 0).orderBy("media_id")
      .collect().map(_.getAs[Array[Byte]]("frame").toSeq)
    val b = sampled.where(F.col("frame_idx") === 0).orderBy("media_id")
      .collect().map(_.getAs[Array[Byte]]("frame").toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("payload stats aggregate by kind") {
    val stats = Multimodal.payloadStats(media).collect()
    assert(stats.nonEmpty)
    assert(stats.forall(_.getLong(1) > 0))
  }
}
