package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Multimodal-column plumbing for training-data pipelines: image /
  * audio / video ride as opaque `BINARY` payloads with typed metadata,
  * processed per-partition in bounded batches (the Scala analogue of
  * mapInPandas batch processing).
  *
  * Media codecs are not available in this build environment, so the
  * decode step is a pluggable [[MediaDecoder]] whose default is a
  * clearly-marked DETERMINISTIC STUB (byte-hash features / byte-slice
  * frames). The Spark-side contract — schema, batch iteration,
  * partition sizing, row explosion for frames — is real and tested;
  * swapping in a JNI/FFmpeg-backed decoder changes no plan shape.
  *
  * Canonical media schema:
  * (media_id LONG, kind STRING, payload BINARY,
  *  meta STRUCT<width INT, height INT, sample_rate INT, n_frames INT>)
  */
object Multimodal {

  /** Pluggable decoder: payload bytes → fixed-dim feature vector and
    * payload → frame payloads. Implementations must be deterministic
    * per payload for exactly-once semantics under task retry.
    */
  trait MediaDecoder extends Serializable {
    def features(kind: String, payload: Array[Byte], dim: Int): Array[Double]
    def frames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]]
  }

  /** STUB decoder — stands in for image/audio decode libraries that
    * are absent here. Features: seeded byte-rolling-hash per dimension
    * (deterministic, spread over [0,1)); frames: fixed-size byte
    * slices. Replace with a real codec in production.
    */
  object StubDecoder extends MediaDecoder {
    def features(kind: String, payload: Array[Byte], dim: Int): Array[Double] = {
      val out = new Array[Double](dim)
      var h = 1125899906842597L ^ kind.hashCode.toLong
      var i = 0
      while (i < payload.length) {
        h = h * 31 + (payload(i) & 0xFF)
        out(i % dim) += ((h >>> 11) & 0xFFFF) / 65536.0
        i += 1
      }
      val n = math.max(1, payload.length / dim)
      out.map(_ / n)
    }

    def frames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
      val frameSize = 256
      val nFrames = math.max(1, payload.length / frameSize)
      (0 until nFrames by math.max(1, everyN)).map { f =>
        payload.slice(f * frameSize, math.min((f + 1) * frameSize, payload.length))
      }
    }
  }

  /** Build the canonical media frame from any table with an id and a
    * text-ish column — deterministic synthetic payloads for tests and
    * benchmarks (payload = UTF-8 bytes; kind round-robins by id).
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      F.col(idCol).cast("long").as("media_id"),
      F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        // pmod, not %: Spark's % keeps the dividend's sign, so a
        // negative id would index 0 (ANSI error) or -1 (wrong element)
        (F.pmod(F.col(idCol), F.lit(3)) + 1).cast("int")).as("kind"),
      F.encode(F.col(textCol), "UTF-8").as("payload"),
      F.struct(
        F.lit(64).as("width"), F.lit(64).as("height"),
        F.lit(16000).as("sample_rate"),
        (F.length(F.col(textCol)) / 256 + 1).cast("int").as("n_frames")).as("meta"))

  /** Decode features per media row: mapPartitions with the broadcast
    * decoder — batch shape is the partition iterator, memory bounded
    * by `spark.sql.files.maxPartitionBytes` at scan time. Output:
    * (media_id, kind, features ARRAY<DOUBLE>).
    */
  def decodeFeatures(
      media: DataFrame,
      dim: Int = 64,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      // a row with no payload or kind has nothing to decode — drop it
      // rather than NPE the whole scan in the decoder
      .where(F.col("payload").isNotNull && F.col("kind").isNotNull)
      .select($"media_id".as[Long], $"kind".as[String], $"payload".as[Array[Byte]])
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          (id, kind, decoder.features(kind, payload, dim))
        }
      }
      .toDF("media_id", "kind", "features")
  }

  /** Frame sampling (video path): one output row per sampled frame.
    * flatMap explosion — row count grows by ~n_frames/everyN, so
    * repartition downstream by media_id if frames feed a shuffle.
    * Output: (media_id, frame_idx, frame BINARY).
    */
  def frameSample(
      media: DataFrame,
      everyN: Int = 1,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      // null payload = no frames (same verdict as decodeFeatures)
      .where(F.col("payload").isNotNull)
      .select($"media_id".as[Long], $"payload".as[Array[Byte]])
      .flatMap { case (id, payload) =>
        decoder.frames(payload, everyN).zipWithIndex.map {
          case (fr, idx) => (id, idx, fr)
        }
      }
      .toDF("media_id", "frame_idx", "frame")
  }

  /** Payload statistics by kind — pure column algebra over the binary
    * column (octet lengths), no decode.
    */
  def payloadStats(media: DataFrame): DataFrame =
    media.groupBy("kind")
      .agg(
        F.count(F.lit(1)).as("n_media"),
        F.round(F.avg(F.length(F.col("payload"))), 4).as("avg_bytes"),
        F.max(F.length(F.col("payload"))).as("max_bytes"))
      .orderBy("kind")
}
