package graft.streaming

import graft.spectral.LocalLaplacian
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is batch-only
  * (SURVEY.md §2.3 — no streaming surface at all); these operators are
  * the engine's additions for continuous pipelines: watermarked
  * windowed aggregation, stateful per-key statistics, and incremental
  * λ-scoring of an embedding stream against a built index (the
  * streaming analogue of ArrowSpaceModel.search's scoring kernel —
  * new items get λ and a blended score without rebuilding the graph).
  */
object StreamingOps {

  /** Tumbling-window event counts with a watermark. Input must carry
    * (ts TIMESTAMP, event_type STRING, value DOUBLE). Late data beyond
    * the watermark is dropped — state is bounded, the aggregation is
    * partial+final (same shape as the batch q_events_hourly query).
    */
  def windowedEventCounts(
      events: DataFrame,
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(F.window(F.col("ts"), window), F.col("event_type"))
      .agg(
        F.count(F.lit(1)).as("n_events"),
        F.round(F.sum("value"), 2).as("sum_value"))
      .select(
        F.col("window.start").as("window_start"),
        F.col("event_type"), F.col("n_events"), F.col("sum_value"))

  /** Per-key running statistics via mapGroupsWithState — the custom
    * state pattern (count / mean / max). State is unbounded per key
    * here; production deployments should add
    * `GroupStateTimeout.ProcessingTimeTimeout` + `setTimeoutDuration`
    * so abandoned keys age out (left out of the default because
    * timeout polling keeps triggering empty micro-batches, which
    * breaks drain-and-stop harnesses).
    */
  final case class RunningStats(n: Long, mean: Double, max: Double)

  def runningUserStats(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".as[Long], $"value".as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState[RunningStats, (Long, Long, Double, Double)](
        GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[RunningStats]) =>
          val prev = state.getOption.getOrElse(RunningStats(0L, 0.0, Double.MinValue))
          var n = prev.n
          var sum = prev.mean * prev.n
          var mx = prev.max
          rows.foreach { case (_, v) =>
            n += 1; sum += v; if (v > mx) mx = v
          }
          val next = RunningStats(n, if (n == 0) 0.0 else sum / n, mx)
          state.update(next)
          (user, next.n, next.mean, next.max)
      }
      .toDF("user_id", "n", "mean", "max")
  }

  /** Open-session state for [[sessionizeStream]]: event-time bounds
    * and count of the ONE in-progress session per user — state is
    * O(1) per key regardless of stream length, the property that lets
    * a 100 TB/day event stream sessionize with bounded memory. */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** Streaming gap sessionization — the stateful face of the batch
    * `q_sessionize` window query (sessions split when consecutive
    * events of a user are more than `gapSeconds` apart). Per user,
    * `flatMapGroupsWithState` keeps only the ONE open session and
    * emits a session row the moment it provably closes:
    *
    *   - a new event more than `gapSeconds` after the open session's
    *     last event closes it (emitted immediately, Append mode);
    *   - the event-time TIMEOUT (watermark passing last + gap) closes
    *     a session no future in-watermark event can extend — so idle
    *     users' state ages out and every session is eventually
    *     emitted exactly once.
    *
    * Events later than the watermark are dropped by the engine before
    * the state function (the documented Append + EventTimeTimeout
    * contract); within the watermark, out-of-order events that land
    * inside the open session merely widen it (min-start/max-last), so
    * the output equals the batch window query whenever arrival lag
    * stays under `watermarkDelay`. Input needs (user_id, ts
    * TIMESTAMP); output (user_id, session_start, session_end,
    * n_events) in event-time.
    */
  def sessionizeStream(
      events: DataFrame,
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive; got $gapSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(F.col("user_id").cast("long"), F.col("ts").cast("timestamp"))
      // null keys/times carry no session semantics — and a null
      // user_id would NPE the primitive Long encoder below
      .where(F.col("user_id").isNotNull && F.col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, (Long, java.sql.Timestamp, java.sql.Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[OpenSession]) =>
          def emit(s: OpenSession) =
            (user, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n)
          if (state.hasTimedOut) {
            // watermark passed last + gap: nothing in-watermark can
            // extend this session — close and clear
            val out = state.getOption.map(emit).toIterator
            state.remove()
            out
          } else {
            val gapMs = gapSeconds * 1000L
            val closed = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
            var open = state.getOption
            rows.map(_._2.getTime).toArray.sorted.foreach { t =>
              open match {
                case None => open = Some(OpenSession(t, t, 1L))
                case Some(s) if t > s.last + gapMs =>
                  closed += s
                  open = Some(OpenSession(t, t, 1L))
                case Some(s) =>
                  open = Some(OpenSession(
                    math.min(s.start, t), math.max(s.last, t), s.n + 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.map(emit).iterator
          }
      }
      .toDF("user_id", "session_start", "session_end", "n_events")
  }

  /** Incremental λ-scoring: for each arriving (id, vec), compute the
    * synthetic λ against the broadcast feature Laplacian and the
    * blended score vs a fixed query — stateless per-row map, so it
    * runs at input rate with no shuffle (index maintenance without
    * graph rebuild; SURVEY.md §2.3 "incremental index maintenance").
    */
  def scoreStream(
      vectors: DataFrame,
      lap: LocalLaplacian,
      tau: Double,
      query: Array[Double],
      blend: Double): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bcLap = spark.sparkContext.broadcast(lap)
    val bcQ = spark.sparkContext.broadcast(query)
    val lambdaQ = lap.synth(query, tau)
    vectors
      .select($"id".as[Long], $"vec".as[Array[Double]])
      .map { case (id, v) =>
        val l = bcLap.value
        val lam = l.synth(v, tau)
        val cos = graft.functions.VectorKernels.cosine(bcQ.value, v)
        val score = blend * cos + (1.0 - blend) / (1.0 + math.abs(lambdaQ - lam))
        (id, lam, score)
      }
      .toDF("id", "lambda", "score")
  }

  /** Windowed drift monitor — the streaming face of
    * [[graft.operators.Profile.psiBuckets]]: per event-time window,
    * the PSI of the arriving values against a STATIC reference
    * distribution captured once by
    * [[graft.operators.Profile.psiReference]] (round-6 decile edges +
    * reference fractions — 2·buckets doubles riding as literals, no
    * stream-static join at all). Bucketing is the shared
    * `Profile.bucketExpr` CASE chain — batch monitor, reference
    * builder, and stream cannot drift — and the whole window's PSI
    * folds into ONE streaming aggregate: per-bucket conditional
    * counts, then the Σ(p−q)·ln(p/q) algebra over those counts in the
    * same select. Append-mode-capable: the watermark closes windows,
    * each emits exactly one (window_start, n_events, psi) row — the
    * alerting stream a 100 TB ingest pipeline tails to catch a source
    * going sideways BEFORE the corrupted drop reaches training.
    */
  def psiStream(
      values: DataFrame,
      refEdges: Array[Double],
      refFracs: Array[Double],
      valueCol: String = "value",
      window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    require(refEdges.length + 1 == refFracs.length,
      s"need |edges| + 1 == |fracs|; got ${refEdges.length}/${refFracs.length}")
    val buckets = refFracs.length
    val eps = 1e-6
    val b = graft.operators.Profile.bucketExpr(
      refEdges, buckets, F.col(valueCol).cast("double"))
    val counts = (0 until buckets).map(i =>
      F.sum(F.when(F.col("__bucket") === i, 1L).otherwise(0L)).as(s"__n$i"))
    val total = (0 until buckets).map(i => F.col(s"__n$i")).reduce(_ + _)
    val psi = (0 until buckets).map { i =>
      val q = F.col(s"__n$i") / total.cast("double")
      val p = F.lit(refFracs(i))
      (p - q) * F.log(F.greatest(p, F.lit(eps)) / F.greatest(q, F.lit(eps)))
    }.reduce(_ + _)
    values
      .withWatermark("ts", watermark)
      .withColumn("__bucket", b)
      .groupBy(F.window(F.col("ts"), window))
      .agg(counts.head, counts.tail: _*)
      .select(
        F.col("window.start").as("window_start"),
        total.as("n_events"),
        F.round(psi, 6).as("psi"))
  }

  /** Streaming exact dedup: drop documents whose normalized-text
    * fingerprint was already seen (state = one fingerprint per kept
    * doc; bound it with a watermark on `ts` when the input has event
    * time). The streaming face of Dedup.exactGroups' keep-first.
    */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.operators.TextOps.fingerprint(F.col("text")))
      .dropDuplicates("fp")

  /** Watermark-bounded streaming dedup: same keep-first contract, but
    * fingerprint state is dropped once it ages past `delay` behind the
    * event-time watermark on `tsCol` — the state-bounded shape an
    * unbounded 100 TB stream requires (plain dropDuplicates state
    * grows forever). Duplicates farther apart than the watermark can
    * re-admit — the standard trade, made explicit here.
    */
  def dedupStreamWithinWatermark(
      docs: DataFrame, tsCol: String, delay: String): DataFrame =
    docs
      .withWatermark(tsCol, delay)
      .withColumn("fp", graft.operators.TextOps.fingerprint(F.col("text")))
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming near-duplicate detection against a STATIC corpus — the
    * standard training-data ingestion gate: each arriving document is
    * MinHash-banded and equi-joined (stream-static join, no state)
    * against the precomputed band table of the existing corpus, then
    * verified with exact signature agreement. Emits (doc_id, match_id,
    * est_jaccard) for arrivals whose estimated Jaccard meets the
    * threshold. The static band table is computed once and reused
    * every micro-batch; the stream side only pays signature hashing +
    * a bucket join — input-rate throughput at any corpus size (the
    * corpus side can be bucketed Parquet for an exchange-free join).
    */
  def nearDupAgainstCorpus(
      stream: DataFrame,
      corpus: DataFrame,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      eventTime: Option[(String, String)] = None): DataFrame = {
    import graft.operators.Dedup
    // two-step hashing with a projection boundary, like
    // minhashNearDupPairs: the per-shingle string hashing must
    // evaluate once, not once per minhash lane
    def sigd(df: DataFrame, idAs: String, sigAs: String, carry: Seq[String]): DataFrame =
      Dedup.bandKeys(
        // null text carries no signature (same verdict as the batch
        // signature pass): unfiltered, every null doc would band to
        // the SAME 16 (band, hash-of-null-lanes) keys on both sides —
        // one skewed join task per micro-batch
        df.where(F.col("text").isNotNull).select(
          F.col("doc_id") +:
            F.transform(
              Dedup.shingles(F.col("text"), shingleLen),
              s => F.xxhash64(s)).as("shh") +:
            carry.map(F.col): _*)
          .select(
            F.col("doc_id") +:
              Dedup.minhashFromHashes(F.col("shh"), numHashes).as("sig") +:
              carry.map(F.col): _*),
        numHashes, bands)
        .withColumnRenamed("doc_id", idAs)
        .withColumnRenamed("sig", sigAs)
    val corpusBands = sigd(corpus, "match_id", "sig_c", Nil)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val streamSide = eventTime match {
      case Some((tsCol, delay)) =>
        // the event-time column rides along so the final dedup can be
        // watermark-bounded
        sigd(stream.withWatermark(tsCol, delay), "doc_id", "sig_s", Seq(tsCol))
      case None => sigd(stream, "doc_id", "sig_s", Nil)
    }
    val flagged = streamSide
      .join(corpusBands, Seq("band", "bh"))
      .withColumn("est_jaccard", Dedup.sigAgreement(F.col("sig_s"), F.col("sig_c"), numHashes))
      .where(F.col("est_jaccard") >= threshold)
    // A doc colliding with the same corpus doc in several bands emits
    // duplicate pairs. Collapsing them on a stream is STATEFUL: with
    // event time supplied the dedup state is watermark-bounded
    // (dropDuplicatesWithinWatermark); without it, plain dropDuplicates
    // state grows with the number of distinct flagged pairs — fine for
    // bounded backfills, pass `eventTime` for an unbounded stream.
    eventTime match {
      case Some((tsCol, _)) =>
        flagged.select("doc_id", "match_id", "est_jaccard", tsCol)
          .dropDuplicatesWithinWatermark("doc_id", "match_id")
          .select("doc_id", "match_id", "est_jaccard")
      case None =>
        flagged.select("doc_id", "match_id", "est_jaccard")
          .dropDuplicates("doc_id", "match_id")
    }
  }

  /** The SELF-GROWING streaming dedup gate — the shape a continuously-
    * ingesting training pipeline actually runs: each micro-batch is
    * (1) collapsed within itself ([[graft.operators.Dedup.dedupCorpus]]
    * — exact-fingerprint keepers, then near-dup losers at the Jaccard
    * threshold), (2) deduped against EVERYTHING admitted so far — the
    * persisted base index PLUS every earlier batch's survivors
    * ([[graft.operators.Dedup.minhashIndexLoadWithAppends]] ∪
    * [[graft.operators.Dedup.dedupAgainstIndex]]), and (3) its
    * survivors' band rows + shingles land as an idempotent
    * `seg=<batchId>` append segment beside the base layout while the
    * surviving documents append to `outPath` the same way. Unlike
    * [[nearDupAgainstCorpus]] (static reference, flags only), the gate
    * ADMITS and REMEMBERS: a duplicate arriving two days after its
    * original is still caught, across restarts, because the state is
    * the saved layout, not executor memory.
    *
    * Replay safety is structural, not best-effort: the per-batch dedup
    * reads only segments `< batchId` (a replayed batch never sees its
    * own partial first attempt), its writes are dynamic-partition
    * overwrites of its own leaves, and compaction
    * ([[graft.operators.Dedup.minhashCompactAppends]], every
    * `compactEverySegs` accumulated segments) folds only segments
    * strictly below the in-flight batch id — the same crash-replay
    * contract as [[ivfAppendStream]], with one advantage: band rows
    * are per-document, so the appended state is EXACT at any size and
    * no drift-triggered rebuild exists to need.
    *
    * 100 TB shape: per batch the stream side pays one signature pass
    * over its own rows; the state side contributes stored band rows to
    * the candidate equi-join (pruned by band on the saved layout) and
    * stored shingles to the bounded verify — cost scales with the
    * batch's candidate mass, not with corpus size. State on disk grows
    * with admitted documents only (duplicates are never appended).
    *
    * Returns the started query; callers own its lifecycle.
    */
  def minhashGateStream(
      docs: DataFrame,
      indexPath: String,
      outPath: String,
      checkpoint: String,
      jaccardThreshold: Double = 0.8,
      compactEverySegs: Int = defaultCompactEverySegs)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        minhashGateBatch(batch, batchId, indexPath, outPath,
          jaccardThreshold)
        // cadence counts REAL (seg >= 0) per-batch segments only: the
        // tiered fold leaves a short ladder of cold merged (negative)
        // segments behind by design, and counting those would make
        // every subsequent batch re-trigger the fold
        if (compactEverySegs > 0 &&
            realSegCount(spark, s"$indexPath/bands_appends")
              >= compactEverySegs) {
          graft.operators.Dedup.minhashCompactAppends(
            spark, indexPath, maxSegExclusive = batchId, tiered = true)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** One gate micro-batch, factored out so the replay law is testable
    * directly: calling this twice with the same `batchId` leaves the
    * saved state and the output byte-for-byte row-identical. */
  private[graft] def minhashGateBatch(
      batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, jaccardThreshold: Double): Unit = {
    import graft.operators.Dedup
    val spark = batch.sparkSession
    // per-epoch cached base listings + per-batch appends (identical
    // union to minhashIndexLoadWithAppends — see the cache's scaladoc)
    val state = Dedup.minhashIndexLoadWithAppendsCached(
      spark, indexPath, maxSegExclusive = batchId)
    // ONE signature pass per micro-batch, shared by the within-batch
    // self-dedup, the against-state probe, and the append segment
    // (signatures are a pure function of the document, so the shared
    // frame is bit-identical to the three recomputes it replaces —
    // which, with the exact-dedup fingerprint shuffle re-run per
    // consumer, were the dominant per-batch CPU at the bench point).
    // Sharing requires the within-batch scheme's lane count (64, the
    // dedupCorpus contract) to equal the saved index's; any other
    // stored width falls back to the original per-stage passes with
    // decisions unchanged.
    val shareSigs = state.numHashes == 64
    // a micro-batch's slim band keys are broadcast-sized by
    // construction (bounded by the trigger, not the corpus), so the
    // against-state join scans the stored band state IN PLACE — the
    // per-batch cost that must not grow with accumulated state is the
    // state SHUFFLE, and this removes it. Batches above the guard
    // (a backfill replayed through the gate) fall back to the
    // shuffling join rather than risk a driver OOM. The guard bounds
    // what is actually broadcast — band-KEY rows (docs × bands, each
    // ~100 B as a HashedRelation entry), not documents: 2M band rows
    // ≈ 200 MB built, inside a default 1 GB driver headroom, where a
    // docs-only bound would have let 1M docs × 16 bands = 16M rows
    // (~1.6 GB) through.
    val broadcastProbe = batch.count() * state.bands <= 2000000L
    val (survivors, batchCaches) =
      if (shareSigs) {
        val (within, exactCached, sigs) = Dedup.dedupCorpusSharedSigs(
          batch, jaccardThreshold, state.shingleLen)
        val sigsW = sigs.join(
          within.select("doc_id"), Seq("doc_id"), "left_semi")
        val losers = Dedup.minhashNearDupAgainstIndexFromSigs(
            within, sigsW, state, estFloor = 0.75 * jaccardThreshold,
            broadcastProbe = broadcastProbe)
          .where(F.col("jaccard") >= jaccardThreshold)
          .select("doc_id").distinct()
        (within.join(losers, Seq("doc_id"), "left_anti"),
          Seq(exactCached, sigs))
      } else
        (Dedup.dedupAgainstIndex(
          Dedup.dedupCorpus(batch, jaccardThreshold, state.shingleLen),
          state, jaccardThreshold, broadcastProbe = broadcastProbe),
          Seq.empty[DataFrame])
    val survivorsCached = survivors
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally (ADVICE r14): a throw in the probe/append/write path
    // must not leak the three per-batch persisted frames across batch
    // retries in a long-running stream JVM
    try {
      survivorsCached.count()
      if (shareSigs) {
        // survivor signatures = the shared pass filtered to admitted ids
        val sigsS = batchCaches(1).join(
          survivorsCached.select("doc_id"), Seq("doc_id"), "left_semi")
        Dedup.minhashAppendSegmentFromSigs(
          survivorsCached, sigsS, indexPath, batchId,
          state.shingleLen, state.numHashes, state.bands)
      } else
        Dedup.minhashAppendSegment(
          survivorsCached, indexPath, batchId,
          state.shingleLen, state.numHashes, state.bands)
      survivorsCached
        .withColumn("seg", F.lit(batchId))
        // bounded file count per batch segment — the gate's output is
        // read as a whole corpus downstream, not per-task
        .coalesce(8)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("seg")
        .parquet(outPath)
    } finally {
      survivorsCached.unpersist(blocking = false)
      batchCaches.foreach(_.unpersist(blocking = false))
    }
  }

  /** Streaming SEMANTIC dedup gate — the embedding sibling of
    * [[minhashGateStream]] (VERDICT r12 #3: SemDeDup existed only as
    * the batch [[graft.operators.Dedup.semanticNearDupPairs]], so a
    * continuously-ingesting pipeline could not semantically dedup at
    * admission). State is a persisted IVF layout
    * ([[graft.operators.Similarity.ivfSave]] over the base corpus):
    * the quantizer stays FROZEN (the streamed-append contract) while
    * admitted vectors land as idempotent `seg=batchId` list segments,
    * so a semantic duplicate arriving days after its original is
    * still caught, across restarts, because the state is the layout.
    *
    * Per micro-batch, three stages (each deterministic, so a replayed
    * batch reproduces its decisions byte-for-byte):
    *
    *  1. assign the batch against the frozen centroids (the same
    *     recurrence as every append path);
    *  2. WITHIN-batch: a row loses iff a SMALLER-id batch row in the
    *     same assigned cell has round-4 cosine ≥ threshold — SemDeDup
    *     cell blocking (equi-join on the cell, never all-pairs;
    *     same-cell-only recall is the documented SemDeDup contract)
    *     with [[graft.operators.Dedup.dedupCorpus]]'s smaller-id-wins
    *     rule, so the verdict is replayable SQL, not a greedy scan;
    *  3. AGAINST state: each survivor probes its `nprobe` nearest
    *     lists over base + committed segments (`seg < batchId` — a
    *     replayed batch never sees its own partial first attempt) and
    *     is rejected iff any stored vector there reaches the
    *     threshold. The state read prunes STATICALLY to the batch's
    *     probed clusters ([[embedGateStateScan]] — explicit partition
    *     filter, never a DPP bet); the bounded batch probe rows ride
    *     per-row scalar-SQ8 codes (+ an exact error bound) in a
    *     broadcast ~6-8× slimmer than the full vectors, a code-space
    *     pass keeps only near-threshold pairs, and an exact rerank
    *     against the broadcast batch vectors makes the decisions
    *     byte-identical to the uncompressed join. Batches whose probe
    *     fan-out exceeds the broadcast budget fall back to a join
    *     that shuffles only the probed fraction of the state.
    *
    * `nprobe` ≤ 0 routes to [[graft.operators.Similarity
    * .suggestNprobe]] (sizing-matched — the r12 default contract).
    * Admitted rows append to the layout and to `outPath` as
    * `seg=batchId` (both dynamic-partition overwrites). Compaction
    * every `compactEverySegs` segments via [[graft.operators
    * .Similarity.ivfCompactAppends]], folding only committed
    * segments. 100 TB shape: per batch the gate pays one assignment
    * pass over its own rows plus a probe-pruned scan of nprobe/k of
    * the stored lists — cost scales with the batch and the probed
    * fraction, never the whole corpus; state grows with ADMITTED
    * vectors only.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def embedGateStream(
      vectors: DataFrame,
      indexPath: String,
      outPath: String,
      checkpoint: String,
      cosineThreshold: Double = 0.9,
      nprobe: Int = 0,
      compactEverySegs: Int = defaultCompactEverySegs)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(cosineThreshold > 0.0 && cosineThreshold <= 1.0,
      s"cosineThreshold must be in (0, 1]; got $cosineThreshold")
    val spark = vectors.sparkSession
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        embedGateBatch(batch, batchId, indexPath, outPath,
          cosineThreshold, nprobe)
        // REAL (seg >= 0) segments only — see minhashGateStream's hook
        if (compactEverySegs > 0 &&
            realSegCount(spark, s"$indexPath/applists")
              >= compactEverySegs) {
          graft.operators.Similarity.ivfCompactAppends(
            spark, indexPath, maxSegExclusive = batchId, tiered = true)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Frozen per-epoch gate state: the quantizer sidecar parse, the
    * assignment model, the centroid broadcast and the ANALYZED base
    * `lists` frame (i.e. its driver-side file listing), all pure
    * functions of the saved index. Through r14 every micro-batch
    * rebuilt ALL of it — a sidecar read, TWO extra directory listings
    * (the full `ivfLoad` the gate called discarded its lists union
    * unread) and a fresh centroid broadcast of per-batch driver work
    * (guide §5 driver work, §6 listing I/O) that only actually changes
    * when the index is re-saved (rebuild / takedown — offline ops by
    * the gate's contract). Keyed on the (mtime, length) fingerprint of
    * `centroids.json` plus the `lists` dir mtime: every re-save path
    * (ivfSave / ivfRebuild / ivfLayoutRemove) writes or rename-swaps
    * fresh objects, so a swapped-in rebuild is picked up on the next
    * batch's fingerprint probe (two getFileStatus calls). `applists`
    * stays a PER-BATCH read — a new segment commits every batch — but
    * reads with the cached explicit schema, skipping per-batch footer
    * inference. Decisions are byte-identical: everything cached is a
    * deterministic function of on-disk state the batch would otherwise
    * re-derive.
    */
  private[graft] final case class GateIvfState(
      fp: String,
      centroids: Array[(Int, Array[Double])],
      k: Int,
      model: graft.scale.DeterministicKMeans.Model,
      bcCent: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Double])]],
      dims: Int,
      baseLists: DataFrame,
      listsSchema: org.apache.spark.sql.types.StructType)

  private val gateIvfCache =
    new java.util.concurrent.ConcurrentHashMap[String, GateIvfState]()

  private[graft] def gateIvfState(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): GateIvfState = {
    val conf = spark.sessionState.newHadoopConf()
    val cp = new org.apache.hadoop.fs.Path(s"$indexPath/centroids.json")
    val lp = new org.apache.hadoop.fs.Path(s"$indexPath/lists")
    val fs = cp.getFileSystem(conf)
    val cst = fs.getFileStatus(cp)
    val lst = fs.getFileStatus(lp)
    val fp = s"${cst.getModificationTime}:${cst.getLen}:${lst.getModificationTime}"
    val cached = gateIvfCache.get(indexPath)
    if (cached != null && cached.fp == fp) cached
    else graft.core.Debug.timed(s"egate state-cache build") {
      val (cent, k) = graft.operators.Similarity.ivfLoadQuantizer(spark, indexPath)
      val model = graft.scale.DeterministicKMeans.Model(
        cent.sortBy(_._1).map(_._2))
      val bc = spark.sparkContext.broadcast(cent)
      val base = spark.read.parquet(s"$indexPath/lists")
        .select("id", "vec", "cluster")
      val st = GateIvfState(fp, cent, k, model, bc,
        cent.headOption.map(_._2.length).getOrElse(0), base, base.schema)
      // bound the per-JVM footprint across many index paths; evicted
      // broadcasts are reclaimed by the ContextCleaner once unreferenced
      if (gateIvfCache.size > 8) gateIvfCache.clear()
      gateIvfCache.put(indexPath, st)
      st
    }
  }

  /** One semantic-gate micro-batch, factored out so the replay law is
    * testable directly: same `batchId` twice ⇒ byte-identical state
    * and output. */
  private[graft] def embedGateBatch(
      batch: DataFrame, batchId: Long, indexPath: String,
      outPath: String, cosineThreshold: Double, nprobe: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    import graft.operators.Similarity
    val st = gateIvfState(spark, indexPath)
    val np =
      if (nprobe > 0) math.min(nprobe, st.k)
      else Similarity.suggestNprobe(st.k)
    val model = st.model
    val assigned = graft.scale.DeterministicKMeans.assign(
        batch.select(F.col("id").cast("long").as("id"),
          F.col("vec").cast("array<double>").as("vec")),
        model, idCol = "id", vecCol = "vec")
      .select("id", "vec", "cluster")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBatch = graft.core.Debug.timed(s"egate[$batchId] assign+count") {
      assigned.count()
    }
    try {
      val cos = (a: org.apache.spark.sql.Column,
          b: org.apache.spark.sql.Column) =>
        F.round(graft.functions.VectorFunctions.cosine(a, b), 4)
      // stage 2: within-batch losers (smaller-id same-cell near-dup)
      val losers = assigned
        .select(F.col("cluster"),
          F.col("id").as("id_a"), F.col("vec").as("vec_a"))
        .join(assigned.select(F.col("cluster"),
          F.col("id").as("id_b"), F.col("vec").as("vec_b")), "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos(F.col("vec_a"), F.col("vec_b")) >= cosineThreshold)
        .select(F.col("id_b").as("id")).distinct()
      // the within-batch survivor set is read by THREE consumers (the
      // probe-row encode, the exact-rerank broadcast, and the admitted
      // anti-join) — persist it or the cell-blocked self-join above,
      // the batch's dominant cost, recomputes per consumer
      val within = assigned.join(losers, Seq("id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // stage 3: probe the stored lists (base + seg < batchId). Probe
      // rows ship per-row scalar-SQ8 codes instead of the full vector
      // (dims + ~96 B vs 8·dims + 48 B — the broadcast shrinks ~6-8×,
      // VERDICT r13 #3), with an encode-time EXACT error bound so the
      // code-space pass can never falsely prune a pair the exact
      // predicate would reject on; near-threshold survivors exact-
      // rerank against the full batch vectors (a broadcast of the
      // batch itself), so gate DECISIONS are byte-identical to the
      // full-vector join.
      val bcCent = st.bcCent
      val dimsExpected = st.dims
      val probeRows = within.select("id", "vec")
        .as[(Long, Array[Double])]
        .flatMap { case (i, v) =>
          // every ADMITTED row flows through here before any write, so
          // this is the gate's dims guard: the cosine kernel silently
          // truncates to the shorter operand, and a mismatched vector
          // would otherwise get a wrong verdict AND poison the
          // persisted layout (same fail-loud contract as the batch
          // search faces)
          require(v.length == dimsExpected,
            s"vector $i has ${v.length} dims but the gate's index was " +
              s"built for $dimsExpected")
          val probes = bcCent.value
            .map { case (c, cv) =>
              (c, 1.0 - graft.functions.VectorKernels.cosine(v, cv))
            }
            .sortBy { case (c, d) => (d, c) }
            .take(np).map(_._1)
          val (codes, lo, hi, err) = graft.functions.Sq8Kernels.encodeScalar(v)
          probes.map(c => (i, codes, lo, hi, err, c))
        }
        .toDF("bid", "bcode", "blo", "bhi", "berr", "cluster")
      // the batch's probed clusters (bounded by k), collected so the
      // state read prunes STATICALLY on the partition column — never
      // reliant on dynamic partition pruning firing, and the
      // over-budget fallback join below shuffles only the probed
      // fraction of the state instead of all of it (VERDICT r13 #2).
      // Regime-gated: when nBatch·nprobe >= k the batch probes
      // (essentially) every list, pruning can save nothing, and the
      // collect would cost a per-batch materialization barrier
      // (measured +11% wall at the 40× bench point) — skip it and
      // keep the one-job pipeline. At 100 TB k is corpus-proportional
      // (suggestLists), so real micro-batches sit DEEP inside the
      // nBatch·nprobe << k regime where the pruned scan is the whole
      // ballgame.
      val pruneState = nBatch * np < st.k
      val (probeSideRows, probedClusters) =
        if (pruneState) {
          val pr = probeRows
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val pc = graft.core.Debug.timed(
              s"egate[$batchId] probeRows+clusters") {
            pr.select("cluster").distinct()
              .collect().map(_.getInt(0)).sorted.toSeq
          }
          (pr, Some(pc))
        } else (probeRows, None)
      val state = embedGateStateScan(spark, indexPath, batchId,
        probedClusters, Some(st))
      // broadcast budget in BYTES, not rows: ~200 MB of HashedRelation
      // stays inside default driver headroom; each probe row is now
      // dims code bytes + 3 doubles + ids, not the 8·dims-byte vector
      val budgetRows = 200000000L / math.max(1, dimsExpected + 96)
      val probeSide =
        if (nBatch * np <= budgetRows) F.broadcast(probeSideRows)
        else probeSideRows
      // code-space pass with a THREE-WAY verdict per pair, so the
      // exact rerank touches only the ambiguous error band around the
      // threshold (err is an exact bound, so the bands are sound):
      //   approx >= T + err + 1e-4  ⇒ DEFINITE reject (svec null —
      //     the stored vector never leaves the scan);
      //   within ±(err + 1e-4) of T ⇒ ambiguous — carry svec and
      //     apply the EXACT round-4 predicate against the broadcast
      //     batch vectors (identical to the pre-compression gate);
      //   below                     ⇒ definite non-reject (filtered).
      // 1e-4 covers the ≤ 5e-5 round-4 shift on the exact side.
      val ca = graft.functions.VectorFunctions.sq8CosineScalar(
        F.col("bcode"), F.col("vec"), F.col("blo"), F.col("bhi"))
      val slack = F.col("berr") + F.lit(1e-4)
      val scored = state.join(probeSide, "cluster")
        .select(F.col("bid"), F.col("vec"), ca.as("ca"), F.col("berr"))
        .where(F.col("ca") >= F.lit(cosineThreshold) - slack)
        .select(F.col("bid"),
          F.when(F.col("ca") < F.lit(cosineThreshold) + slack, F.col("vec"))
            .as("svec"))
      val rejected = scored
        .join(F.broadcast(
          within.select(F.col("id").as("bid"), F.col("vec").as("bvec"))), "bid")
        .where(F.col("svec").isNull ||
          cos(F.col("svec"), F.col("bvec")) >= cosineThreshold)
        .select(F.col("bid").as("id")).distinct()
      val admitted = within.join(rejected, Seq("id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.core.Debug.timed(s"egate[$batchId] decide+count") {
        admitted.count()
      }
      if (pruneState) probeSideRows.unpersist(blocking = false)
      within.unpersist(blocking = false)
      graft.core.Debug.timed(s"egate[$batchId] writes") {
        ivfAppendSegment(
          admitted.select("id", "vec", "cluster"), indexPath, batchId)
        admitted.select("id", "vec")
          .withColumn("seg", F.lit(batchId))
          .coalesce(8)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("seg")
          .parquet(outPath)
      }
      admitted.unpersist(blocking = false)
    } finally assigned.unpersist(blocking = false)
  }

  /** The gate's per-batch against-state scan: base lists plus
    * committed append segments (`seg < batchId`), pruned to the
    * batch's probed clusters by an explicit `isin` on the PARTITION
    * column — both roots are `partitionBy`-ed on cluster, so the
    * pruning is static partition elimination the planner guarantees
    * (`PartitionFilters` on both scans, PlanShapeSpec-pinned), never
    * a bet on dynamic partition pruning firing (VERDICT r13 #2). Per
    * micro-batch the state read therefore touches at most
    * |probedClusters| ≤ min(batch·nprobe, k) of the k list
    * partitions — nprobe/k of the stored bytes for a focused batch —
    * in BOTH the broadcast and the over-budget fallback join paths.
    * `probedClusters = None` skips the pruning (the caller determined
    * the batch probes essentially every list — see the regime gate in
    * [[embedGateBatch]]); `Some(Nil)` reads nothing.
    */
  private[graft] def embedGateStateScan(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      batchId: Long, probedClusters: Option[Seq[Int]],
      cachedState: Option[GateIvfState] = None): DataFrame = {
    // base listing reused from the epoch cache when the caller holds
    // one (the gate's per-batch path); appends are listed fresh every
    // batch — a new segment commits per batch — but with the cached
    // explicit schema so the read skips per-batch footer inference
    val baseLists = cachedState.map(_.baseLists).getOrElse(
      spark.read.parquet(s"$indexPath/lists")
        .select("id", "vec", "cluster"))
    val ap = new org.apache.hadoop.fs.Path(s"$indexPath/applists")
    val fs = ap.getFileSystem(spark.sessionState.newHadoopConf())
    val state =
      if (fs.exists(ap) && graft.operators.Dedup.hasSegDirs(fs, ap)) {
        val apReader = cachedState match {
          case Some(st) => spark.read.schema(
            st.listsSchema.add("seg", org.apache.spark.sql.types.LongType))
          case None => spark.read
        }
        baseLists.unionByName(
          apReader.parquet(s"$indexPath/applists")
            .where(F.col("seg").cast("long") < batchId)
            .select("id", "vec", "cluster"))
      } else baseLists
    probedClusters match {
      case None => state
      // an empty probe set (empty batch / all rows lost within-batch)
      // must read nothing — make that explicit rather than leaning on
      // the optimizer's empty-IN folding
      case Some(pc) if pc.isEmpty => state.where(F.lit(false))
      case Some(pc) => state.where(F.col("cluster").isin(pc: _*))
    }
  }

  /** Streaming incremental profiling: each micro-batch lands its
    * [[graft.operators.Profile.sketchShard]] sidecar (counts, moment
    * sums, min/max, HLL binaries — a few KB per batch) as an
    * idempotent `seg=batchId` partition under `sidecarPath`; the
    * corpus-so-far profile at any moment is
    * [[graft.operators.Profile.mergeShards]] over the accumulated
    * sidecars ([[profileOf]]) — O(batches × cols) rows, never a
    * rescan of the streamed data. The same replay contract as the
    * other ingest faces: a replayed batch's deterministic sidecar
    * overwrites its own leaf. Stateless map per batch — input-rate
    * throughput; the only state is the sidecar table itself.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def profileStream(
      docs: DataFrame,
      cols: Seq[String],
      sidecarPath: String,
      checkpoint: String,
      compactEverySegs: Int = defaultCompactEverySegs)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.operators.Profile.sketchShard(batch, cols)
          .withColumn("seg", F.lit(batchId))
          .coalesce(1)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("seg")
          .parquet(sidecarPath)
        // same fold cadence as the gate's: committed segments only
        // (seg < batchId — a replayed batch overlays its own leaf)
        if (compactEverySegs > 0 &&
            segCount(spark, sidecarPath) >= compactEverySegs) {
          profileCompact(spark, sidecarPath, maxSegExclusive = batchId)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()

  private def segCount(
      spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.startsWith("seg="))
  }

  /** REAL (seg >= 0, i.e. per-micro-batch) segment dirs only — the
    * fold-cadence trigger for the tiered compactions, which leave
    * negative merged tiers behind by design. */
  private def realSegCount(
      spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val nm = st.getPath.getName
      nm.startsWith("seg=") &&
        scala.util.Try(nm.substring(4).toLong).toOption.exists(_ >= 0)
    }
  }

  /** Read-side backstop to the ingest-side fold cadence: state folded
    * by OTHER writers (or a stream run with compaction disabled) can
    * still accumulate unbounded `seg=` leaves; warn loudly past 4× the
    * default cadence so the cost is attributable before it hurts.
    * Shared with the two biggest state-table readers outside this
    * file — [[graft.operators.Similarity.ivfLoad]] and
    * [[graft.operators.Dedup.minhashIndexLoadWithAppends]] (VERDICT
    * r13 #6: the same other-writer accumulation risk applies there). */
  private[graft] def warnUncompacted(
      spark: org.apache.spark.sql.SparkSession, path: String,
      reader: String): Unit = {
    val segs = segCount(spark, path)
    if (segs > 4 * defaultCompactEverySegs)
      org.apache.logging.log4j.LogManager.getLogger("graft").warn(
        s"$reader: $path holds $segs uncompacted seg= leaves — every " +
          "read lists and merges all of them. Fold with the matching " +
          "*Compact face, or leave the stream's compactEverySegs at " +
          s"its default ($defaultCompactEverySegs).")
  }

  /** The merged profile over every sidecar [[profileStream]] has
    * committed so far — same output shape as
    * [[graft.operators.Profile.profile]]. */
  def profileOf(
      spark: org.apache.spark.sql.SparkSession,
      sidecarPath: String): DataFrame = {
    awaitNoSwap(
      new org.apache.hadoop.fs.Path(sidecarPath)
        .getFileSystem(spark.sessionState.newHadoopConf()),
      sidecarPath)
    warnUncompacted(spark, sidecarPath, "profileOf")
    graft.operators.Profile.mergeShards(
      spark.read.parquet(sidecarPath).drop("seg"))
  }

  /** Streaming histogram sidecars — the QUANTILE face of
    * [[profileStream]] (moments merge exactly but quantiles need
    * their own mergeable state, [[graft.operators.Profile.histShard]]):
    * per micro-batch one idempotent `seg=batchId` leaf of ≤ nBuckets
    * (bucket, n) rows over fixed [lo, hi) bounds, per-bucket counts
    * EXACTLY mergeable, same fold cadence / marker protocol as every
    * sidecar stream here. Read with [[histOf]]; quantiles via
    * [[graft.operators.Profile.histQuantile]].
    */
  def histStream(
      docs: DataFrame,
      col: String,
      lo: Double,
      hi: Double,
      nBuckets: Int,
      sidecarPath: String,
      checkpoint: String,
      compactEverySegs: Int = defaultCompactEverySegs)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.operators.Profile.histShard(batch, col, lo, hi, nBuckets)
          .withColumn("seg", F.lit(batchId))
          .coalesce(1)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("seg")
          .parquet(sidecarPath)
        if (compactEverySegs > 0 &&
            segCount(spark, sidecarPath) >= compactEverySegs) {
          histCompact(spark, sidecarPath, maxSegExclusive = batchId)
          ()
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()

  /** Merged stream-so-far histogram: (bucket, n), per-bucket exact.
    * A sidecar dir with no `seg=` leaves yet (every batch so far was
    * all-null — an empty partitioned write is a no-op) reads as an
    * empty histogram, not a schema-inference crash. */
  def histOf(
      spark: org.apache.spark.sql.SparkSession,
      sidecarPath: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(sidecarPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    awaitNoSwap(fs, sidecarPath)
    if (!fs.exists(p) || !graft.operators.Dedup.hasSegDirs(fs, p))
      Seq.empty[(Int, Long)].toDF("bucket", "n")
    else {
      warnUncompacted(spark, sidecarPath, "histOf")
      graft.operators.Profile.histMerge(
        spark.read.parquet(sidecarPath).drop("seg"))
    }
  }

  /** Fold [[histStream]]'s committed segments into one merged segment
    * (per-bucket sum — exact, so [[histOf]] pre/post is row-identical;
    * spec-pinned). */
  def histCompact(
      spark: org.apache.spark.sql.SparkSession, sidecarPath: String,
      maxSegExclusive: Long = Long.MaxValue): Int =
    compactSegDir(spark, sidecarPath, maxSegExclusive, outFiles = 1)(
      graft.operators.Profile.histMerge)

  /** Streaming heavy-hitters over the token stream — the unbounded
    * face of [[graft.operators.TextOps.heavyTokens]]. Per micro-batch,
    * two tiny idempotent `seg=batchId` sidecars:
    *
    *   - `tops`: the batch's φ-frequent tokens with their EXACT batch
    *     counts (≤ 1/φ rows by construction). PIGEONHOLE gives the
    *     completeness law: a token that is φ-frequent over the whole
    *     stream is φ-frequent in at least one batch (its maximum
    *     batch share is ≥ its average), so the union of per-batch
    *     tops contains every true heavy hitter — NO false negatives.
    *   - `cms`: a count-min sketch of the batch's tokens (width 2/ε,
    *     mergeable by cell-wise addition) plus the batch token total.
    *
    * [[heavyTokensOf]] merges them into per-candidate global bounds:
    * `lb` = the sum of the candidate's RECORDED exact counts (a lower
    * bound — batches where it fell below φ contribute nothing) and
    * `ub` = the merged-sketch estimate (count-min only ever
    * OVER-counts, so ub ≥ true always; ub − true ≤ ε·N with the
    * sketch's confidence). Tokens with ub ≥ φ·N are reported;
    * `certain = lb ≥ φ·N` marks the ones heavy beyond doubt. State
    * per batch: ≤ 1/φ top rows + one ~(2/ε)·depth·8-byte sketch —
    * independent of stream length and of vocabulary size.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def heavyTokensStream(
      docs: DataFrame,
      phi: Double,
      sidecarPath: String,
      checkpoint: String,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      compactEverySegs: Int = defaultCompactEverySegs)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(phi > 0.0 && phi <= 1.0, s"phi must be in (0, 1]; got $phi")
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val exploded = batch.select(
            F.explode(graft.operators.TextOps.tokens(F.col("text")))
              .as("token"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val total = exploded.count()
          val minCount = math.max(1L, math.ceil(phi * total).toLong)
          exploded.groupBy("token")
            .agg(F.count(F.lit(1)).as("n"))
            .where(F.col("n") >= minCount)
            .withColumn("seg", F.lit(batchId))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seg")
            .parquet(s"$sidecarPath/tops")
          // seed fixed so a replayed batch writes a byte-identical
          // sketch (the idempotence contract of every sidecar here)
          val cms = exploded.stat.countMinSketch(
            "token", eps, confidence, seed = 42)
          Seq((cms.toByteArray, total, phi))
            .toDF("sketch", "n_tokens", "phi")
            .withColumn("seg", F.lit(batchId))
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seg")
            .parquet(s"$sidecarPath/cms")
          if (compactEverySegs > 0 &&
              segCount(spark, s"$sidecarPath/cms") >= compactEverySegs) {
            heavyTokensCompact(spark, sidecarPath,
              maxSegExclusive = batchId)
            ()
          }
        } finally exploded.unpersist(blocking = false)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Merge [[heavyTokensStream]]'s sidecars into the stream-so-far
    * heavy-hitter report: (token, lb, ub, share_ub round-4,
    * certain 0/1), ub DESC then token. Driver-side work is bounded by
    * batches × (1/φ) candidate rows and one sketch merge per batch —
    * never a rescan of the stream. */
  def heavyTokensOf(
      spark: org.apache.spark.sql.SparkSession,
      sidecarPath: String,
      phi: Double): DataFrame = {
    import spark.implicits._
    locally {
      val fs = new org.apache.hadoop.fs.Path(sidecarPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      awaitNoSwap(fs, s"$sidecarPath/tops")
      awaitNoSwap(fs, s"$sidecarPath/cms")
    }
    warnUncompacted(spark, s"$sidecarPath/cms", "heavyTokensOf")
    val cmsRows = spark.read.parquet(s"$sidecarPath/cms")
      .select("sketch", "n_tokens", "phi").collect()
    require(cmsRows.nonEmpty, s"heavyTokensOf($sidecarPath): no sidecars")
    // the pigeonhole completeness law only covers thresholds AT OR
    // ABOVE the phi the stream recorded candidates for — a smaller
    // read-side phi would silently under-report, so refuse it
    val streamPhi = cmsRows.map(_.getDouble(2)).max
    require(phi >= streamPhi - 1e-12,
      s"heavyTokensOf: phi=$phi is below the stream's recorded " +
        s"phi=$streamPhi — candidates below that bar were never " +
        "captured; re-stream with the smaller phi or query at >= it")
    val totalN = cmsRows.map(_.getLong(1)).sum
    val merged = cmsRows
      .map(r => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(r.getAs[Array[Byte]](0)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val minCount = math.max(1L, math.ceil(phi * totalN).toLong)
    // a zero-token batch writes its cms row but an EMPTY tops frame —
    // which leaves no seg= leaf at all (an empty partitioned write is
    // a no-op), so until the first token arrives the tops dir holds
    // only _SUCCESS and a bare read dies on schema inference. No seg
    // leaves = no candidates, which is also the correct answer.
    val topsHasSegs = graft.operators.Dedup.hasSegDirs(
      new org.apache.hadoop.fs.Path(s"$sidecarPath/tops")
        .getFileSystem(spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(s"$sidecarPath/tops"))
    val lbs =
      if (!topsHasSegs) Array.empty[(String, Long)]
      else spark.read.parquet(s"$sidecarPath/tops")
        .groupBy("token").agg(F.sum("n").as("lb"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
    lbs.map { case (token, lb) =>
        (token, lb, merged.estimateCount(token))
      }
      .filter { case (_, _, ub) => ub >= minCount }
      .toSeq.toDF("token", "lb", "ub")
      .withColumn("share_ub",
        F.round(F.col("ub") / F.lit(totalN.toDouble), 4))
      .withColumn("certain", (F.col("lb") >= minCount).cast("int"))
      .orderBy(F.col("ub").desc, F.col("token").asc)
  }

  // ---- sidecar compaction: bound the streamed state's segment count

  /** Default fold cadence for every sidecar-appending stream face
    * (gate bands, profile, histogram, heavy hitters, IVF appends):
    * fold once 64 segments have accumulated. The per-batch `seg=`
    * sidecars are the one UNBOUNDED term in the streamed state — a
    * year of minute-batches at the old `0 = never` default is ~500k
    * parquet leaves every read must list (and for heavy hitters, one
    * count-min sketch COLLECTED per segment — O(segments) driver
    * memory), so "never fold" is a scale footgun, not a neutral
    * default (VERDICT r12 #1). 64 keeps reads bounded at ≤ 64 leaves
    * + the in-flight batch while folds stay rare (one per 64
    * triggers); pass 0 (or any non-positive value) to disable and own
    * the cadence externally. Oracle/spec-scale streams commit fewer
    * than 64 segments, so results at small scale are byte-identical
    * to the pre-default behavior unless a test opts into a smaller
    * cadence explicitly. */
  val defaultCompactEverySegs: Int = 64

  // SIBLING of the sidecar dir, never inside it — an in-dir marker
  // would ride the live→old rename away mid-swap, exactly when
  // readers need to see it
  private[graft] def sidecarSwapMarker(path: String) =
    new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "_swap_marker")

  /** Readers wait out an in-flight compaction swap (the live dir is
    * briefly absent between its two renames); a marker that never
    * clears means a crashed compaction — fail with the recovery path
    * rather than serve a half-swapped table. */
  private def awaitNoSwap(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val marker = sidecarSwapMarker(path)
    var waited = 0
    while (fs.exists(marker) && waited < 10000) {
      Thread.sleep(200); waited += 200
    }
    if (fs.exists(marker))
      throw new IllegalStateException(
        s"sidecar compaction marker at $marker did not clear within " +
          "10 s — a compaction likely crashed between its swap " +
          "renames. The pre-swap segments are under the *_old sibling " +
          "dirs; restore them or finish the fold, then delete the marker.")
  }

  /** Fold one partitioned sidecar dir's `seg < maxSegExclusive`
    * leaves into a single merged segment via `fold` (which sees the
    * seg-stripped rows and must return the same schema), behind the
    * marker + rename-swap protocol every compaction here uses.
    * Segments at/above the bound carry over verbatim, so an in-flight
    * batch's replay still overlays its own leaf. Returns the merged
    * file count (0 = nothing eligible). */
  private def compactSegDir(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxSegExclusive: Long, outFiles: Int)(
      fold: DataFrame => DataFrame): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(conf)
    if (!graft.operators.Dedup.hasSegDirs(fs, live)) return 0
    val cur = spark.read.parquet(path)
      .where(F.col("seg").cast("long") < maxSegExclusive)
    val minSegRow = cur.agg(F.min(F.col("seg").cast("long"))).head
    if (minSegRow.isNullAt(0)) return 0
    val mergedSeg = math.min(-1L, minSegRow.getLong(0) - 1L)
    val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    fold(cur.drop("seg"))
      .withColumn("seg", F.lit(mergedSeg))
      .coalesce(outFiles)
      .write.mode("overwrite").partitionBy("seg")
      .parquet(tmp.toString)
    val marker = sidecarSwapMarker(path)
    fs.create(marker, true).close()
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    if (fs.exists(old)) fs.delete(old, true)
    // checked renames (VERDICT r13 #1): HDFS rename returns false
    // instead of throwing on some failures, and an unchecked false
    // here would report a successful fold over an untouched sidecar —
    // fail loud; the marker + _old/_tmp siblings document the crash.
    require(fs.rename(live, old),
      s"compactSegDir($path): rename $live -> $old failed; " +
        "sidecar untouched, marker left for diagnosis")
    // excluded (>= maxSegExclusive) segment dirs carry over verbatim
    fs.listStatus(old).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("seg=") &&
          scala.util.Try(nm.substring(4).toLong).toOption
            .exists(_ >= maxSegExclusive))
        require(
          fs.rename(st.getPath, new org.apache.hadoop.fs.Path(tmp, nm)),
          s"compactSegDir($path): carrying in-flight segment $nm into " +
            s"$tmp failed; pre-fold segments survive under $old, " +
            "marker left for diagnosis")
    }
    require(fs.rename(tmp, live),
      s"compactSegDir($path): rename $tmp -> $live failed; " +
        s"pre-fold segments survive under $old, marker left for diagnosis")
    fs.delete(old, true)
    fs.delete(marker, false)
    spark.read.parquet(path).inputFiles.length
  }

  /** Fold [[profileStream]]'s committed sidecar segments (below
    * `maxSegExclusive`) into ONE merged segment — counts/moments add
    * exactly and the HLL binaries union
    * ([[graft.operators.Profile.mergeShardsToShard]]), so
    * [[profileOf]] before and after reads the same profile (distinct
    * under the sketch-union ±tolerance contract, everything else
    * exact; spec-pinned). Unbounded streams need this: the sidecar
    * table is otherwise one tiny parquet segment PER BATCH forever —
    * a year of minute-batches is ~500k files that every profileOf
    * must list and read. Run it from the ingest side between
    * triggers, like the gate's `compactEverySegs`. */
  def profileCompact(
      spark: org.apache.spark.sql.SparkSession, sidecarPath: String,
      maxSegExclusive: Long = Long.MaxValue): Int =
    compactSegDir(spark, sidecarPath, maxSegExclusive, outFiles = 1)(
      graft.operators.Profile.mergeShardsToShard)

  /** Fold [[heavyTokensStream]]'s committed sidecars: per-batch tops
    * rows sum by token (lb is a plain sum over recorded rows, so the
    * fold preserves it EXACTLY), and the count-min sketches merge
    * cell-wise into one (associative register addition — the merged
    * estimate is identical to merging the originals), with
    * n_tokens summed and phi carried as the max so the read-side
    * completeness guard still refuses a smaller query phi.
    * [[heavyTokensOf]] before and after is row-identical
    * (spec-pinned). Bounds BOTH the segment count and the driver-side
    * work in heavyTokensOf, which collects one sketch per segment. */
  def heavyTokensCompact(
      spark: org.apache.spark.sql.SparkSession, sidecarPath: String,
      maxSegExclusive: Long = Long.MaxValue): Int = {
    import spark.implicits._
    val tops = compactSegDir(
      spark, s"$sidecarPath/tops", maxSegExclusive, outFiles = 1)(
      _.groupBy("token").agg(F.sum("n").as("n")))
    val cms = compactSegDir(
      spark, s"$sidecarPath/cms", maxSegExclusive, outFiles = 1) { cur =>
      val rows = cur.select("sketch", "n_tokens", "phi").collect()
      val merged = rows
        .map(r => org.apache.spark.util.sketch.CountMinSketch
          .readFrom(r.getAs[Array[Byte]](0)))
        .reduce { (a, b) => a.mergeInPlace(b); a }
      Seq((merged.toByteArray, rows.map(_.getLong(1)).sum,
          rows.map(_.getDouble(2)).max))
        .toDF("sketch", "n_tokens", "phi")
    }
    tops + cms
  }

  /** Streaming eval-set decontamination gate: an arriving document is
    * dropped when any of its word n-grams hits a Bloom filter built
    * ONCE over the static eval set's n-grams (the streaming face of
    * [[graft.operators.Dedup.decontaminate]]). The filter is a driver
    * sketch broadcast to every task, so the per-doc check is a
    * stateless map at input rate — no join, no state, corpus-size-
    * independent. Bloom false positives (rate `fpp`) drop a clean doc;
    * there are NO false negatives, so contamination never leaks
    * through — the conservative direction for a training gate. Size
    * the filter by the eval set's distinct-gram count (a benchmark
    * suite is millions of grams — a few MB at fpp 1e-3).
    * Returns the surviving rows of `stream`.
    */
  def decontaminationGate(
      stream: DataFrame,
      evalDocs: DataFrame,
      n: Int = 13,
      fpp: Double = 0.001): DataFrame =
    decontaminationGate(stream, decontaminationFilter(evalDocs, n, fpp), n)

  /** The gate's build half, exposed so the filter is derived ONCE:
    * at scale the eval suite is millions of grams and the derivation
    * is a full eval-corpus scan — a serve restart should load the
    * few-MB sidecar ([[decontaminationFilterLoad]]) instead of paying
    * it again. `n` must match the gate's at apply time (a different
    * gram length hashes different strings and contamination leaks). */
  def decontaminationFilter(
      evalDocs: DataFrame, n: Int = 13, fpp: Double = 0.001)
      : org.apache.spark.util.sketch.BloomFilter = {
    import graft.operators.Dedup
    val grams = Dedup.explodedGrams(evalDocs, n).select("g").distinct()
    val nGrams = math.max(grams.count(), 1L)
    grams.stat.bloomFilter("g", nGrams, fpp)
  }

  /** Persist the gate filter (Spark's BloomFilter wire format) as a
    * single sidecar file, PREFIXED with the gram length it was built
    * for — the documented leak hazard is an n mismatch between build
    * and serve, so the sidecar carries n rather than trusting caller
    * discipline; byte-stable round trip. Written to a temp sibling and
    * renamed into place like every other sidecar swap in this repo: a
    * crash mid-write or a reader racing a re-save sees either the old
    * or the new COMPLETE filter, never a truncated one — on
    * filesystems whose FileContext supports atomic overwrite-rename.
    * On the others the fallback is delete-then-rename, which opens a
    * brief no-sidecar window (ADVICE r13); a truncated read is still
    * impossible, and [[decontaminationFilterLoad]] retries a missing
    * file for a couple of seconds to cover the window. */
  def decontaminationFilterSave(
      spark: org.apache.spark.sql.SparkSession,
      filter: org.apache.spark.util.sketch.BloomFilter,
      n: Int,
      path: String): Unit = {
    require(n > 0, s"n must be positive; got $n")
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, "." + p.getName + ".tmp")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(tmp, true)
    try { out.writeInt(n); filter.writeTo(out) } finally out.close()
    // FileContext rename(OVERWRITE) replaces the destination in one
    // operation where the FS supports it — no window where the sidecar
    // is absent; fall back to delete+rename on filesystems without it
    try org.apache.hadoop.fs.FileContext
      .getFileContext(p.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case scala.util.control.NonFatal(_) =>
      if (fs.exists(p)) fs.delete(p, false)
      require(fs.rename(tmp, p),
        s"decontaminationFilterSave: rename $tmp -> $p failed")
    }
  }

  /** Load a [[decontaminationFilterSave]] sidecar: (filter, n). Gate
    * with BOTH halves — `decontaminationGate(stream, f, n)` — so the
    * serve side cannot hash a different gram length than the filter
    * holds. Retries a missing file briefly: a racing re-save on a
    * filesystem without atomic overwrite-rename falls back to
    * delete-then-rename, whose no-sidecar window this covers. */
  def decontaminationFilterLoad(
      spark: org.apache.spark.sql.SparkSession,
      path: String): (org.apache.spark.util.sketch.BloomFilter, Int) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = {
      var opened: org.apache.hadoop.fs.FSDataInputStream = null
      var waited = 0
      while (opened == null) {
        try opened = fs.open(p)
        catch {
          case e: java.io.FileNotFoundException =>
            if (waited >= 2000) throw e
            Thread.sleep(200); waited += 200
        }
      }
      opened
    }
    try {
      val n = in.readInt()
      require(n > 0,
        s"decontaminationFilterLoad($path): corrupt sidecar (n = $n)")
      (org.apache.spark.util.sketch.BloomFilter.readFrom(in), n)
    } finally in.close()
  }

  /** [[decontaminationGate]] against a PREBUILT (or loaded) filter —
    * the serve face: no eval-corpus scan, just the broadcast + the
    * stateless per-doc gram probe. */
  def decontaminationGate(
      stream: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive; got $n")
    val bc = stream.sparkSession.sparkContext.broadcast(bloom)
    val contaminated = F.udf { (text: String) =>
      // null text has no grams — it cannot be contaminated (the batch
      // decontaminate reaches the same verdict: explodedGrams filters
      // null text, so the doc misses the anti-join and survives)
      if (text == null) false
      else {
        // tokensOf replicates TextOps.tokens' trim/split exactly: a
        // looser tokenizer here would hash DIFFERENT grams than the
        // filter was built from, and contamination would leak through
        val toks = graft.operators.TextOps.tokensOf(text)
        val b = bc.value
        if (toks.length < n) b.mightContainString(toks.mkString(" "))
        else {
          var i = 0
          var hit = false
          val sb = new java.lang.StringBuilder
          while (i <= toks.length - n && !hit) {
            sb.setLength(0)
            var t = i
            while (t < i + n) {
              if (t > i) sb.append(' ')
              sb.append(toks(t))
              t += 1
            }
            hit = b.mightContainString(sb.toString)
            i += 1
          }
          hit
        }
      }
    }
    stream.where(!contaminated(F.col("text")))
  }

  /** Incremental index maintenance: append a stream of (id, vec) to a
    * persisted [[graft.api.ArrowSpaceModel]]'s items table. Each
    * arriving vector gets its λ and raw energy against the broadcast
    * F×F Laplacian (stateless map — input-rate throughput), and rows
    * land in the same Parquet layout `save` wrote, so `load` picks
    * them up on the next open. The graph/Laplacian stay fixed between
    * rebuilds — the same contract as the reference's batch-built,
    * point-queried index, extended with continuous ingest.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def appendToIndex(
      vectors: DataFrame,
      lap: LocalLaplacian,
      tau: Double,
      modelPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val bcLap = spark.sparkContext.broadcast(lap)
    vectors
      .select($"id".as[Long], $"vec".as[Array[Double]])
      .map { case (id, v) =>
        // the SHARED synthesis kernel, not an inlined copy of its
        // formula: appended λs must sort consistently with the loaded
        // index even if the synthesis is ever adjusted
        val (lambda, e) = bcLap.value.synthWithEnergy(v, tau)
        (id, v, lambda, e)
      }
      .toDF("id", "vec", "lambda", "e_raw")
      .writeStream
      // foreachBatch + plain batch append: a direct parquet sink would
      // write a _spark_metadata log, and batch reads of the items dir
      // would then see ONLY the streamed files — hiding the original
      // index. Exactly-once degrades to at-least-once on retry; ids
      // are upsert-keys for the next rebuild.
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$modelPath/items")
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Ingest-side observability for [[ivfAppendStream]] (VERDICT r9
    * #5b): per-batch appended mass per list accumulates here, so the
    * documented "centroid drift ⇒ rebuild" contract has a MEASURED
    * trigger instead of a vibe. [[topDecileShare]] is the drift
    * metric: the share of all appended mass sitting in the top decile
    * of touched lists (by appended mass) — ~0.1 under
    * distribution-stable ingest into a well-fit quantizer, rising
    * toward 1.0 as new data collapses onto a few stale centroids
    * (the quantizer no longer spreads it). Thread-safe; one instance
    * per stream.
    */
  final class IvfIngestMonitor {
    private val mass = scala.collection.mutable.LongMap.empty[Long]
    private var nBatches = 0L
    private var nRows = 0L
    private var nCompactions = 0L
    private var nRebuilds = 0L
    private[graft] def recordBatch(perCluster: Seq[(Long, Long)]): Unit =
      synchronized {
        nBatches += 1
        perCluster.foreach { case (c, n) =>
          mass(c) = mass.getOrElse(c, 0L) + n
          nRows += n
        }
      }
    private[graft] def recordCompaction(): Unit =
      synchronized { nCompactions += 1 }
    private[graft] def recordRebuild(): Unit =
      synchronized { nRebuilds += 1 }
    /** Drift state restarts after a quantizer rebuild: the metric
      * measures concentration RELATIVE to the fitted centroids, and a
      * rebuild re-fits them — carrying the old mass over would re-fire
      * the trigger on the first post-rebuild batch forever. */
    private[graft] def resetDrift(): Unit =
      synchronized { mass.clear() }
    def batchesSeen: Long = synchronized(nBatches)
    def rowsAppended: Long = synchronized(nRows)
    def compactionsRun: Long = synchronized(nCompactions)
    def rebuildsRun: Long = synchronized(nRebuilds)
    def listsTouched: Int = synchronized(mass.size)
    def topDecileShare: Double = synchronized {
      if (mass.isEmpty) 0.0
      else {
        val vs = mass.values.toArray.sorted(Ordering[Long].reverse)
        val n = math.max(1, math.ceil(vs.length / 10.0).toInt)
        vs.take(n).sum.toDouble / math.max(1L, vs.sum)
      }
    }
    /** The rebuild trigger: true once the appended mass is
      * concentrated past `threshold` (e.g. 0.5 — half the new corpus
      * in a tenth of the touched lists). Probe cost on the hot lists
      * grows with their length, so a drifted index serves
      * progressively slower until the quantizer is re-fit
      * ([[graft.operators.Similarity.ivfRebuild]], which the ingest
      * hook runs when wired with a threshold).
      *
      * Gated on `minLists` touched lists (ADVICE r10): with fewer than
      * ~10 touched lists the "top decile" is ONE list by ceil rounding,
      * so perfectly uniform ingest into 1-2 lists reads 0.5-1.0 and an
      * ungated trigger would demand a rebuild of a small or
      * narrowly-touched index that has not drifted at all.
      */
    def driftExceeds(threshold: Double, minLists: Int = 10): Boolean =
      listsTouched >= minLists && topDecileShare > threshold
  }

  /** One micro-batch's landing as an IDEMPOTENT segment write (ADVICE
    * r9): the rows go under `applists/seg=<batchId>/cluster=*` with
    * DYNAMIC partition overwrite, so a replayed batch rewrites exactly
    * its own (seg, cluster) leaves instead of appending duplicates —
    * assignment is deterministic (frozen centroids), hence a retry
    * touches the same leaves. Factored out so the replay law is
    * directly testable.
    */
  private[graft] def ivfAppendSegment(
      assigned: DataFrame, indexPath: String, seg: Long,
      targetFileRows: Long = 4000000L): Unit =
    // cluster-aligned shuffle before the partitioned write, mirroring
    // the minhash gate's band alignment (r11: −19..23% CPU there):
    // without it every input task emits a file into every touched
    // cluster leaf (tasks × clusters small files PER SEGMENT), and
    // the accumulated state the next probe scans is exactly those
    // files. Salted within cluster (VERDICT r14 #4 / guide §2.5): a
    // bare repartition(cluster) funnels a HOT list's whole segment
    // through one task; the count-derived salt spreads a list over
    // ceil(n/targetFileRows) tasks while lists at or under the target
    // keep one file per leaf per segment — identical layout at
    // micro-batch sizes.
    graft.operators.SegmentTiers.saltedRepartition(
        assigned, "cluster", Seq("id"), targetFileRows)
      .withColumn("seg", org.apache.spark.sql.functions.lit(seg))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", targetFileRows)
      .partitionBy("seg", "cluster")
      .parquet(s"$indexPath/applists")

  /** Incremental ANN-index maintenance: append a stream of (id, vec)
    * to a PERSISTED IVF index ([[graft.operators.Similarity.ivfSave]]
    * layout). The quantizer is frozen between rebuilds — exactly
    * [[graft.operators.Similarity.ivfAppend]]'s contract, lifted to
    * continuous ingest: each micro-batch assigns its vectors against
    * the broadcast centroids (the SAME
    * [[graft.scale.DeterministicKMeans.assign]] recurrence as the
    * batch append, so stream and batch agree row-for-row — the parity
    * law StreamingSpec pins) and lands them as a new SEGMENT beside
    * the cluster-partitioned lists Parquet ([[ivfAppendSegment]] —
    * idempotent on replay), so the next [[graft.operators.Similarity
    * .ivfLoad]] serves old + streamed vectors through every probe
    * path unchanged, still partition-pruned to the probed lists.
    *
    * Stateless map per batch — input-rate throughput, no shuffle (the
    * partitioned write's file-per-cluster fan-out is the only I/O
    * amplification; at high rates widen the trigger interval so each
    * micro-batch writes fewer, larger files). The LIFECYCLE hooks
    * (VERDICT r9 #5) run inside the sequential foreachBatch, racing
    * nothing: `compactEverySegs` > 0 folds the append segments into
    * one ([[graft.operators.Similarity.ivfCompactAppends]] — the base
    * corpus is never rewritten) whenever that many segments have
    * accumulated; `monitor` receives per-batch appended mass per list
    * (read back from the just-written segment — partition-pruned, and
    * it doubles as a write barrier) and computes the drift metric
    * that decides when frozen centroids have gone stale. Centroid
    * drift (enough appended mass to warrant re-fitting the quantizer)
    * remains a REBUILD, by the same batch-built contract as the
    * reference's index — the monitor tells you WHEN, and as of r11 the
    * hook can also DO it: `rebuildDriftThreshold` > 0 runs
    * [[graft.operators.Similarity.ivfRebuild]] (requantize base +
    * committed appends at [[graft.operators.Similarity.suggestLists]]
    * sizing, rename-swap) the moment
    * `driftExceeds(threshold, rebuildMinLists)` fires; the in-flight
    * segment is excluded and re-assigned (replay-safe), the assignment
    * model refreshes to the new centroids, and the monitor's drift
    * state resets. A concurrent [[ivfQueryStream]] reload picks the
    * new layout up through its existing swap retry. With rebuild
    * enabled the CHECKPOINT must live outside `indexPath` (the swap
    * renames the whole directory — enforced).
    *
    * Returns the started query; callers own its lifecycle.
    */
  def ivfAppendStream(
      vectors: DataFrame,
      indexPath: String,
      checkpoint: String,
      compactEverySegs: Int = defaultCompactEverySegs,
      monitor: Option[IvfIngestMonitor] = None,
      rebuildDriftThreshold: Double = 0.0,
      rebuildTargetListSize: Int = 1250,
      rebuildMinLists: Int = 10)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(rebuildDriftThreshold == 0.0 || monitor.nonEmpty,
      "rebuildDriftThreshold needs an IvfIngestMonitor to measure drift — " +
        "pass monitor = Some(new IvfIngestMonitor)")
    require(rebuildDriftThreshold == 0.0 ||
        !new java.io.File(checkpoint).getAbsolutePath.startsWith(
          new java.io.File(indexPath).getAbsolutePath),
      "with drift-triggered rebuild enabled the streaming checkpoint must " +
        "NOT live under indexPath — ivfRebuild swaps the whole index " +
        "directory, which would destroy the checkpoint mid-stream")
    val spark = vectors.sparkSession
    import spark.implicits._
    // sidecar read only — the lists scan is lazy and never triggered.
    // `model` is a VAR: a drift-triggered rebuild re-fits the quantizer
    // mid-stream, and subsequent micro-batches must assign against the
    // NEW centroids (foreachBatch is sequential, so the swap is safe).
    var model = {
      val index = graft.operators.Similarity.ivfLoad(spark, indexPath)
      graft.scale.DeterministicKMeans.Model(
        index.centroids.sortBy(_._1).map(_._2))
    }
    vectors
      .select($"id".cast("long").as("id"),
        $"vec".cast("array<double>").as("vec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val F = org.apache.spark.sql.functions
        ivfAppendSegment(
          graft.scale.DeterministicKMeans
            .assign(batch, model, idCol = "id", vecCol = "vec")
            .select("id", "vec", "cluster"),
          indexPath, batchId)
        monitor.foreach { m =>
          val per = spark.read.parquet(s"$indexPath/applists")
            .where(F.col("seg") === batchId)
            .groupBy("cluster").count()
            .collect()
            .map(r => (r.getAs[Number]("cluster").longValue(),
              r.getLong(1))).toSeq
          m.recordBatch(per)
        }
        // DRIFT-TRIGGERED REBUILD (VERDICT r10 #2): once the monitor's
        // top-decile share crosses the threshold, requantize base +
        // committed appends into a fresh layout and swap it in
        // ([[graft.operators.Similarity.ivfRebuild]]). seg >= batchId
        // is excluded from the fold and re-assigned as its own segment
        // in the new layout, so a replayed batch still overlays its own
        // leaves; the serve loop's reload/retry picks the new layout up.
        // Checked BEFORE compaction — a rebuild folds the appends
        // anyway, and compacting first would be wasted I/O.
        val rebuilt = rebuildDriftThreshold > 0.0 && monitor.exists { m =>
          if (m.driftExceeds(rebuildDriftThreshold, rebuildMinLists)) {
            graft.operators.Similarity.ivfRebuild(
              spark, indexPath, rebuildTargetListSize,
              maxSegExclusive = batchId)
            model = {
              val idx = graft.operators.Similarity.ivfLoad(spark, indexPath)
              graft.scale.DeterministicKMeans.Model(
                idx.centroids.sortBy(_._1).map(_._2))
            }
            m.resetDrift()
            m.recordRebuild()
            true
          } else false
        }
        if (!rebuilt && compactEverySegs > 0 &&
            realSegCount(spark, s"$indexPath/applists")
              >= compactEverySegs) {
          // fold only segments BELOW the current batch id (ADVICE
          // r10): the in-flight batch's segment stays its own
          // directory, so a replay after a post-compaction crash
          // overlays it instead of duplicating rows already merged.
          // Tiered + real-seg cadence: see minhashGateStream's hook.
          graft.operators.Similarity.ivfCompactAppends(
            spark, indexPath, maxSegExclusive = batchId, tiered = true)
          monitor.foreach(_.recordCompaction())
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Streaming QUERY face of the ANN index — the serving mirror of
    * [[ivfAppendStream]]'s ingest face: queries arrive as a stream of
    * (qid, qvec) and each micro-batch runs the batch retrieval
    * ([[graft.operators.Similarity.ivfTopKBatch]] — executor probe
    * selection, one cluster-keyed join, bounded-heap per-query top-k)
    * against the FROZEN index, appending (qid, id, score) to `outPath`
    * Parquet. Per-batch results equal the batch operator on the same
    * queries exactly (the parity law StreamingSpec pins), so a stream
    * consumer and a batch consumer of the same query log read the
    * same answers. The index is frozen between rebuilds — combine
    * with [[ivfAppendStream]] on the same saved layout for
    * continuous ingest + serve (reload to pick up appended vectors).
    *
    * foreachBatch is REQUIRED here, not a choice: the retrieval runs
    * joins and a per-key top-k (mapPartitions + window) that
    * structured streaming cannot express on an unbounded frame — each
    * micro-batch must be a bounded DataFrame. The cost is that
    * exactly-once degrades to at-least-once on retry (duplicate
    * (qid, id) rows, dedupable by key). The centroid broadcast is
    * created ONCE and reused by every micro-batch (a per-batch
    * broadcast would re-ship the centroid table each trigger and
    * accumulate dead broadcasts until a driver GC), and the per-batch
    * result skips the batch operator's trailing global sort — a
    * multi-file Parquet append has no row order for readers anyway.
    *
    * Returns the started query; callers own its lifecycle.
    */
  def ivfQueryStream(
      queries: DataFrame,
      index: graft.operators.Similarity.IvfIndex,
      k: Int,
      nprobe: Int,
      outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = queries.sparkSession
    import spark.implicits._
    val bcCentroids =
      spark.sparkContext.broadcast(index.centroids)
    // hierarchy broadcast created once too: a two-level index serves
    // micro-batches with hierarchical probe selection (same routing as
    // the batch face — stream/batch parity holds either way)
    val bcHier = spark.sparkContext.broadcast(index.hier)
    queries
      .select($"qid".cast("long").as("qid"),
        $"qvec".cast("array<double>").as("qvec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity
          .ivfTopKBatchImpl(index, bcCentroids, bcHier, batch, k, nprobe,
            sorted = false)
          .write.mode("append").parquet(outPath)
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** [[ivfQueryStream]] against a PATH with PERIODIC RELOAD — the
    * combined ingest + serve loop's query face (VERDICT r9 "what's
    * missing" #5): [[ivfAppendStream]] lands segments into the same
    * saved layout, and this face re-runs [[graft.operators.Similarity
    * .ivfLoad]] every `reloadEveryBatches` micro-batches so appended
    * vectors become visible to queries WITHOUT restarting the stream.
    * Freshness lag is therefore bounded by `reloadEveryBatches`
    * triggers (plus the append stream's own trigger) — measured as a
    * ScaleBench row; reload cost is one sidecar read + broadcast
    * re-ship (the lists scan stays lazy), so small reload periods are
    * cheap. Old broadcasts are destroyed after the swap (foreachBatch
    * is sequential — no in-flight job can still hold them). The
    * centroids are FROZEN by the append contract, so a reload changes
    * only which list rows exist, never the probe geometry — per-batch
    * results still equal the batch operator against the
    * then-current layout.
    */
  def ivfQueryStream(
      queries: DataFrame,
      indexPath: String,
      k: Int,
      nprobe: Int,
      outPath: String,
      checkpoint: String,
      reloadEveryBatches: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    require(reloadEveryBatches > 0,
      s"reloadEveryBatches must be positive; got $reloadEveryBatches")
    val spark = queries.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    var index = graft.operators.Similarity.ivfLoad(spark, indexPath)
    var bcCentroids = sc.broadcast(index.centroids)
    var bcHier = sc.broadcast(index.hier)
    var sinceReload = 0
    def reload(): Unit = {
      index = graft.operators.Similarity.ivfLoad(spark, indexPath)
      val oldC = bcCentroids; val oldH = bcHier
      bcCentroids = sc.broadcast(index.centroids)
      bcHier = sc.broadcast(index.hier)
      oldC.destroy(); oldH.destroy()
      sinceReload = 0
    }
    queries
      .select($"qid".cast("long").as("qid"),
        $"qvec".cast("array<double>").as("qvec"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        def attempt(): Unit = {
          if (sinceReload >= reloadEveryBatches) reload()
          sinceReload += 1
          graft.operators.Similarity
            .ivfTopKBatchImpl(index, bcCentroids, bcHier, batch, k, nprobe,
              sorted = false)
            .write.mode("append").parquet(outPath)
        }
        try attempt()
        catch {
          // a concurrent compaction swap invalidates append files
          // between their listing and their scan — measured at the 40×
          // serve-loop row both inside the reload's file listing and
          // inside the probed scan itself. One fresh reload sees the
          // post-swap layout; a second failure is a real bug and
          // propagates. Output stays duplicate-free: the failed job
          // committed nothing (v1 file committer publishes files only
          // at job commit).
          case scala.util.control.NonFatal(_) =>
            sinceReload = reloadEveryBatches // force the fresh reload
            attempt()
        }
      }
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Convenience: run a streaming DataFrame to a memory sink and block
    * until all available input is processed (test/driver helper).
    */
  /** Winner-so-far per key for [[upsertStream]]: the highest (seq, op)
    * change seen — O(1) state per key, the same last-writer-wins order
    * as the batch merge. */
  final case class UpsertState(seq: Long, op: String, payload: String)

  /** Streaming face of [[graft.operators.Cdc.mergeChanges]]: maintain
    * a keyed materialized view over a changelog STREAM, emitting the
    * key's current row whenever its winner changes (Update mode). The
    * winner order is the batch operator's exactly — highest `seq`,
    * ties by `op` descending — and it is applied MONOTONICALLY: a
    * change arriving out of order below the current winner is ignored,
    * so any batch/arrival interleaving of the same changelog converges
    * to the same view (the stream/batch parity law the spec asserts).
    * A winning 'D' emits a tombstone (`is_deleted = true`, null
    * payload), the signal a downstream sink needs to delete the key.
    *
    * Input columns: (key LONG, op STRING, seq LONG, payload STRING —
    * pack wide payloads with `to_json(struct(...))`, unpack with
    * `from_json`). State per key is one (seq, op, payload) — bounded
    * by the keyspace, not the stream; keys never retract, matching a
    * CDC feed where every key's history ends in 'D' or stays live.
    */
  def upsertStream(changes: DataFrame): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select($"key".as[Long], $"op".as[String], $"seq".as[Long],
        $"payload".as[String])
      .groupByKey(_._1)
      .mapGroupsWithState[UpsertState, (Long, Long, String, Boolean)](
        GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[UpsertState]) =>
          var cur = state.getOption.orNull
          rows.foreach { case (_, op, seq, p) =>
            val wins = cur == null || seq > cur.seq ||
              (seq == cur.seq && op > cur.op)
            if (wins) cur = UpsertState(seq, op, p)
          }
          state.update(cur)
          (key, cur.seq,
            if (cur.op == "D") null else cur.payload, cur.op == "D")
      }
      .toDF("key", "seq", "payload", "is_deleted")
  }

  def runToMemory(df: DataFrame, name: String, outputMode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
