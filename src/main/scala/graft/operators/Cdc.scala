package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Change-data-capture application — ANSI `MERGE INTO` semantics as a
  * batch operator (the snapshot-maintenance primitive a 100 TB table
  * needs between full rebuilds): apply a changelog of inserts/updates/
  * deletes to a snapshot, last writer per key wins.
  */
object Cdc {

  /** Apply `changes` to `snapshot`. `changes` must carry the snapshot
    * schema plus an `opCol` ('I' insert / 'U' update / 'D' delete —
    * any non-'D' value upserts) and a monotone `seqCol` (commit LSN,
    * Kafka offset, ...). Per key, the change with the HIGHEST seq wins
    * (ties break by op descending, so the result is deterministic even
    * on malformed feeds); a winning 'D' removes the key, any other
    * winner replaces/inserts the full payload, and snapshot keys
    * without changes pass through unchanged.
    *
    * 100 TB shape: last-writer-wins is ONE `max_by(struct(payload),
    * struct(seq, op))` groupBy — partial aggregation collapses each
    * key's change history map-side, so the shuffle carries one row per
    * touched key, never the raw log (the per-key `row_number` window
    * formulation would sort the whole log instead). Application is one
    * full-outer sort-merge equi-join on the key — the one unavoidable
    * snapshot-wide exchange of a merge; a snapshot bucketed by the key
    * joins in place without re-shuffling, which is how repeated merge
    * cycles should run at 100 TB (write bucketed, merge, write
    * bucketed).
    */
  def mergeChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val payload = snapshot.columns.toSeq.filterNot(keys.contains)
    val expected = keys ++ payload :+ opCol :+ seqCol
    val missing = expected.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing columns: ${missing.mkString(", ")} " +
        s"(expected snapshot schema + '$opCol' + '$seqCol')")
    val latest = changes
      .groupBy(keys.map(F.col): _*)
      .agg(F.max_by(
        F.struct((opCol +: payload).map(F.col): _*),
        F.struct(F.col(seqCol), F.col(opCol))).as("_w"))
      .select(keys.map(F.col) ++
        (opCol +: payload).map(c => F.col(s"_w.$c").as(s"_c_$c")): _*)
    val op = F.col(s"_c_$opCol")
    snapshot
      .join(latest, keys, "full_outer")
      .where(op.isNull || op =!= "D")
      .select(keys.map(F.col) ++ payload.map(c =>
        F.when(op.isNotNull, F.col(s"_c_$c")).otherwise(F.col(c)).as(c)): _*)
  }

  /** Slowly-changing-dimension type-2 history from a changelog: one
    * row per key VERSION with its validity interval in sequence
    * coordinates. Every non-delete change opens a version at its own
    * seq; the version closes at the key's NEXT change (whatever its
    * op — an update supersedes, a delete terminates), and the last
    * open version is flagged current. Delete rows close the preceding
    * version but emit none themselves, so a deleted key has no
    * current row — [[mergeChanges]]' final state is exactly this
    * history filtered to `is_current`.
    *
    * Changes sharing a seq order deterministically by op ascending
    * ('D' < 'I' < 'U'), mirroring [[mergeChanges]]' op-descending
    * winner rule: the tie's winner there is the LAST version here.
    *
    * 100 TB shape: one per-key window (lead over seq) across the
    * changelog — history construction is inherently an ordered scan of
    * each key's changes, and the window partitions by key, bounded by
    * per-key change counts, never the snapshot.
    *
    * Output: changelog payload + (valid_from_seq, valid_to_seq
    * [null = open], is_current).
    */
  def scd2History(
      changes: DataFrame,
      keys: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val missing = (keys :+ opCol :+ seqCol)
      .filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing columns: ${missing.mkString(", ")}")
    val payload = changes.columns.toSeq
      .filterNot(c => keys.contains(c) || c == opCol || c == seqCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(F.col): _*)
      .orderBy(F.col(seqCol).asc, F.col(opCol).asc)
    changes
      .withColumn("valid_to_seq", F.lead(F.col(seqCol), 1).over(w))
      .where(F.col(opCol) =!= "D")
      .select((keys ++ payload).map(F.col) ++ Seq(
        F.col(seqCol).as("valid_from_seq"),
        F.col("valid_to_seq"),
        F.col("valid_to_seq").isNull.as("is_current")): _*)
  }

  /** Corpus snapshot diff — the "what changed since the last drop"
    * report an ingestion pipeline runs before reprocessing anything:
    * per doc_id, `added` (new only), `removed` (old only), `changed`
    * (both, content fingerprints differ), `unchanged`. Content
    * identity is [[graft.operators.TextOps.fingerprint]]
    * (whitespace/case-normalized md5), so cosmetic edits do not count
    * as changes — the same normalization the exact-dedup path uses,
    * shared code, can't drift.
    *
    * ONE full-outer join keyed by doc_id over two slim (doc_id, fp)
    * projections — at 100 TB this is the minimal movement for a diff
    * (both sides hash-partition on the key once; with both snapshots
    * bucketed by doc_id on disk it is Exchange-free). Downstream:
    * `changed`+`added` ids drive incremental re-embedding /
    * re-indexing ([[graft.operators.Dedup.minhashIndexAppend]],
    * `ivfAppend`) instead of a full rebuild.
    *
    * Output: (doc_id, status), ordered by doc_id.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def fp(df: DataFrame, name: String) = df.select(
      F.col("doc_id"),
      graft.operators.TextOps.fingerprint(F.col("text")).as(name))
    fp(oldDocs, "fp_old").join(fp(newDocs, "fp_new"), Seq("doc_id"), "full_outer")
      .select(F.col("doc_id"),
        F.when(F.col("fp_old").isNull, "added")
          .when(F.col("fp_new").isNull, "removed")
          .when(F.col("fp_old") =!= F.col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
      .orderBy("doc_id")
  }
}
