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
}
