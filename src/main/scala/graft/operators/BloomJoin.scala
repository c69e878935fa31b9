package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.graftshim.Shim

/** Bloom-prefiltered semi/anti joins — EXACT join semantics with a
  * probabilistic prefilter that collapses the big side's shuffle to
  * (matches + false positives) instead of the whole table.
  *
  * The 100 TB problem these solve: `big SEMI JOIN small` where `big`
  * is the corpus and `small` is driver-bounded-ish but too large (or
  * too hot) to broadcast — Spark then shuffles BOTH sides on the key,
  * and the big side's shuffle dominates the job even though almost
  * none of its rows survive. The Bloom path:
  *
  *   1. ONE aggregate pass over `small` builds a Bloom filter of its
  *      keys (`DataFrameStatFunctions.bloomFilter` — a treeAggregate;
  *      the filter is `-expectedItems·ln(fpp)/ln(2)²` BITS, e.g. 10M
  *      keys at 1% fpp ≈ 11.4 MB, independent of `big`'s size);
  *   2. the filter rides into a codegen probe
  *      ([[graft.functions.BloomMightContain]]) applied as a FILTER on
  *      `big` before any shuffle — false-positive rate fpp means the
  *      surviving fraction is (true match rate + fpp);
  *   3. the exact equi-join runs on the survivors alone, removing
  *      false positives. No false NEGATIVES exist (the Bloom
  *      guarantee), so the result is bit-identical to the plain join.
  *
  * Spark's AQE injects runtime Bloom filters for some shuffle joins
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), but only under
  * its own heuristics on creation/application side sizes; these
  * operators make the plan shape a caller-visible contract instead of
  * an optimizer maybe — the difference between "hope the rule fires"
  * and "the scan IS prefiltered" when the big side is 100 TB.
  *
  * Anti joins get the mirrored win: rows FAILING the probe are
  * definite non-members — they are kept outright and never shuffle;
  * only probe-passers (matches + fpp) need the exact anti check.
  */
object BloomJoin {

  private def probeCol(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double): Column = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1); got $fpp")
    val keyType = small.schema(key).dataType.typeName
    require(keyType == "long" || keyType == "string",
      s"bloom join key must be BIGINT or STRING; got $keyType for '$key'")
    val n =
      if (expectedItems > 0) expectedItems
      // a count of the SMALL side is the cheap measurement here (it is
      // about to be aggregated anyway); sizing from a guess instead
      // would either blow fpp (undersized) or memory (oversized)
      else math.max(1L, small.select(key).na.drop().count())
    val bf = small.na.drop(Seq(key)).stat.bloomFilter(key, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    F.coalesce(
      Shim.column(graft.functions.BloomMightContain(
        Shim.expression(big(key)), bos.toByteArray)),
      F.lit(false))
  }

  /** `big SEMI JOIN small ON big(key) = small(key)`, Bloom-prefiltered.
    * Result is exactly the plain left-semi join's (the filter admits
    * every true match; the verify join removes false positives).
    * `expectedItems` ≤ 0 measures the small side; `fpp` trades filter
    * size against surviving-false-positive shuffle volume.
    */
  def semiJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame =
    big.where(probeCol(big, small, key, expectedItems, fpp))
      .join(small.select(key).na.drop(), Seq(key), "left_semi")

  /** `big ANTI JOIN small ON big(key) = small(key)`, Bloom-prefiltered:
    * probe-failers are definite non-members (kept, zero shuffle);
    * probe-passers take the exact anti join. NULL keys follow Spark's
    * anti-join convention — a null key matches nothing, so the row is
    * KEPT (it fails the probe and lands in the definite-keep leg).
    */
  def antiJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val probe = probeCol(big, small, key, expectedItems, fpp)
    val definiteKeep = big.where(!probe)
    val maybes = big.where(probe)
      .join(small.select(key).na.drop(), Seq(key), "left_anti")
    definiteKeep.unionByName(maybes)
  }
}
