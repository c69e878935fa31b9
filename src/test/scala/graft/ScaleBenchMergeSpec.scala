package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the committed-artifact merge (VERDICT r10 #3): ScaleBench
  * `--merge` keeps the per-row MIN wall over two same-code runs, makes
  * both samples auditable, and routes byte metrics with the run that
  * won their row. Pure string-level — no Spark session.
  */
class ScaleBenchMergeSpec extends AnyFunSuite {

  private def artifact(
      rows: Seq[(String, Double, Long)],
      cpu: Seq[(String, Double)],
      bytes: Seq[(String, Long)]): String =
    s"""{"metric":"scale_total","value":${rows.map(_._2).sum},""" +
      s""""unit":"sec","scale":40,"n_docs":212000,"n_vecs":80000,""" +
      s""""dims":64,"queries":{""" +
      rows.map { case (k, s, n) => s""""$k":{"sec":$s,"rows":$n}""" }
        .mkString(",") +
      s"""},"cpu_sec":{""" +
      cpu.map { case (k, c) => s""""$k":$c""" }.mkString(",") +
      s"""},"retried":{},"bytes":{""" +
      bytes.map { case (k, b) => s""""$k":$b""" }.mkString(",") +
      "}}\n"

  test("per-row min wins, both samples recorded, bytes follow the winning run") {
    // run A: PPR thrashed (296 s), k-core quick; run B: the quiet
    // window (66 s), k-core slower — exactly the r10 governance case
    val a = artifact(
      Seq(("g_ppr_many_seq", 296.4, 500L), ("g_kcore", 24.9, 316L),
        ("only_in_a", 3.0, 7L)),
      Seq(("g_ppr_many_seq", 1222.0), ("g_kcore", 80.0), ("only_in_a", 1.0)),
      Seq(("g_kcore_rounds", 20L)))
    val b = artifact(
      Seq(("g_ppr_many_seq", 66.0, 500L), ("g_kcore", 26.5, 316L)),
      Seq(("g_ppr_many_seq", 1100.0), ("g_kcore", 90.0)),
      Seq(("g_kcore_rounds", 19L)))
    val m = ScaleBench.mergeArtifacts(a, b)
    // min per row: PPR from B, k-core from A; A-only row carried
    assert(m.contains(""""g_ppr_many_seq":{"sec":66.00,"rows":500}"""), m)
    assert(m.contains(""""g_kcore":{"sec":24.90,"rows":316}"""), m)
    assert(m.contains(""""only_in_a":{"sec":3.00,"rows":7}"""), m)
    // both samples auditable
    assert(m.contains(""""g_ppr_many_seq":[296.40,66.00]"""), m)
    assert(m.contains(""""g_kcore":[24.90,26.50]"""), m)
    // cpu follows the winning run
    assert(m.contains(""""g_ppr_many_seq":1100.0"""), m)
    assert(m.contains(""""g_kcore":80.0"""), m)
    // bytes follow the run that won their longest-prefix row (k-core
    // won in A, so its rounds come from A)
    assert(m.contains(""""g_kcore_rounds":20"""), m)
    // the headline total sums the merged (min) walls
    assert(m.contains(""""value":93.90"""), m)
    assert(m.contains(""""merged_runs":2"""), m)
    // no row exceeds its quiet sibling — the committed-artifact rule
    val secRe = """"sec":([0-9.]+)""".r
    val merged = secRe.findAllMatchIn(m).map(_.group(1).toDouble).toSeq
    assert(merged.sorted == Seq(3.0, 24.9, 66.0), merged)
  }
}
