package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver parses a bounded stdout tail for the
    // single {"metric":...} line, and benign WindowExec warnings (tiny
    // top-k frames ranked with a global window) would crowd it out
    spark.sparkContext.setLogLevel("ERROR")
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // stage-timing traces for local profiling (never set by the driver)
    if (sys.env.get("SPARK_GRAFT_DEBUG").exists(_ == "1")) graft.core.Debug.setDebug(true)
    // JIT/codegen warm-up, synthetic only (touches NO test data): one
    // shuffled aggregate and one sort compile the hot engine paths
    // (whole-stage codegen, Tungsten agg, exchange, TakeOrdered) so
    // steady-state query timings don't depend on which query happens
    // to run first alphabetically
    locally {
      val r = spark.range(2000000L).selectExpr("id % 97 AS k", "id AS v")
      r.groupBy("k").sum("v").count()
      r.orderBy("v").limit(5).count()
    }
    def timeRow(name: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      val ok =
        try { body; true }
        catch {
          // NonFatal only: an OOM/linkage error means a corrupted JVM —
          // let it crash rather than continue benching garbage
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      // failures are reported as negative time so they can't pass as fast
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    // one-time index builds run FIRST as their own named rows, so the
    // per-query rows below measure query cost — without this, whichever
    // a_* query ran first paid the lazy build and round-over-round
    // diffs mis-attributed build drift to that query. In ONLY mode an
    // unlisted build still runs (untimed, no row) when a SELECTED query
    // depends on it — otherwise that query would silently pay the lazy
    // build, the exact attribution noise the build rows eliminate — but
    // a selection touching no index skips the builds entirely
    val builds = SparkEntry.buildSteps.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val deps = SparkEntry.buildDependents.getOrElse(name, Set.empty)
        only match {
          case Some(sel) if sel.contains(name) =>
            Some(timeRow(name)(fn(spark, sfDir)))
          case Some(sel) if sel.exists(deps.contains) =>
            timeRow(s"$name (untimed)")(fn(spark, sfDir)) // failure logged; no row
            None
          case Some(_) => None
          case None => Some(timeRow(name)(fn(spark, sfDir)))
        }
      }
    // deterministic name order: timing stays comparable across rounds.
    // benchExclude keeps the one-line JSON inside the driver's bounded
    // tail capture (head-truncation loses the whole bench); an explicit
    // SPARK_GRAFT_ONLY opt-in overrides it for local profiling
    val results = builds ++ SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.map(_.contains(name)).getOrElse(!SparkEntry.benchExclude(name)) }
      .map { case (name, fn) => timeRow(name)(fn(spark, sfDir).count()) }
    // centisecond precision + basename-only sf keep the whole JSON
    // line under ~1700 chars: the driver captures a bounded stdout
    // tail (observed 2000 chars, minus sbt's trailing success line),
    // and a head-truncated line is unparseable — r02 lost its bench
    // numbers exactly this way
    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // the headline total sums SUCCESSFUL queries only — summing the
    // raw values would let a crashed 5s query SUBTRACT its negative
    // marker and make a failing round look faster than a passing one;
    // failures are reported in their own field and via the exit code
    val nFailed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$nFailed,"queries":$qs,"sf":"$sfName"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
