package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round harness: dump `.explain("formatted")` for the
  * named queries to files, so plan claims in OPTIMIZATION_*.md are
  * checkable without running Spark. Usage:
  *   sbt "runMain graft.Plans <sfDir> <outDir> <name1,name2,...>"
  * Never run by the driver; touches no query semantics.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, namesCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    // SPARK_GRAFT_PLANS_EXEC=1: additionally RUN each query and dump
    // every executed physical plan (the SQLAppStatusStore keeps them
    // even with the UI off) — operators that materialize internally
    // (localCheckpoint, writes, streaming batches) never show their
    // real work in the final frame's explain, but it IS here.
    val execMode = sys.env.get("SPARK_GRAFT_PLANS_EXEC").exists(_ == "1")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val before =
              if (execMode)
                spark.sharedState.statusStore.executionsList().map(_.executionId).toSet
              else Set.empty[Long]
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
            println(s"[plans] wrote $outDir/$name.txt")
            if (execMode) {
              df.count()
              val execs = spark.sharedState.statusStore.executionsList()
                .filterNot(e => before.contains(e.executionId))
              val txt = execs.map { e =>
                s"== execution ${e.executionId}: ${e.description} ==\n" +
                  e.physicalPlanDescription + "\n"
              }.mkString("\n")
              Files.writeString(Paths.get(s"$outDir/${name}_execs.txt"), txt)
              println(s"[plans] wrote $outDir/${name}_execs.txt " +
                s"(${execs.size} executions)")
            }
          } catch { case e: Throwable =>
            System.err.println(s"[plans] $name failed: ${e.getMessage}")
          }
        case None => System.err.println(s"[plans] unknown query $name")
      }
    }
    spark.stop()
  }
}
