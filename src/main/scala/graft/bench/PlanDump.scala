package graft.bench

import java.nio.file.{Files, Paths}

/** Developer tool (not part of the driver contract): writes each bench
  * entry's `.explain("formatted")` physical plan to
  * `<outDir>/<entry>_<suffix>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/r17/. Uses the exact Bench
  * session conf and entry list, so the captured plan is the benched
  * plan (static AQE view; Exchange counts, join strategies,
  * PushedFilters/ReadSchema and codegen spans are all visible).
  *
  * Usage: runMain graft.bench.PlanDump <suffix> [outDir]
  * honors SPARK_GRAFT_BENCH_ONLY / _SKIP for partial dumps.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = if (args.nonEmpty) args(0) else "before"
    val outDir = if (args.length > 1) args(1) else "plans/r17"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val csvDir = Pipelines.stageLoanCsv(spark, sfDir)
    val int8Dir = Pipelines.stageInt8(spark, sfDir)
    val indexDir = Pipelines.stageIndex(spark, sfDir)
    val ivfAdcDir = Pipelines.stageIvfAdc(spark, sfDir)
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for ((name, mk) <- graft.Bench.entries(spark, sfDir, csvDir, int8Dir,
        indexDir, ivfAdcDir)) {
      try {
        val df = mk()
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
          df.queryExecution.explainString(mode))
        System.err.println(s"[plandump] $name written")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
