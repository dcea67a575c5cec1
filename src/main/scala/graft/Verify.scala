package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated name prefixes — local debugging
    // only (the driver always passes exactly two args)
    val prefixes = args.drop(2).headOption.map(_.split(',').toSeq)
    def selected(name: String): Boolean =
      prefixes.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // full engine extensions (UnionFilterToIsin, TopOneWindowToArgmax,
      // TopKWindowToAggregate, SQL functions): every oracle gate then
      // continuously proves the rewrites are semantics-preserving
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // crash-visible protocol: a query that throws must leave a durable
    // artifact (<name>._error + errors.json) and a loud end-of-run
    // MISSING line — a silent stderr note once hid 17 broken queries
    // behind a cleaner-looking record.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selectedQueries = SparkEntry.queries.filter(e => selected(e._1))
    selectedQueries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        errors(name) = msg
        System.err.println(s"[verify] $name FAILED: $msg")
        Files.writeString(Paths.get(s"$outDir/$name._error"), msg + "\n")
      }
      // pipelines cache small intermediates (band tables etc.); release
      // them between queries so 60 runs don't accumulate dead blocks
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // end-of-run audit: written result dirs must cover every selected
    // query — any gap is shouted, never silently omitted from the record
    val written = selectedQueries.keySet.filter(n =>
      Files.isDirectory(Paths.get(s"$outDir/$n")))
    val missing = selectedQueries.keySet -- written
    if (missing.nonEmpty) {
      System.err.println(s"[verify] MISSING ${missing.size} of " +
        s"${selectedQueries.size}: ${missing.toSeq.sorted.mkString(", ")}")
      println(s"[verify] MISSING ${missing.size} of ${selectedQueries.size}")
    } else
      println(s"[verify] complete: ${selectedQueries.size} of ${selectedQueries.size} written")
    spark.stop()
  }
}
