package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated fixture tables
  * (TESTDATA.md): `region nation customer supplier part orders
  * lineitem events documents embeddings`, one parquet per table under
  * an sf dir. Reads are plain parquet scans so Catalyst gets real
  * column pruning + predicate pushdown (SURVEY.md §4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to map to TimestampType. Read nanos as long (legacy conf)
    * and truncate to microsecond timestamps — exact integer division,
    * deterministic, and matches DuckDB's value at any sub-second
    * granularity coarser than ns.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    requireNanosConf(spark)
    val raw = load(spark, sfDir, "events")
    // `div` = exact integer division on longs (a double round-trip would
    // lose precision above 2^53 ns).
    raw.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** The nanos conf must be a session-BUILD setting (`Sessions.local` and
    * the three mains set it), not mutated here: a reader that rewrites
    * session conf behind the caller's back also silently re-types every
    * other NANOS parquet scan in the session, and derived sessions
    * (`SparkSession.newSession`) inherit builder configs but not runtime
    * mutations — streaming's state-sized sessions rely on that.
    */
  private[graft] def requireNanosConf(spark: SparkSession): Unit =
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (graft.core.Sessions.local does)")
}

/** SparkSession factory with the engine's scale-aware defaults:
  * AQE on (runtime coalesce + skew-join handling), UTC, shuffle
  * parallelism sized for the local harness (a real cluster would set
  * this per deployment, or rely on AQE's coalescing from a higher
  * initial value).
  */
object Sessions {
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      // engine rules ride along in every session (a cluster deployment
      // sets spark.sql.extensions=graft.plans.GraftExtensions instead)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_warehouse")
      .config("spark.sql.shuffle.partitions", cores.toString)
      // events.ts is parquet TIMESTAMP(NANOS); set at build so derived
      // sessions (newSession) inherit it — see Tables.requireNanosConf
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // scan-split sizing: the 128m default maxPartitionBytes already
      // bounds per-task scan memory; cluster deployments retune it
      // against executor memory, AQE handles the shuffle side
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
