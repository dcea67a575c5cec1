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
  /** `events.ts` has shipped in two physical encodings across fixture
    * generations: TIMESTAMP(MICROS) (current — arrives as TIMESTAMP_NTZ
    * under Spark's default `inferTimestampNTZ`) and TIMESTAMP(NANOS)
    * (legacy — arrives as raw long nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, since Spark 4 refuses
    * to map NANOS to TimestampType). Dispatch on the LOADED type, not an
    * assumed fixture era, and normalize to session-TZ TimestampType
    * either way so every downstream consumer (windows, watermarks,
    * unix_micros, the DuckDB oracle) sees one type.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(load(spark, sfDir, "events"))

  /** Normalize a `ts` column to TimestampType regardless of how the
    * parquet encoding materialized it (see [[events]]). Sessions run
    * UTC, so the NTZ→LTZ cast is value-preserving.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case TimestampType => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      // true NANOS file read under the legacy conf: truncate to micros.
      // `div` = exact integer division on longs (a double round-trip
      // would lose precision above 2^53 ns).
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => sys.error(
        s"events.ts arrived as unsupported type $other — expected " +
          "TIMESTAMP(MICROS), TIMESTAMP_NTZ, or NANOS-as-long")
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
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
      // legacy-era events fixtures stored TIMESTAMP(NANOS); keeping the
      // conf lets Tables.normalizeTs read such files as long and
      // dispatch (harmless for MICROS files, which ignore it)
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
