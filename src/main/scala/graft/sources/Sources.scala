package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion surface (SURVEY.md §2.1 S1–S7): CSV with malformed-row
  * policies, text scan, literal rows, JDBC. Schema-on-read is retained
  * as an option, but explicit `StructType` is the default path — at
  * 100 TB an `inferSchema` pass is a full extra scan of the input.
  */
object Sources {

  /** S1/S2/S3 — CSV scan. `mode` ∈ DROPMALFORMED | PERMISSIVE |
    * FAILFAST (reference uses DROPMALFORMED everywhere; the silent-drop
    * behavior is observable via row counts, BASELINE.md).
    *
    * Caveat (CSV column pruning): under DROPMALFORMED, a query that
    * reads no columns (e.g. a bare `count()`) can see un-dropped rows
    * because malformed detection only runs for parsed columns. Counts
    * intended to observe the drop must project at least one column.
    *
    * `corruptColumn` (PERMISSIVE only) names a StringType column —
    * which must ALSO appear in the explicit `schema` — that captures
    * each malformed row's raw text (null for clean rows). This is the
    * diagnostic a user reaches for when DROPMALFORMED silently eats
    * rows (the reference's 27-row discrepancy,
    * BDE4-Workshop1-1530.ipynb cells 4/6): re-read PERMISSIVE with
    * capture, census the non-null captures, see exactly what was
    * dropped and why. Caveat: a query must select at least one parsed
    * column alongside the corrupt column (Spark rejects
    * corrupt-column-only scans).
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          header: Boolean = true, mode: String = "DROPMALFORMED",
          inferSchema: Boolean = false,
          corruptColumn: Option[String] = None): DataFrame = {
    require(corruptColumn.isEmpty || mode == "PERMISSIVE",
      s"corruptColumn requires PERMISSIVE mode, got $mode")
    corruptColumn.foreach { c =>
      require(schema.exists(_.fieldNames.contains(c)),
        s"corruptColumn $c must be declared (StringType) in the explicit schema")
    }
    val r = spark.read.format("csv")
      .option("header", header).option("mode", mode)
    val withCorrupt = corruptColumn.fold(r)(c =>
      r.option("columnNameOfCorruptRecord", c))
    val withSchema = schema match {
      case Some(s) => withCorrupt.schema(s)
      case None    => withCorrupt.option("inferSchema", inferSchema)
    }
    withSchema.load(path)
  }

  /** S4 — text scan kept relational (one `value` column), no RDD hop. */
  def text(spark: SparkSession, path: String): DataFrame = spark.read.text(path)

  /** JSONL scan — the standard training-corpus wire format; explicit
    * schema by default (inference = an extra full scan at 100 TB).
    */
  def jsonl(spark: SparkSession, path: String,
            schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  /** S7 — JDBC scan; options must include url, dbtable, driver. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def jdbc(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(options).load()

  /** Partitioned JDBC scan: `numPartitions` concurrent connections,
    * each reading one stride of `[lowerBound, upperBound)` on the
    * numeric `partitionColumn`. The single-connection form serializes a
    * 100 TB-adjacent warehouse extract through one socket; this is the
    * standard parallel-ingest shape (bounds from a cheap MIN/MAX probe;
    * one task per stride).
    */
  def jdbcPartitioned(spark: SparkSession, options: Map[String, String],
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc").options(options)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** XML scan (native in Spark 4). Explicit schema for the same
    * no-extra-scan reason as CSV/JSONL; `rowTag` selects the record
    * element.
    */
  def xml(spark: SparkSession, path: String, rowTag: String = "row",
          schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schema.map(r.schema).getOrElse(r).load(path)
  }
}

/** Output surface (SURVEY.md §2.1 S8–S10). */
object Sinks {

  /** S9 — CSV sink. */
  def csv(df: DataFrame, path: String, header: Boolean = true,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header).csv(path)

  /** JSONL sink. */
  def jsonl(df: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** S8 — JDBC sink. */
  def jdbc(df: DataFrame, options: Map[String, String],
           mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("jdbc").options(options).save()

  /** Columnar sinks: parquet is the engine's native layout; ORC is the
    * other columnar wire format a lake migration encounters. Both keep
    * types exactly (no text escaping), so round-trips are bit-faithful.
    */
  def parquet(df: DataFrame, path: String,
              mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)
  def orc(df: DataFrame, path: String,
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** XML sink (native in Spark 4) — the legacy-feed wire format an
    * enterprise migration still has to emit/ingest.
    */
  def xml(df: DataFrame, path: String, rowTag: String = "row",
          mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("xml").option("rowTag", rowTag).save(path)

  /** Bucketed catalog table: co-locates data on the bucket columns so
    * equi-joins/aggregations on them need NO shuffle (SURVEY.md §4
    * partitioning row; the 100 TB answer to repeated fact-fact joins:
    * pay the layout cost once at write time, every later join is
    * exchange-free).
    */
  def bucketed(df: DataFrame, table: String, bucketCols: Seq[String],
               buckets: Int, sortCols: Seq[String] = Nil,
               mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Shuffled training shards — the export step LLM training loaders
    * expect: the corpus in a deterministic pseudorandom global order
    * (order by md5 of a stable key: reproducible across engines, runs
    * and repartitionings, unlike rand(seed)), split into `numShards`
    * roughly equal files. `repartitionByRange` on the hash gives each
    * shard a contiguous hash range — together with
    * `sortWithinPartitions` the concatenation of shards in filename
    * order IS the global shuffled order, without any global sort on a
    * single reducer. At 100 TB this is one range-shuffle (sampled range
    * bounds, AQE-skew-safe) writing straight to the sink.
    */
  def shuffledShards(df: DataFrame, path: String, keyCol: String,
                     numShards: Int,
                     mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    import org.apache.spark.sql.functions.{col, md5}
    df.withColumn("__shuffle_key", md5(col(keyCol).cast("string")))
      .repartitionByRange(numShards, col("__shuffle_key"))
      .sortWithinPartitions("__shuffle_key", keyCol)
      .drop("__shuffle_key")
      .write.mode(mode).parquet(path)
  }

  /** S10 — warehouse load: the reference stages CSV to object storage
    * then shells out to `bq load` (loanStat-DataproctoBQ.py:372-382).
    * We keep the stage-then-load contract behind an interface so a real
    * connector (or a `scala.sys.process` CLI wrapper) can plug in; the
    * default just records the command it would run (no egress here).
    */
  trait WarehouseLoader {
    def load(stagedDir: String, table: String, autodetect: Boolean): Unit
  }
  final class RecordingLoader extends WarehouseLoader {
    val commands = scala.collection.mutable.ArrayBuffer.empty[String]
    def load(stagedDir: String, table: String, autodetect: Boolean): Unit =
      commands += s"load --source_format=CSV --replace ${if (autodetect) "--autodetect " else ""}$table $stagedDir/*"
  }
  final class WarehouseSink(loader: WarehouseLoader) {
    def save(df: DataFrame, stagingDir: String, table: String,
             autodetect: Boolean = true): Unit = {
      Sinks.csv(df, stagingDir, header = false)
      loader.load(stagingDir, table, autodetect)
    }
  }
}
