package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical table layout for the lake (SURVEY.md §4 partitioning row;
  * beyond the reference, which only ever rewrites whole files).
  *
  * At 100 TB the dominant cost of most queries is the scan, and the
  * three layout levers below are how a scan avoids reading data at all:
  *
  *  1. '''Hive-style partitioning''' — partition values become
  *     directory keys, so a filter on the partition column prunes whole
  *     directories at PLANNING time (`PartitionFilters` in the scan
  *     node); pruned files are never opened, never even listed into
  *     tasks.
  *  2. '''Compaction''' — a naive partitioned write emits
  *     (#tasks × #partition-values) files; hash-repartitioning ON the
  *     partition columns first routes each partition value to exactly
  *     one task, so each directory gets one file. Millions of small
  *     files are a real 1000-executor killer (driver listing +
  *     NameNode/manifest pressure + per-file open cost).
  *  3. '''Range clustering''' — `repartitionByRange` +
  *     `sortWithinPartitions` yields files with DISJOINT min/max on the
  *     cluster column; parquet footer stats then let any range
  *     predicate skip whole files (row-group pruning), which is the
  *     poor-man's z-order for a single sort dimension.
  */
object Layout {

  /** Hive-style partitioned parquet write. Partition columns must be
    * low-cardinality (dates, regions, sources) — each distinct value is
    * a directory.
    */
  def partitionedParquet(df: DataFrame, path: String,
                         partitionCols: Seq[String],
                         mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Partitioned write with small-file control: one file per partition
    * directory (each partition value hashes to one task), with
    * `maxRecordsPerFile` as the safety valve against a runaway hot
    * partition. The repartition is a shuffle — that's the deliberate
    * price, paid once at write time, for every later scan listing
    * O(#partitions) files instead of O(#tasks × #partitions).
    */
  def compactedPartitionedParquet(df: DataFrame, path: String,
                                  partitionCols: Seq[String],
                                  maxRecordsPerFile: Long = 0L,
                                  mode: SaveMode = SaveMode.Overwrite): Unit = {
    val cols: Seq[Column] = partitionCols.map(col)
    df.repartition(cols: _*)
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** Range-clustered parquet: `files` output files with disjoint
    * [min,max] on `clusterCol`, so parquet stats skip whole files for
    * range predicates. Sampling for the range boundaries is one extra
    * pass over a sample (Spark's RangePartitioner), amortized across
    * every later scan.
    */
  def rangeClusteredParquet(df: DataFrame, path: String, clusterCol: String,
                            files: Int,
                            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartitionByRange(files, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(mode).parquet(path)

  /** Z-value of N numeric columns: each is min-max scaled to a
    * `bits`-bit integer (stats come from ONE broadcast aggregate — no
    * driver collect), then the bits are interleaved round-robin. Pure
    * native shift/and/or arithmetic, fully codegen'd.
    */
  private[sources] def zValue(df: DataFrame, cols: Seq[String],
                              bits: Int, out: String): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits×cols out of range: $bits × ${cols.size}")
    val stats = df.agg(
      min(col(cols.head)).cast("double").as(s"__lo_0"),
      cols.zipWithIndex.flatMap { case (c, j) =>
        (if (j == 0) Nil else Seq(min(col(c)).cast("double").as(s"__lo_$j"))) :+
          max(col(c)).cast("double").as(s"__hi_$j")
      }: _*)
    val maxQ = (1L << bits) - 1
    def quant(c: String, j: Int): Column = {
      val lo = col(s"__lo_$j"); val hi = col(s"__hi_$j")
      when(hi === lo, lit(0L)).otherwise(
        least(floor((col(c).cast("double") - lo) / (hi - lo) * maxQ), lit(maxQ)).cast("long"))
    }
    val withQ = cols.zipWithIndex.foldLeft(df.crossJoin(broadcast(stats))) {
      case (d, (c, j)) => d.withColumn(s"__q_$j", quant(c, j))
    }
    val n = cols.size
    val z = (for (i <- 0 until bits; j <- 0 until n) yield
      shiftleft(shiftright(col(s"__q_$j"), i).bitwiseAND(1), i * n + j))
      .reduce(_ bitwiseOR _)
    val drops = Seq("__lo_0") ++ cols.indices.flatMap(j =>
      (if (j == 0) Nil else Seq(s"__lo_$j")) ++ Seq(s"__hi_$j", s"__q_$j"))
    withQ.withColumn(out, z).drop(drops: _*)
  }

  /** Z-order-clustered parquet: files cover contiguous z-ranges, which
    * are compact boxes in EVERY clustered dimension — so parquet
    * min/max stats skip files for predicates on any of the columns (or
    * an n-D box), where single-column range clustering only helps its
    * one sort key. The multi-dimension answer to "we filter this fact
    * table by customer AND by amount AND by date".
    */
  def zOrderClusteredParquet(df: DataFrame, path: String,
                             cols: Seq[String], files: Int,
                             bits: Int = 16,
                             mode: SaveMode = SaveMode.Overwrite): Unit =
    zValue(df, cols, bits, "__z")
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(mode).parquet(path)

  /** Two-column convenience overload. */
  def zOrderClusteredParquet(df: DataFrame, path: String,
                             xCol: String, yCol: String, files: Int): Unit =
    zOrderClusteredParquet(df, path, Seq(xCol, yCol), files)
}
