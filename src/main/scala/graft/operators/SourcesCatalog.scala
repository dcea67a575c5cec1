package graft.operators

import graft.core.Tables
import graft.sources.{Layout, LogParser, Sinks, Sources}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink operators (SURVEY.md §2.1) as oracle-gated queries.
  * Round-trips write to a per-run temp dir under java.io.tmpdir; the
  * oracle compares against the original fixture table (S9→S1) or an
  * independently-derived expected relation (S3/S4), which is the
  * strongest kind of oracle — it never touches our parse path.
  */
object SourcesCatalog {

  private def tmp(name: String): String = graft.core.Staging.tmpDir(name)

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  /** Deterministic Apache-log corpus built from `documents` (every 50th
    * line is garbage to exercise the malformed path).
    */
  private def logLines(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      when($"doc_id" % 50 === 0, lit("GARBAGE LINE"))
        .otherwise(concat(
          $"source", lit(" - - [0"), ($"doc_id" % 9 + 1).cast("string"),
          lit("/Aug/1995:12:34:5"), ($"doc_id" % 10).cast("string"),
          lit(" -0400] \"GET /doc/"), $"doc_id".cast("string"),
          lit(" HTTP/1.0\" 200 "), $"n_chars".cast("string")))
        .as("value"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S9 → S1: CSV sink then scan with explicit schema (exact round-trip)
    "s1_csv_roundtrip" -> ((spark, dir) => {
      val out = tmp("csv")
      Sinks.csv(Tables.customer(spark, dir), out)
      Sources.csv(spark, out, Some(customerSchema), mode = "FAILFAST")
        .orderBy(col("c_custkey"))
    }),

    // columnar round-trips: types survive exactly (no text escaping),
    // so the oracle is the original fixture relation itself
    "s8_orc_roundtrip" -> ((spark, dir) => {
      val out = tmp("orc")
      Sinks.orc(Tables.customer(spark, dir), out)
      Sources.orc(spark, out).orderBy(col("c_custkey"))
    }),
    "s9_parquet_roundtrip" -> ((spark, dir) => {
      val out = tmp("pq")
      Sinks.parquet(Tables.customer(spark, dir), out)
      Sources.parquet(spark, out).orderBy(col("c_custkey"))
    }),

    // XML round-trip (native Spark 4 datasource): explicit schema on
    // read — XML carries no types, so schema-on-read is the contract.
    // Columns arrive alphabetized by the XML reader; reorder + sort to
    // the fixture shape.
    "s10_xml_roundtrip" -> ((spark, dir) => {
      val out = tmp("xml")
      Sinks.xml(Tables.customer(spark, dir), out)
      Sources.xml(spark, out, schema = Some(customerSchema))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy(col("c_custkey"))
    }),

    // Hive-partitioned layout: write orders partitioned by derived
    // o_year (compacted: one file per partition dir), read back with a
    // partition filter — the scan prunes whole directories at planning
    // time (LayoutSpec audits PartitionFilters + file counts). Oracle is
    // the same filter expressed over the unpartitioned fixture.
    "s11_partition_prune" -> ((spark, dir) => {
      val out = tmp("part")
      Layout.compactedPartitionedParquet(
        Tables.orders(spark, dir).withColumn("o_year", year(col("o_orderdate"))),
        out, Seq("o_year"))
      Sources.parquet(spark, out)
        .filter(col("o_year") === 1997)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority", "o_year")
        .orderBy(col("o_orderkey"))
    }),

    // Range-clustered layout: files carry disjoint [min,max] on the
    // cluster column so parquet footer stats skip whole files for range
    // predicates (LayoutSpec proves disjointness). The oracle is the
    // same range filter over the fixture — layout must not change
    // results, only the files a scan opens.
    "s12_range_cluster" -> ((spark, dir) => {
      val out = tmp("range")
      Layout.rangeClusteredParquet(Tables.orders(spark, dir), out,
        "o_totalprice", files = 8)
      Sources.parquet(spark, out)
        .filter(col("o_totalprice") >= 100000.0 && col("o_totalprice") < 200000.0)
        .orderBy(col("o_orderkey"))
    }),

    // Z-order layout: 2-D box query over the z-clustered copy — layout
    // must not change results (LayoutSpec proves both dims' per-file
    // spans narrow, i.e. the skipping actually works)
    "s13_zorder_box" -> ((spark, dir) => {
      val out = tmp("zorder")
      Layout.zOrderClusteredParquet(Tables.orders(spark, dir), out,
        "o_custkey", "o_totalprice", files = 16)
      Sources.parquet(spark, out)
        .filter(col("o_custkey") <= 300 && col("o_totalprice") <= 150000.0)
        .orderBy(col("o_orderkey"))
    }),

    // Compression round-trips: zstd parquet (the 100 TB storage/scan
    // codec of choice — better ratio than snappy at similar decode
    // speed) and gzip CSV (the interchange wire format compressed)
    "s14_compression" -> ((spark, dir) => {
      val pq = tmp("zstd")
      Tables.customer(spark, dir).write.mode("overwrite")
        .option("compression", "zstd").parquet(pq)
      val csvDir = tmp("gz")
      Sources.parquet(spark, pq).write.mode("overwrite")
        .option("header", "true").option("compression", "gzip").csv(csvDir)
      Sources.csv(spark, csvDir, Some(customerSchema), mode = "FAILFAST")
        .orderBy(col("c_custkey"))
    }),

    // S16 — schema EVOLUTION read: a corpus written in two eras (the
    // later one gained an `extra` column) reads back as one table with
    // mergeSchema, nulls where the early files never had the column —
    // the additive-evolution contract a long-lived 100 TB lake lives
    // by (per-file footers merge; no rewrite of the old era)
    "s16_schema_merge" -> ((spark, dir) => {
      val d = tmp("evolve")
      val docs = Tables.documents(spark, dir)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite").parquet(s"$d/era1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("n_chars").as("extra"))
        .write.mode("overwrite").parquet(s"$d/era2")
      spark.read.option("mergeSchema", "true")
        .parquet(s"$d/era1", s"$d/era2")
        .orderBy(col("doc_id"))
    }),

    // S3: DROPMALFORMED silently drops short/unparseable rows
    "s3_malformed_policy" -> ((spark, dir) => {
      val d = tmp("bad")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "data.csv"),
        """k,v,name
          |1,1.5,alpha
          |2,oops,beta
          |3,2.5
          |4,3.5,delta,extra
          |5,4.5,epsilon
          |""".stripMargin)
      val schema = StructType(Seq(StructField("k", IntegerType),
        StructField("v", DoubleType), StructField("name", StringType)))
      Sources.csv(spark, d, Some(schema)).orderBy(col("k"))
    }),

    // S3b: PERMISSIVE + columnNameOfCorruptRecord — the diagnostic for
    // DROPMALFORMED's silent drops: every malformed row survives with
    // its raw text captured (type error keeps the parseable fields,
    // short row nulls the missing tail, extra-token row parses the
    // prefix); clean rows capture null
    "s3b_corrupt_capture" -> ((spark, dir) => {
      val d = tmp("badcap")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "data.csv"),
        """k,v,name
          |1,1.5,alpha
          |2,oops,beta
          |3,2.5
          |4,3.5,delta,extra
          |5,4.5,epsilon
          |""".stripMargin)
      val schema = StructType(Seq(StructField("k", IntegerType),
        StructField("v", DoubleType), StructField("name", StringType),
        StructField("raw_rec", StringType)))
      Sources.csv(spark, d, Some(schema), mode = "PERMISSIVE",
        corruptColumn = Some("raw_rec"))
        .orderBy(col("k"))
    }),

    // JSONL round-trip: the standard training-corpus format (quotes,
    // unicode, nulls all survive the escape/unescape exactly)
    "s2_jsonl_roundtrip" -> ((spark, dir) => {
      val out = tmp("jsonl")
      Sinks.jsonl(Tables.documents(spark, dir), out)
      Sources.jsonl(spark, out, Some(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))))
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // S4/C4: native regex log parse incl. timestamp reassembly;
    // malformed lines drop out via na.drop
    "s4_log_parse" -> ((spark, dir) =>
      LogParser.cleanParse(logLines(spark, dir)).orderBy(col("path"))),

    // S6: parallelized local collection — the one reference idiom that
    // genuinely starts from sc.parallelize; hopped to relational
    // immediately (SURVEY §1)
    "s6_parallelized" -> ((spark, dir) => {
      import spark.implicits._
      spark.sparkContext
        .parallelize(Seq((1, "alpha"), (2, "beta"), (3, "gamma")), 2)
        .toDF("k", "v").orderBy($"k")
    }),

    // S5: literal rows (the reference's employees toy table)
    "s5_literal" -> ((spark, dir) => {
      import spark.implicits._
      Seq(("James", "Sales", 3000L), ("Michael", "Sales", 4600L),
        ("Robert", "Sales", 4100L), ("Maria", "Finance", 3000L))
        .toDF("employee_name", "department", "salary")
        .orderBy($"employee_name")
    }),

    // S1b: CSV schema INFERENCE gate (SURVEY §7 risk 1) — write typed
    // data to text, read it back with inferSchema only, and compare
    // values against the typed fixture. If inference mis-types a
    // column (e.g. doubles surviving as strings) the parquet dump's
    // column type — and therefore its values — diverge from the
    // oracle's typed projection and the compare fails.
    "s1b_csv_infer" -> ((spark, dir) => {
      val out = tmp("csvinfer")
      Sinks.csv(Tables.customer(spark, dir), out)
      Sources.csv(spark, out, None, mode = "FAILFAST", inferSchema = true)
        .orderBy(col("c_custkey"))
    }),

    // S15: warehouse stage+load (S10) with a readback-equality gate —
    // the staged headerless CSV, parsed back with the warehouse-side
    // schema, must equal the source relation exactly; the loader must
    // also have been handed the staged dir + target table.
    "s15_warehouse_load" -> ((spark, dir) => {
      val stage = tmp("whstage")
      val loader = new Sinks.RecordingLoader
      new Sinks.WarehouseSink(loader).save(
        Tables.nation(spark, dir), stage, "analytics.nation")
      require(loader.commands.exists(c =>
        c.contains("analytics.nation") && c.contains(stage)),
        s"warehouse loader not invoked for analytics.nation: ${loader.commands}")
      val nationSchema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      Sources.csv(spark, stage, Some(nationSchema), header = false, mode = "FAILFAST")
        .orderBy(col("n_nationkey"))
    }),

    // S8 → S7: JDBC write then readback through embedded Derby
    "s7_jdbc_roundtrip" -> ((spark, dir) => {
      val db = tmp("derby") + "/db"
      val opts = Map(
        "url" -> s"jdbc:derby:$db;create=true",
        "dbtable" -> "nation_rt",
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      Sinks.jdbc(Tables.nation(spark, dir), opts)
      Sources.jdbc(spark, opts)
        .select(col("n_nationkey").cast("int"), col("n_name"), col("n_regionkey").cast("int"))
        .orderBy(col("n_nationkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "s1_csv_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "s8_orc_roundtrip" ->
      "SELECT * FROM customer ORDER BY c_custkey",

    "s9_parquet_roundtrip" ->
      "SELECT * FROM customer ORDER BY c_custkey",

    "s16_schema_merge" ->
      """SELECT doc_id, text,
        |  CASE WHEN doc_id % 2 = 1 THEN n_chars END AS extra
        |FROM documents ORDER BY doc_id""".stripMargin,

    "s10_xml_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "s11_partition_prune" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority,
        |       CAST(year(o_orderdate) AS INTEGER) AS o_year
        |FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_orderkey""".stripMargin,

    "s12_range_cluster" ->
      """SELECT * FROM orders
        |WHERE o_totalprice >= 100000.0 AND o_totalprice < 200000.0
        |ORDER BY o_orderkey""".stripMargin,

    "s13_zorder_box" ->
      """SELECT * FROM orders
        |WHERE o_custkey <= 300 AND o_totalprice <= 150000.0
        |ORDER BY o_orderkey""".stripMargin,

    "s14_compression" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // bare 1.5 would type v as DECIMAL(2,1) — an exotic emission type
    // per the r12 dtype lint — so the first value carries the cast
    // that promotes the column to DOUBLE (the s3b convention)
    "s3_malformed_policy" ->
      """SELECT * FROM (VALUES (1, CAST(1.5 AS DOUBLE), 'alpha'),
        |  (5, 4.5, 'epsilon')) t(k, v, name)
        |ORDER BY k""".stripMargin,

    // the planted fixture's expected PERMISSIVE capture, stated
    // independently: type error keeps parseable fields, short row
    // nulls the tail, extra-token row parses the prefix — all three
    // carry their raw text; clean rows carry null
    "s3b_corrupt_capture" ->
      """SELECT * FROM (VALUES
        |  (1, 1.5, 'alpha', CAST(NULL AS VARCHAR)),
        |  (2, CAST(NULL AS DOUBLE), 'beta', '2,oops,beta'),
        |  (3, 2.5, CAST(NULL AS VARCHAR), '3,2.5'),
        |  (4, 3.5, 'delta', '4,3.5,delta,extra'),
        |  (5, 4.5, 'epsilon', CAST(NULL AS VARCHAR)))
        |  t(k, v, name, raw_rec)
        |ORDER BY k""".stripMargin,

    "s2_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    // independently-derived expected parse (never touches a regex)
    "s4_log_parse" ->
      """SELECT source AS ip_addr,
        |  CAST(doc_id % 9 + 1 AS INTEGER) AS day_of_month,
        |  'Aug' AS month, 1995 AS year, 12 AS hour, 34 AS minute,
        |  CAST(50 + doc_id % 10 AS INTEGER) AS second,
        |  '-0400' AS timezone, 'GET' AS method,
        |  '/doc/' || CAST(doc_id AS VARCHAR) AS path,
        |  'HTTP/1.0' AS protocol, 200 AS status,
        |  CAST(n_chars AS BIGINT) AS bytes,
        |  make_timestamp(1995, 8, CAST(doc_id % 9 + 1 AS INTEGER),
        |                 12, 34, CAST(50 + doc_id % 10 AS DOUBLE)) AS datetime_stamp
        |FROM documents WHERE doc_id % 50 <> 0
        |ORDER BY path""".stripMargin,

    "s6_parallelized" ->
      """SELECT * FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) t(k, v)
        |ORDER BY k""".stripMargin,

    "s5_literal" ->
      """SELECT * FROM (VALUES
        |  ('James', 'Sales', 3000), ('Michael', 'Sales', 4600),
        |  ('Robert', 'Sales', 4100), ('Maria', 'Finance', 3000))
        |  t(employee_name, department, salary)
        |ORDER BY employee_name""".stripMargin,

    "s7_jdbc_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",

    // the oracle's explicit casts state the types inference must reach:
    // small ints → INTEGER, decimals → DOUBLE, text → VARCHAR
    "s1b_csv_infer" ->
      """SELECT CAST(c_custkey AS INTEGER) AS c_custkey, c_name,
        |       CAST(c_nationkey AS INTEGER) AS c_nationkey,
        |       CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "s15_warehouse_load" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"""
  )
}
