package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift tripwire. The driver regenerates /root/testdata
  * between rounds and has already changed a column's PHYSICAL encoding
  * once (events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), which broke
  * 35 tests and silently dropped 17 verify gates with no advance
  * warning. These assertions pin the loaded schema of every fixture
  * table, so the next regen fails HERE, as one readable diff, before
  * anything downstream misbehaves.
  */
class FixtureContractSpec extends SparkSpec {

  /** Expected LOADED schema (post spark.read, pre any normalization)
    * per table. Parquet timestamp[us] with isAdjustedToUTC=false
    * arrives as TIMESTAMP_NTZ under Spark's default inferTimestampNTZ.
    */
  private val expected = Map(
    "region" -> "r_regionkey INT,r_name STRING",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" -> ("c_custkey BIGINT,c_name STRING,c_nationkey INT," +
      "c_acctbal DOUBLE,c_mktsegment STRING"),
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" -> ("p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING," +
      "p_size INT,p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING," +
      "o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT," +
      "l_linenumber INT,l_quantity DOUBLE,l_extendedprice DOUBLE," +
      "l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING," +
      "l_shipdate TIMESTAMP_NTZ"),
    "events" -> ("event_id BIGINT,ts TIMESTAMP_NTZ,user_id BIGINT," +
      "event_type STRING,value DOUBLE,props STRING"),
    "documents" -> "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")

  private def ddl(t: StructType): String =
    t.fields.map(f => s"${f.name} ${f.dataType.sql}").mkString(",")

  test("every fixture table's loaded schema matches the pinned contract (sf0.001)") {
    val diffs = Tables.names.flatMap { name =>
      val got = ddl(Tables.load(spark, sf0001, name).schema)
      if (got == expected(name)) None
      else Some(s"$name:\n  expected ${expected(name)}\n  got      $got")
    }
    assert(diffs.isEmpty,
      "FIXTURE DRIFT — the driver regenerated testdata with new types; " +
        "re-audit every consumer of the changed column(s):\n" +
        diffs.mkString("\n"))
  }

  /** Value-drift canary: (row count, order-invariant xxhash64 bit_xor)
    * per table at sf0.01. Schema pinning above catches TYPE regens;
    * this catches a VALUE regen (new seed, new generator) — which
    * silently invalidates the frozen-VALUES oracle gates
    * (`ml1_confusion`, `ml5_text_clf` golden cells). If THIS test
    * fails and the schema test passes: re-freeze those golden cells
    * against the new fixtures and update these constants.
    */
  private val valueCanary = Map(
    "region" -> (5L, -3481749236230162207L),
    "nation" -> (25L, 5388655099354214392L),
    "customer" -> (1500L, 444616777978213876L),
    "supplier" -> (100L, 3395166893464491746L),
    "part" -> (2000L, 7794662097139650922L),
    "orders" -> (15000L, -1818839239062128904L),
    "lineitem" -> (60000L, 344258286308039897L),
    "events" -> (10000L, -6801306131500995683L),
    "documents" -> (500L, -2777317015277683973L),
    "embeddings" -> (500L, -2359375503946816093L))

  test("fixture VALUES are unchanged at sf0.01 (golden ml1/ml5 cells depend on them)") {
    val diffs = Tables.names.flatMap { name =>
      val df = Tables.load(spark, sf001, name)
      val cols = df.columns.map(c => coalesce(col(c).cast("string"), lit(" ")))
      val r = df.select(xxhash64(cols: _*).as("h"))
        .select(count(lit(1)).as("n"), expr("bit_xor(h)").as("chk")).head
      val got = (r.getLong(0), r.getLong(1))
      if (got == valueCanary(name)) None
      else Some(s"$name: expected ${valueCanary(name)}, got $got")
    }
    assert(diffs.isEmpty,
      "FIXTURE VALUE DRIFT — testdata was regenerated with different " +
        "values; re-freeze the golden VALUES oracles (ml1_confusion, " +
        "ml5_text_clf) and update valueCanary:\n" + diffs.mkString("\n"))
  }

  /** Census-parity tripwire (r15, from the r14 advice): the kmeans-
    * family and dc3 oracles score every raw `embeddings` row, while
    * the engine drops unscorable vectors (null/empty/NaN/zero-norm)
    * via Similarity.scorable. Today the two sets coincide because the
    * fixture has no unscorable vectors — this pin makes the NEXT
    * regen that plants one fail HERE, one readable assertion, instead
    * of as six correlated gate hash mismatches.
    */
  test("all fixture embedding vectors are scorable (km/dc3 oracle census parity)") {
    for (dir <- Seq(sf0001, sf001, "/root/testdata/sf0.1")) {
      val emb = Tables.load(spark, dir, "embeddings")
      val bad = emb.filter(!graft.similarity.Similarity.scorable(col("embedding")))
        .count()
      assert(bad == 0L,
        s"$dir embeddings has $bad unscorable vector(s) — the km1–km4/" +
          "e35/dc3 oracles now diverge from the engine's scorable " +
          "filter; mirror the predicate in those oracles before green")
    }
  }

  test("sf0.01 and sf0.1 events agree with sf0.001 on the ts encoding") {
    val base = Tables.load(spark, sf0001, "events").schema("ts").dataType
    for (dir <- Seq(sf001, "/root/testdata/sf0.1")) {
      val t = Tables.load(spark, dir, "events").schema("ts").dataType
      assert(t == base, s"$dir events.ts is $t but sf0.001 is $base")
    }
  }

  test("Tables.events normalizes ts to session-TZ TimestampType on current fixtures") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    // and values are sane wall-clock times, not 1970-collapsed (the
    // failure mode of dividing MICROS by 1000)
    val yr = df.select(min(year(col("ts"))).as("y")).head.getInt(0)
    assert(yr > 2000, s"ts collapsed toward epoch: min year $yr")
  }

  test("normalizeTs dispatch: TimestampType passthrough") {
    import spark.implicits._
    val df = Seq(1L).toDF("x")
      .select(timestamp_micros(lit(1700000000000000L)).as("ts"))
    assert(df.schema("ts").dataType == TimestampType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.head.getTimestamp(0).getTime == 1700000000000L)
  }

  test("normalizeTs dispatch: TIMESTAMP_NTZ casts value-preserving under UTC") {
    val df = spark.sql(
      "SELECT CAST('2022-03-01 12:30:00' AS TIMESTAMP_NTZ) AS ts")
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) ==
      spark.sql("SELECT unix_micros(TIMESTAMP'2022-03-01 12:30:00')")
        .head.getLong(0))
  }

  test("normalizeTs dispatch: legacy long-nanos arm (file round-trip)") {
    import spark.implicits._
    // a long ts column read from parquet is exactly what a true
    // TIMESTAMP(NANOS) file looks like under nanosAsLong=true (Spark
    // cannot WRITE nanos parquet, so synthesize the long-typed read)
    val d = java.nio.file.Files.createTempDirectory("graft_nanos_arm")
    Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(d.toString)
    val raw = spark.read.parquet(d.toString)
    assert(raw.schema("ts").dataType == LongType)
    val out = Tables.normalizeTs(raw)
    assert(out.schema("ts").dataType == TimestampType)
    // nanos truncated to micros, exactly
    assert(out.select(unix_micros(col("ts"))).head.getLong(0) ==
      1700000000123456L)
  }

  test("normalizeTs rejects an unusable ts type loudly") {
    import spark.implicits._
    val bad = Seq("oops").toDF("ts")
    val e = intercept[RuntimeException](Tables.normalizeTs(bad))
    assert(e.getMessage.contains("unsupported"))
  }

  test("EventStream.read dispatches on the on-disk encoding (micros era)") {
    val d = java.nio.file.Files.createTempDirectory("graft_contract_stream")
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    val s = graft.streaming.EventStream.read(spark, d.toString)
    assert(s.isStreaming && s.schema("ts").dataType == TimestampType)
    val n = graft.streaming.EventStream
      .runToMemory(spark, s.groupBy().count(), "contract_stream_n")
      .head.getLong(0)
    assert(n == Tables.events(spark, sf0001).count())
  }
}
