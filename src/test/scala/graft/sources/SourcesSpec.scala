package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("LogParser parses a canonical NASA-style line (FIXTURES.md A4)") {
    val line = """in24.inetnebr.com - - [01/Aug/1995:00:00:01 -0400] "GET /shuttle/missions/sts-68/news/sts-68-mcc-05.txt HTTP/1.0" 200 1839"""
    val parsed = LogParser.cleanParse(Seq(line, "not a log line").toDF("value"))
    val r = parsed.collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("ip_addr") == "in24.inetnebr.com")
    assert(row.getAs[Int]("day_of_month") == 1 && row.getAs[String]("month") == "Aug")
    assert(row.getAs[Int]("status") == 200 && row.getAs[Long]("bytes") == 1839L)
    assert(row.getAs[java.sql.Timestamp]("datetime_stamp").toString.startsWith("1995-08-01 00:00:01"))
  }

  test("WarehouseSink stages CSV and issues one load command (S10)") {
    val loader = new Sinks.RecordingLoader
    val sink = new Sinks.WarehouseSink(loader)
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    sink.save(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir, "ds.tbl")
    assert(loader.commands.toList == List(s"load --source_format=CSV --replace --autodetect ds.tbl $dir/*"))
    val back = Sources.csv(spark, dir, header = false, inferSchema = true)
    assert(back.count() == 2)
  }

  test("JDBC source pushes filters down to the database") {
    import graft.core.Tables
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc_pd").toString + "/db"
    val opts = Map("url" -> s"jdbc:derby:$db;create=true",
      "dbtable" -> "nation_pd", "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    Sinks.jdbc(Tables.nation(spark, sf0001), opts)
    val filtered = Sources.jdbc(spark, opts).filter($"n_regionkey" === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"JDBC filter not pushed:\n$plan")
    assert(filtered.count() > 0)
  }

  test("partitioned JDBC scan: parallel strides, same data as the single-connection read") {
    import graft.core.Tables
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc_par").toString + "/db"
    val opts = Map("url" -> s"jdbc:derby:$db;create=true",
      "dbtable" -> "customer_par", "driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    Sinks.jdbc(Tables.customer(spark, sf0001).select($"c_custkey", $"c_acctbal"), opts)
    val par = Sources.jdbcPartitioned(spark, opts, "c_custkey",
      lowerBound = 0L, upperBound = 2000L, numPartitions = 4)
    assert(par.rdd.getNumPartitions == 4, "expected one task per stride")
    val single = Sources.jdbc(spark, opts)
    assert(par.collect().map(_.toString).sorted.toSeq ==
      single.collect().map(_.toString).sorted.toSeq)
  }

  test("CSV modes: PERMISSIVE keeps malformed rows as nulls, DROPMALFORMED drops") {
    import org.apache.spark.sql.types._
    val d = java.nio.file.Files.createTempDirectory("graft_csvmode").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "x.csv"),
      "k,v\n1,1.5\nbad\n2,2.5\n")
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("v", DoubleType)))
    // materialize columns: under CSV column pruning a bare count() does
    // not parse any column, so DROPMALFORMED has nothing to drop on
    assert(Sources.csv(spark, d, Some(schema), mode = "DROPMALFORMED").collect().length == 2)
    assert(Sources.csv(spark, d, Some(schema), mode = "PERMISSIVE").collect().length == 3)
  }

  test("shuffledShards: shard files in name order ARE the global md5 order") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"text")
    val dir = graft.core.Staging.tmpDir("shuffled_shards")
    Sinks.shuffledShards(docs, dir, "doc_id", numShards = 4)

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length == 4, s"expected 4 shard files, got ${files.length}")

    // concatenation of per-file contents (each read alone, in file
    // order) must equal the corpus ordered by md5(key) globally
    val sharded = files.flatMap { f =>
      spark.read.parquet(f).select("doc_id").as[Long].collect()
    }.toSeq
    val expected = docs
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(sharded == expected)
    // and it is NOT the natural order (the shuffle does something)
    assert(sharded != sharded.sorted)
  }
}
