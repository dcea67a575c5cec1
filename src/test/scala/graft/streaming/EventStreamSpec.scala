package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  /** File-source dir exposing the fixture via symlink. */
  private def streamSrcDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.createSymbolicLink(
      d.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    d.toString
  }

  test("stream starts on an EMPTY ingestion dir (schema-inference fallback)") {
    // the normal state of an ingestion directory at stream start: no
    // parquet has landed yet, so batch inference throws and read() must
    // fall back to the explicit MICROS-era schema instead of failing
    val d = java.nio.file.Files.createTempDirectory("graft_stream_empty").toString
    val out = EventStream.runToMemory(spark,
      EventStream.tumblingCounts(EventStream.read(spark, d)), "spec_empty_dir")
    assert(out.count() == 0L)
    assert(EventStream.read(spark, d).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("streaming tumbling rollup equals the batch rollup (sf0.001)") {
    val d = streamSrcDir("graft_stream_spec")
    val streamed = EventStream.runToMemory(spark,
      EventStream.tumblingCounts(EventStream.read(spark, d)), "spec_windows")
    val batch = graft.core.Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
    val s = streamed.select($"hour_start", $"event_type", $"n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val b = batch.as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(s == b && s.nonEmpty)
  }

  test("streaming EWMA equals the batch secondary-sort fold (sf0.001)") {
    import org.apache.spark.sql.streaming.OutputMode
    val d = streamSrcDir("graft_stream_ewma")
    val streamed = EventStream.runToMemory(spark,
      EventStream.ewmaUpdates(EventStream.read(spark, d), 0.25).toDF(),
      "spec_ewma", OutputMode.Update())
    val batch = graft.operators.Ewma.ewmaLast(
      graft.core.Tables.events(spark, sf0001)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
        .filter($"user_id".isNotNull && $"value".isNotNull),
      "user_id", "value", Seq("ts_us", "event_id"), 0.25)
    val s = streamed.as[(Long, Long, Double)].collect().toSet
    val b = batch.as[(Long, Long, Double)].collect().toSet
    assert(s == b && s.nonEmpty, "stream fold must be bit-identical to batch")
  }

  test("streaming EWMA state carries across micro-batches (maxFilesPerTrigger=1)") {
    import org.apache.spark.sql.streaming.OutputMode
    // two files arriving time-ordered per key: batch 1 then batch 2
    val d = java.nio.file.Files.createTempDirectory("graft_stream_ewma2")
    val mk = (id: Long, us: Long, v: Double) => (id, us * 1000L, 1L, "click", v, "{}")
    // the file source expects FILES at the top level (like the fixture
    // symlinks) — stage each batch dir's part file under $d
    def stage(rows: Seq[(Long, Long, Long, String, Double, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ewma_stage")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.copy(part, java.nio.file.Paths.get(s"$d/$name"))
    }
    stage(Seq(mk(1, 1000, 1.0), mk(2, 1000, 2.0)), "b1.parquet")
    stage(Seq(mk(3, 2000, 3.0), mk(4, 3000, 5.0)), "b2.parquet")
    // nanosAsLong comes from the Sessions.local builder config
    val src = spark.readStream.schema(EventStream.rawSchema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val out = EventStream.runToMemory(spark,
      EventStream.ewmaUpdates(src, 0.25).toDF(), "spec_ewma_mb", OutputMode.Update())
    // user 1: batch1 folds 1.0, 2.0 -> 1.25; batch2 continues from state:
    // 1.25*.75+3*.25 = 1.6875 -> 1.6875*.75+5*.25 = 2.515625
    val finals = out.as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    assert(finals(1L) == ((1L, 4L, 2.515625)),
      s"state must continue across batches: ${finals(1L)}")
    // two updates for the key = two micro-batches actually fired
    assert(out.filter($"user_id" === 1L).count() == 2)
  }

  test("append mode with watermark emits only closed windows") {
    val d = streamSrcDir("graft_stream_append")
    val q = EventStream.runToMemory(spark,
      EventStream.tumblingCounts(EventStream.read(spark, d), watermark = "30 minutes"),
      "spec_append", org.apache.spark.sql.streaming.OutputMode.Append())
    // single micro-batch: watermark advances only after it completes, so
    // append emits windows closed w.r.t. the final watermark — strictly
    // fewer than complete mode's, and never the last (open) window
    val total = graft.core.Tables.events(spark, sf0001)
      .select(date_trunc("hour", $"ts")).distinct().count()
    assert(q.select($"hour_start").distinct().count() < total)
  }

  test("stream-static enrichment join matches the batch join") {
    val d = streamSrcDir("graft_stream_join")
    // static dim: user segment by id parity
    val dim = spark.range(0, 10000).select($"id".as("user_id"),
      when($"id" % 2 === 0, "even").otherwise("odd").as("segment"))
    val enriched = EventStream.read(spark, d)
      .join(dim, "user_id")
      .groupBy($"segment").agg(count(lit(1)).as("n"))
    val got = EventStream.runToMemory(spark, enriched, "spec_enrich")
      .as[(String, Long)].collect().toMap
    val want = graft.core.Tables.events(spark, sf0001)
      .join(dim, "user_id").groupBy($"segment").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("foreachBatch sink: custom writer sees every row exactly once with batch ids") {
    val d = streamSrcDir("graft_stream_feb")
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    EventStream.runForeachBatch(EventStream.read(spark, d), (df, id) => {
      seen.addAndGet(df.count())
      batches.add(id)
      ()
    })
    val total = graft.core.Tables.events(spark, sf0001).count()
    assert(seen.get() == total, s"foreachBatch saw ${seen.get()} of $total rows")
    assert(!batches.isEmpty)
  }

  test("stream-stream interval join matches the batch interval join") {
    val d = streamSrcDir("graft_stream_ss")
    val joined = EventStream.purchaseClickJoin(EventStream.read(spark, d))
    val got = EventStream.runToMemory(spark, joined, "spec_ss_join",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Long)].collect().toSet

    val ev = graft.core.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"us".as("p_us"))
    val c = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("cu"), $"us".as("c_us"))
    val want = p.join(c, $"user_id" === $"cu" &&
        $"c_us" >= $"p_us" - 600000000L && $"c_us" <= $"p_us")
      .select($"purchase_id", $"user_id", $"click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("parquet file sink with checkpoint: restart does not duplicate output") {
    val src = streamSrcDir("graft_fsink_src")
    val out = java.nio.file.Files.createTempDirectory("graft_fsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fsink_ckpt").toString

    def runOnce(): Unit = {
      val q = EventStream.read(spark, src)
        .select($"event_id", $"user_id", $"event_type")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    runOnce() // same checkpoint: no new input → nothing reprocessed
    val afterSecond = spark.read.parquet(out).count()
    val batch = graft.core.Tables.events(spark, sf0001).count()
    assert(afterFirst == batch && afterSecond == batch,
      s"expected exactly-once $batch rows, got $afterFirst then $afterSecond")
  }

  test("jsonl stream sink: stream-written corpus reads back equal to the batch frame") {
    // the wire format a curated corpus ships in — stream variant of
    // Sinks.jsonl, with checkpointed exactly-once file commits
    val src = streamSrcDir("graft_jsink_src")
    val out = java.nio.file.Files.createTempDirectory("graft_jsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_jsink_ckpt").toString
    val q = EventStream.read(spark, src)
      .select($"event_id", $"user_id", $"event_type")
      .writeStream.format("json")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema).json(out)
    val batch = graft.core.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type")
    assert(back.count() == batch.count())
    assert(back.except(batch).isEmpty && batch.except(back).isEmpty)
  }

  test("csv stream sink: stream-written file reads back equal to the batch frame") {
    val src = streamSrcDir("graft_csink_src")
    val out = java.nio.file.Files.createTempDirectory("graft_csink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_csink_ckpt").toString
    val q = EventStream.read(spark, src)
      .select($"event_id", $"user_id", $"event_type")
      .writeStream.format("csv")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema).csv(out)
    val batch = graft.core.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", $"event_type")
    assert(back.count() == batch.count())
    assert(back.except(batch).isEmpty && batch.except(back).isEmpty)
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events with bounded state") {
    // two symlinks to the same file → every event delivered twice
    val d = java.nio.file.Files.createTempDirectory("graft_stream_dup")
    Seq("events.parquet", "events_redelivered.parquet").foreach { n =>
      java.nio.file.Files.createSymbolicLink(
        d.resolve(n), java.nio.file.Paths.get(s"$sf0001/events.parquet"))
    }
    val deduped = EventStream.dedupWithinWatermark(
      EventStream.read(spark, d.toString), Seq("event_id"))
    val got = EventStream.runToMemory(spark, deduped, "spec_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append()).count()
    val distinctIds = graft.core.Tables.events(spark, sf0001).count()
    assert(got == distinctIds, s"expected $distinctIds deduped rows, got $got")
  }

  test("stateful sessionization merges events within the gap") {
    import EventStream.{Event, UserSession}
    val base = 1700000000000L
    val events = Seq(
      Event(1L, new java.sql.Timestamp(base), "c", 1.0),
      Event(1L, new java.sql.Timestamp(base + 60000), "c", 1.0),   // same session
      Event(1L, new java.sql.Timestamp(base + 10000000), "c", 1.0), // new session
      Event(2L, new java.sql.Timestamp(base), "c", 1.0)
    ).toDS()
    // batch harness for the stateful function: group + fold directly
    val sessions = EventStream.userSessions(events, gapMs = 30 * 60 * 1000)
    // flatMapGroupsWithState on a batch Dataset emits only closed
    // sessions (state never times out in batch), so user 1's first
    // session is emitted; trailing open sessions stay in state
    val out = sessions.collect()
    assert(out.exists(s => s.user_id == 1L && s.n_events == 2 && s.seconds == 60.0))
  }
}
