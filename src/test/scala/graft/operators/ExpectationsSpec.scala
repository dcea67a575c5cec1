package graft.operators

import org.apache.spark.sql.Row

class ExpectationsSpec extends graft.SparkSpec {
  import Expectations._
  import spark.implicits._

  // 6 rows: name has 1 null (5/6 complete); id has a duplicate;
  // score spans [-2, 9]; code is 2-digit except one row; seg has an
  // off-vocabulary value
  private def df = Seq(
    (1L, Option("a"), 1.0, "12", "X"),
    (2L, Option("b"), 5.0, "34", "Y"),
    (2L, Option("c"), 9.0, "56", "X"),
    (4L, Option("d"), -2.0, "78", "Y"),
    (5L, Option("e"), 3.0, "9", "X"),
    (6L, Option.empty[String], 4.0, "00", "Z")
  ).toDF("id", "name", "score", "code", "seg")

  private def run(cs: Seq[Constraint]): Map[String, Row] =
    verify(df, cs).collect().map(r => r.getString(0) -> r).toMap

  test("goldens: metrics, ratios, verdicts") {
    val out = run(Seq(
      Complete("name", 0.8), Unique("id"), Bounds("score", 0.0, 10.0),
      Matches("code", "^[0-9]{2}$", 0.8), InSet("seg", Seq("X", "Y"), 0.8)))
    assert(out("complete(name)").getLong(1) == 5)
    assert(out("complete(name)").getLong(2) == 6)
    assert(out("complete(name)").getInt(4) == 1)       // 5/6 >= 0.8
    assert(out("unique(id)").getLong(1) == 5)           // distinct ids
    assert(out("unique(id)").getInt(4) == 0)            // 5/6 < 1
    assert(out("bounds(score)").getLong(1) == 5)        // -2 out of range
    assert(out("bounds(score)").getInt(4) == 0)
    assert(out("matches(code)").getLong(1) == 5)        // "9" fails anchor
    assert(out("matches(code)").getInt(4) == 1)         // 5/6 >= 0.8
    assert(out("in_set(seg)").getLong(1) == 5)          // "Z" off-vocab
    assert(out("in_set(seg)").getInt(4) == 1)
    assert(out("complete(name)").getDouble(3) == 0.833333)
  }

  test("exact thresholds are inclusive and float-order-proof") {
    val out = run(Seq(Complete("name", 5.0 / 6.0)))
    // 5/6 ratio vs 5/6 threshold: integer cross-multiplication says pass
    assert(out("complete(name)").getInt(4) == 1)
  }

  test("all-pass on clean column set") {
    val out = run(Seq(Complete("id", 1.0), Bounds("score", -2.0, 9.0)))
    assert(out.values.forall(_.getInt(4) == 1))
  }

  test("empty input: constraints pass vacuously, ratio is null") {
    val empty = df.filter($"id" < 0)
    val rows = verify(empty, Seq(Complete("name", 1.0), Unique("id")))
      .collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getInt(4) == 1))
    assert(rows.forall(_.isNullAt(3)))
  }

  test("duplicate constraint names are rejected") {
    intercept[IllegalArgumentException] {
      verify(df, Seq(Complete("name", 1.0), Complete("name", 0.5)))
    }
  }

  test("streaming face: metrics accumulate across micro-batches to the batch verdict") {
    val dir = graft.core.Staging.tmpDir("dq_stream_spec")
    df.repartition(3).write.mode("overwrite").parquet(dir)
    val checks = Seq(Complete("name", 0.8), Bounds("score", 0.0, 10.0),
      Matches("code", "^[0-9]{2}$", 0.8))
    val src = spark.readStream.schema(df.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val sink = graft.streaming.EventStream.runToMemory(spark,
      metricsRow(src, checks), "dq_stream_spec_sink")
    val streamed = explodeMetrics(sink, checks.size)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    val batch = verify(df, checks)
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(streamed == batch)
  }

  test("one pass: no join, single output row source") {
    val q = verify(df, Seq(Complete("name", 1.0), Unique("id"),
      Bounds("score", 0.0, 1.0)))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
