package graft.profile

import graft.SparkSpec

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("describeTransposed: one row per column, stats as columns") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    val report = Profiler.describeTransposed(df)
    val lines = report.linesIterator.toSeq
    assert(lines.head.startsWith("column") && lines.head.contains("count")
      && lines.head.contains("mean") && lines.head.contains("max"))
    assert(lines.size == 3) // header + one row per column
    val aRow = lines.find(_.startsWith("a")).get
    assert(aRow.split("\\s+").toSeq.take(3) == Seq("a", "3", "2.0"))
  }

  test("describeTransposed: skips non-describable columns without misaligning") {
    val events = graft.core.Tables.events(spark, sf0001) // has a timestamp col
    val report = Profiler.describeTransposed(events)
    val lines = report.linesIterator.toSeq
    assert(!lines.exists(_.startsWith("ts ")), "timestamp col must be skipped")
    assert(lines.exists(_.startsWith("value")), "numeric col must be present")
    val n = events.count().toString
    assert(lines.find(_.startsWith("event_id")).get.split("\\s+")(1) == n,
      "count column must align with its column")
  }

  test("describeTransposed: column subset and null stats render") {
    val df = Seq((Some(1.0), "x"), (None, "y")).toDF("v", "s")
    val report = Profiler.describeTransposed(df, "v")
    assert(report.linesIterator.size == 2)
    assert(report.contains("1")) // non-null count of v
  }
}
