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

  test("describeTransposed: column subset and null stats render") {
    val df = Seq((Some(1.0), "x"), (None, "y")).toDF("v", "s")
    val report = Profiler.describeTransposed(df, "v")
    assert(report.linesIterator.size == 2)
    assert(report.contains("1")) // non-null count of v
  }
}
