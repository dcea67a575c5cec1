package graft.operators

class SnapshotDiffSpec extends graft.SparkSpec {
  import spark.implicits._

  private def a = Seq(
    (1L, Option("alpha"), Option("s1")),
    (2L, Option("beta"), Option("s1")),
    (3L, Option("gamma"), Option("s2")),
    (4L, Option.empty[String], Option("s2"))
  ).toDF("id", "text", "src")

  private def b = Seq(
    (1L, Option("alpha"), Option("s1")),       // unchanged
    (2L, Option("beta v2"), Option("s1")),     // changed
    (4L, Option.empty[String], Option("s2")),  // unchanged (null == null)
    (5L, Option("new"), Option("s3"))          // added; 3 removed
  ).toDF("id", "text", "src")

  private def statuses = SnapshotDiff
    .diff(a, b, "id", Seq("text", "src"))
    .as[(Long, String)].collect().toMap

  test("golden classification incl. null content") {
    assert(statuses == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "unchanged", 5L -> "added"))
  }

  test("null becomes non-null is changed, not unchanged") {
    val b2 = Seq((4L, Option("filled"), Option("s2"))).toDF("id", "text", "src")
    val st = SnapshotDiff.diff(a.filter($"id" === 4), b2, "id",
      Seq("text", "src")).as[(Long, String)].collect().toMap
    assert(st(4L) == "changed")
  }

  test("length-prefixing: column-boundary shifts are changes") {
    val x = Seq((1L, "ab", "c")).toDF("id", "u", "v")
    val y = Seq((1L, "a", "bc")).toDF("id", "u", "v")
    val st = SnapshotDiff.diff(x, y, "id", Seq("u", "v"))
      .as[(Long, String)].collect().toMap
    assert(st(1L) == "changed")
  }

  test("census rolls up counts and id spans") {
    val rows = SnapshotDiff.census(a, b, "id", Seq("text", "src"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("unchanged") == ((2L, 1L, 4L)))
    assert(rows("added") == ((1L, 5L, 5L)))
    assert(rows("removed") == ((1L, 3L, 3L)))
    assert(rows("changed") == ((1L, 2L, 2L)))
  }

  test("identical snapshots are all unchanged") {
    val st = SnapshotDiff.diff(a, a, "id", Seq("text", "src"))
      .as[(Long, String)].collect()
    assert(st.forall(_._2 == "unchanged") && st.length == 4)
  }
}
