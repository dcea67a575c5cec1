package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: updates win, inserts appear, untouched rows survive") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (9L, "new", 1.0)).toDF("k", "s", "v")
    val out = Warehouse.upsert(base, updates, Seq("k"))
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0)))
  }

  test("upsertLatest reduces multi-change CDC batches to one winner per key") {
    val base = Seq((1L, 0L, "a"), (2L, 0L, "b")).toDF("k", "ver", "s")
    val cdc = Seq((2L, 1L, "B1"), (2L, 3L, "B3"), (2L, 2L, "B2"), (9L, 1L, "new"))
      .toDF("k", "ver", "s")
    val out = Warehouse.upsertLatest(base, cdc, Seq("k"), "ver")
      .orderBy($"k").as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 0L, "a"), (2L, 3L, "B3"), (9L, 1L, "new")))
  }

  test("upsert is idempotent: applying the same batch twice changes nothing") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val updates = Seq((2L, "B")).toDF("k", "s")
    val once = Warehouse.upsert(base, updates, Seq("k"))
    val twice = Warehouse.upsert(once, updates, Seq("k"))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("scd2: collapses runs, builds [from,to) chain, flags current") {
    val ch = Seq(
      (1L, 10L, 100L, "x"), (1L, 20L, 101L, "x"), // duplicate state collapses
      (1L, 30L, 102L, "y"), (1L, 40L, 103L, "x"), // state can recur later
      (2L, 5L, 104L, "z"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = Warehouse.scd2(ch, Seq("user_id"), "ts_us",
      Seq($"ts_us", $"event_id"), "event_type")
      .select($"user_id", $"event_type", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"user_id", $"valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "x", 10L, 30L, false),
      (1L, "y", 30L, 40L, false),
      (1L, "x", 40L, -1L, true),
      (2L, "z", 5L, -1L, true)))
  }

  test("snapshot diff classifies insert/delete/update and drops unchanged") {
    val old = Seq((1L, java.lang.Double.valueOf(10.0)), (2L, java.lang.Double.valueOf(20.0)),
      (3L, java.lang.Double.valueOf(30.0)), (4L, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "v")
    val neu = Seq((1L, java.lang.Double.valueOf(10.0)), (2L, java.lang.Double.valueOf(25.0)),
      (4L, java.lang.Double.valueOf(40.0)), (5L, java.lang.Double.valueOf(50.0)))
      .toDF("k", "v")
    val out = Warehouse.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // 1 unchanged (dropped), 2 update, 3 delete, 4 null→value update, 5 insert
    assert(out == Seq((2L, "update"), (3L, "delete"), (4L, "update"), (5L, "insert")))
  }

  test("scd2 plans one exchange (shared partitioning for both windows)") {
    val ev = graft.core.Tables.events(spark, sf0001)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"event_type")
    val df = Warehouse.scd2(ev, Seq("user_id"), "ts_us",
      Seq($"ts_us", $"event_id"), "event_type")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
  }
}
