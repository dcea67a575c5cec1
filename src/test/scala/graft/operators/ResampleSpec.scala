package graft.operators

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("hourly LOCF grid: aligned ticks, carried values, leading-gap nulls") {
    val step = 3600L // 1 "hour" in toy units
    val ev = Seq( // (user, ts, id, v)
      (1L, 3700L, 10L, 1.0),  // first obs after the first aligned tick
      (1L, 7300L, 11L, 2.0),
      (1L, 14500L, 12L, 3.0), // gap: tick 10800 carries id 11
      (2L, 100L, 20L, 9.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = Resample.resampleLocf(ev, Seq("user_id"), "ts_us",
      Seq("event_id", "value"), step)
      .orderBy($"user_id", $"ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 3600L, -1L),  // aligned below first obs → nothing to carry
      (1L, 7200L, 10L),
      (1L, 10800L, 11L), // gap-filled
      (1L, 14400L, 11L),
      (1L, 18000L, 12L), // aligned-up end tick carries the last obs
      (2L, 0L, -1L),
      (2L, 3600L, 20L)))
  }

  test("pre-1970 (negative epoch) observations: first tick aligns DOWN, last UP") {
    val step = 3600L
    // `div` truncates toward zero; without the remainder correction the
    // first tick for lo=-7000 would be -3600 (aligned UP — wrong) instead
    // of -7200, and the last tick for hi=-100 would be -3600 instead of 0
    val ev = Seq(
      (1L, -7000L, 10L, 1.0),
      (1L, -100L, 11L, 2.0))
      .toDF("user_id", "ts_us", "event_id", "value")
    val out = Resample.resampleLocf(ev, Seq("user_id"), "ts_us",
      Seq("event_id", "value"), step)
      .orderBy($"user_id", $"ts_us")
      .collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(out == Seq(
      (-7200L, -1L), // largest multiple <= -7000: floor, not trunc
      (-3600L, 10L),
      (0L, 11L)))    // smallest multiple >= -100: ceil, not trunc
  }

  test("non-positive step is rejected up front, not as an opaque runtime error") {
    val ev = Seq((1L, 0L, 1L)).toDF("user_id", "ts_us", "event_id")
    intercept[IllegalArgumentException] {
      Resample.resampleLocf(ev, Seq("user_id"), "ts_us", Seq("event_id"), 0L)
    }
    intercept[IllegalArgumentException] {
      Resample.resampleLocf(ev, Seq("user_id"), "ts_us", Seq("event_id"), -3600L)
    }
  }
}
