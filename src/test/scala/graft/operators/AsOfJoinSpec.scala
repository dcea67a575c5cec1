package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks the latest right row <= left ts; ties inclusive; no match → null") {
    val quotes = Seq( // (symbol, ts, price)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "ts", "price")
    val trades = Seq( // (symbol, ts, qty)
      ("A", 5L, 100L),  // before any quote → null
      ("A", 20L, 200L), // tie with quote@20 → inclusive → 2.0
      ("A", 25L, 300L), // between → 2.0
      ("A", 99L, 400L), // after all → 3.0
      ("B", 14L, 500L), // before B's only quote → null
      ("B", 16L, 600L)  // → 9.0
    ).toDF("sym", "ts", "qty")

    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", Seq("price"))
      .orderBy($"sym", $"ts")
      .select($"sym", $"ts", $"qty", $"r_price")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))

    assert(out.toSeq == Seq(
      ("A", 5L, 100L, None),
      ("A", 20L, 200L, Some(2.0)),
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 14L, 500L, None),
      ("B", 16L, 600L, Some(9.0))))
  }

  test("matched right row is carried atomically: NULL fields stay NULL, no stale mixing") {
    val quotes = Seq(
      ("A", 10L, Some(5.0), 1L),          // older row, non-null price
      ("A", 20L, None: Option[Double], 2L) // latest row has NULL price
    ).toDF("sym", "ts", "price", "qid")
    val trades = Seq(("A", 25L, 100L)).toDF("sym", "ts", "qty")
    val r = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", Seq("qid", "price")).head()
    // the match is quote qid=2 — its NULL price must NOT be backfilled
    // from qid=1 (per-column carry would fabricate (2, 5.0))
    assert(r.getAs[Long]("r_qid") == 2L)
    assert(r.isNullAt(r.fieldIndex("r_price")))
  }

  test("forward direction picks the nearest right row >= left ts, ties inclusive") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 5L, 9.0))
      .toDF("sym", "ts", "price")
    val trades = Seq(
      ("A", 5L, 100L),  // next quote at 10 → 1.0
      ("A", 10L, 200L), // tie inclusive → 1.0
      ("A", 15L, 300L), // next at 20 → 2.0
      ("A", 25L, 400L), // nothing after → null
      ("B", 9L, 500L)   // after B's only quote → null
    ).toDF("sym", "ts", "qty")
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", Seq("price"),
      direction = "forward")
      .orderBy($"sym", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(r.fieldIndex("r_price"))) None
        else Some(r.getAs[Double]("r_price"))))
    assert(out.toSeq == Seq(
      ("A", 5L, Some(1.0)), ("A", 10L, Some(1.0)), ("A", 15L, Some(2.0)),
      ("A", 25L, None), ("B", 9L, None)))
  }

  test("tolerance nulls out matches farther than the bound, both directions") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 100L, 2.0)).toDF("sym", "ts", "price")
    val trades = Seq(("A", 18L, 1L), ("A", 60L, 2L), ("A", 95L, 3L))
      .toDF("sym", "ts", "qty")
    def prices(direction: String): Seq[Option[Double]] =
      AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", Seq("price"),
        direction = direction, tolerance = Some(10L))
        .orderBy($"ts").collect()
        .map(r => if (r.isNullAt(r.fieldIndex("r_price"))) None
          else Some(r.getAs[Double]("r_price"))).toSeq
    // backward: 18→quote@10 (Δ8 ok), 60→quote@10 (Δ50 too far), 95→quote@10? no,
    // latest ≤95 is quote@10 (Δ85) → null
    assert(prices("backward") == Seq(Some(1.0), None, None))
    // forward: 18→quote@100 (Δ82) null, 60→Δ40 null, 95→quote@100 (Δ5) ok
    assert(prices("forward") == Seq(None, None, Some(2.0)))
  }

  test("ties among right rows at equal ts resolve deterministically") {
    val quotes = Seq(("A", 10L, 1.0, 7L), ("A", 10L, 2.0, 3L))
      .toDF("sym", "ts", "price", "qid")
    val trades = Seq(("A", 15L, 100L)).toDF("sym", "ts", "qty")
    val picks = (1 to 3).map { _ =>
      AsOfJoin.asof(trades, quotes, Seq("sym"), "ts", Seq("qid", "price"))
        .head().getAs[Long]("r_qid")
    }
    assert(picks.distinct.size == 1) // same pick every run (greatest payload struct)
    assert(picks.head == 7L)
  }
}
