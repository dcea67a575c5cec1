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
