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
}
