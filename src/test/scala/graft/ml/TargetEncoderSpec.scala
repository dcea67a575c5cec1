package graft.ml

import org.apache.spark.sql.functions._

class TargetEncoderSpec extends graft.SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0), ("a", 3.0), ("b", 10.0)
  ).toDF("cat", "y")

  test("hand-computed golden with smoothing 1") {
    // mu = 14/3; enc(a) = (4 + 14/3)/3 = 26/9; enc(b) = (10 + 14/3)/2 = 22/3
    val enc = TargetEncoder.fit(df, "cat", "y", smoothing = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(enc("a") - 26.0 / 9) < 1e-6)
    assert(math.abs(enc("b") - 22.0 / 3) < 1e-6)
  }

  test("shrinkage: rare categories pull toward the global mean") {
    val mu = 14.0 / 3
    val raw = Map("a" -> 2.0, "b" -> 10.0)
    for (m <- Seq(1.0, 10.0, 100.0)) {
      val enc = TargetEncoder.fit(df, "cat", "y", m)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      for ((c, e) <- enc) {
        assert(math.abs(e - mu) <= math.abs(raw(c) - mu) + 1e-9,
          s"cat $c smoothing $m: $e not between raw ${raw(c)} and mu $mu")
      }
    }
    // heavier smoothing lands strictly closer to mu
    val e1 = TargetEncoder.fit(df, "cat", "y", 1.0)
      .filter($"cat" === "b").select("enc").as[Double].head()
    val e100 = TargetEncoder.fit(df, "cat", "y", 100.0)
      .filter($"cat" === "b").select("enc").as[Double].head()
    assert(math.abs(e100 - mu) < math.abs(e1 - mu))
  }

  test("transform joins the table back; unseen categories get null") {
    val table = TargetEncoder.fit(df, "cat", "y", 1.0)
    val applied = TargetEncoder.transform(
        Seq("a", "b", "zz").toDF("cat"), table, "cat")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(applied("a").isDefined && applied("b").isDefined)
    assert(applied("zz").isEmpty)
  }

  test("null categories and targets are excluded from the fit") {
    val withNulls = (Seq(Option("a") -> Option(1.0),
      Option("a") -> Option.empty[Double],
      Option.empty[String] -> Option(99.0)))
      .map { case (c, y) => (c, y) }.toDF("cat", "y")
    val enc = TargetEncoder.fit(withNulls, "cat", "y", 0.0001)
      .collect()
    assert(enc.length == 1)
    assert(enc.head.getLong(1) == 1L)
  }
}
