package graft.operators

import org.apache.spark.sql.functions._

class SkewSpec extends graft.SparkSpec {
  import spark.implicits._

  // hot key: 900 of 1000 fact rows share key 7
  private def fact = (1L to 1000L)
    .map(i => (if (i <= 900) 7L else i, i, s"payload $i"))
    .toDF("k", "row_id", "payload")
  // dim with a duplicate key (17 twice) and keys absent from fact
  private def dim = Seq((7L, "hot"), (17L, "a"), (17L, "b"), (999999L, "unmatched"))
    .toDF("k", "label")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "row_id", "payload", "label")
      .collect().map(_.toSeq).toSeq
      .sortBy(_.mkString("|"))

  test("salted inner join equals the plain join, pair for pair") {
    val plain = fact.join(dim, Seq("k"), "inner")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
    assert(canon(salted) == canon(plain))
  }

  test("salted left join preserves unmatched fact rows exactly once") {
    val plain = fact.join(dim, Seq("k"), "left")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8, joinType = "left")
    assert(canon(salted) == canon(plain))
    assert(salted.count() == plain.count())
  }

  test("the hot key's fact rows spread across the salt space") {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(8L)).cast("int"))
    val hotSalts = salted.filter($"k" === 7L)
      .select("__salt").distinct().count()
    assert(hotSalts == 8L, s"hot key used $hotSalts of 8 salts")
  }

  test("non-fact-preserving join types are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, Seq("k"), joinType = "right")
    }
  }

  test("salts=1 degenerates to the plain join") {
    val plain = fact.join(dim, Seq("k"), "inner")
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 1)
    assert(canon(salted) == canon(plain))
  }
}
