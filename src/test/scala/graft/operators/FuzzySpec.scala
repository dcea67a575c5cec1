package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {

  private def names = {
    import spark.implicits._
    Seq(
      (1L, "smith", "A"), (2L, "smyth", "A"), (3L, "smithe", "A"),
      (4L, "jones", "A"), (5L, "smith", "B"))
      .toDF("id", "name", "block")
  }

  test("pairs within the distance bound, a_id < b_id, exact distances") {
    val got = Fuzzy.blockedEditDistancePairs(names, "id", "name", Seq("block"), 2)
      .orderBy(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // smith~smyth=1, smith~smithe=1, smyth~smithe=2; jones is >2 from all
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("blocking prevents cross-block pairs even at distance 0") {
    val got = Fuzzy.blockedEditDistancePairs(names, "id", "name", Seq("block"), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(!got.contains((1L, 5L)), "identical names in different blocks must not pair")
  }

  test("unblocked call is refused") {
    intercept[IllegalArgumentException] {
      Fuzzy.blockedEditDistancePairs(names, "id", "name", Nil, 2)
    }
  }

  test("sub-block salting does not change the pair set") {
    def pairs(s: Int) =
      Fuzzy.blockedEditDistancePairs(names, "id", "name", Seq("block"), 2,
        subBlocks = Some(s))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(pairs(1) == pairs(7))
    assert(pairs(7) == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }
}
