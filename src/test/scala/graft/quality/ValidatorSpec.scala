package graft.quality

import graft.SparkSpec
import graft.transform.Cleansers
import org.apache.spark.sql.functions._

class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "12.74%"), (2L, "7.9%"), (3L, "N/A"), (4L, "57.2%")
  ).toDF("id", "int_rate")

  private val rule = Validator.ValidationRule(
    "int_rate", "int_rate_flag", "^[0-9]+(\\.[0-9]+)?%$",
    repair = Cleansers.percentToDouble($"int_rate"))

  test("validate flags exactly the invalid value") {
    val flagged = Validator.validate(rows, Seq(rule))
    assert(flagged.filter($"int_rate_flag" === Validator.Invalid)
      .select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("census counts valid/invalid per rule") {
    val c = Validator.census(rows, Seq(rule))
      .as[(String, String, Long)].collect().toSet
    assert(c == Set(("int_rate", "valid", 3L), ("int_rate", "invalid", 1L)))
  }

  test("repair converts valid values, nulls the irreparable; allValid after drop") {
    val repaired = Validator.repair(rows, Seq(rule))
    assert(repaired.filter($"int_rate".isNull).select("id").as[Long].collect().toSeq == Seq(3L))
    val kept = repaired.filter($"int_rate".isNotNull)
    assert(kept.select("int_rate").as[Double].collect().sorted.toSeq == Seq(7.9, 12.74, 57.2))
  }
}
