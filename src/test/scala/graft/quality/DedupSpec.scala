package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden facts from the reference's employees fixture
  * (FIXTURES.md A2; Detection of Duplicate Row.ipynb cells 0–2).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def employees = Seq(
    ("James", "Sales", 3000L), ("Michael", "Sales", 4600L),
    ("Robert", "Sales", 4100L), ("Maria", "Finance", 3000L),
    ("James", "Sales", 3000L), ("Scott", "Finance", 3300L),
    ("Jen", "Finance", 3900L), ("Jeff", "Marketing", 3000L),
    ("Kumar", "Marketing", 2000L), ("Saif", "Sales", 4100L)
  ).toDF("employee_name", "department", "salary")

  test("D1: duplicate James rows get occur_id 1 and 2; all others 1") {
    val numbered = Dedup.withOccurrenceId(employees,
      keys = Seq("employee_name", "department", "salary"),
      order = Seq($"salary"))
    val james = numbered.filter($"employee_name" === "James")
      .select("occur_id").as[Int].collect().sorted
    assert(james.toSeq == Seq(1, 2))
    assert(numbered.filter($"employee_name" =!= "James")
      .filter($"occur_id" =!= 1).count() == 0)
  }

  test("D2+D3: occurrence profile reconciles to input row count") {
    val numbered = Dedup.withOccurrenceId(employees,
      Seq("employee_name", "department", "salary"), Seq($"salary"))
    val profile = Dedup.occurrenceProfile(numbered)
    assert(profile.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      == Map(1 -> 9L, 2 -> 1L))
    assert(Dedup.reconcile(profile).as[Long].head() == 10L)
  }

  test("D4+D5: dedup keeps 9 rows and is idempotent (distinct fixpoint)") {
    val numbered = Dedup.withOccurrenceId(employees,
      Seq("employee_name", "department", "salary"), Seq($"salary"))
    val deduped = Dedup.dedupByOccurrence(numbered)
      .drop("occur_id")
    assert(deduped.count() == 9)
    assert(deduped.distinct().count() == 9)
  }

  test("D6: drop_duplicates equivalent") {
    assert(Dedup.dropExactDuplicates(employees).count() == 9)
    assert(Dedup.dropExactDuplicates(employees, Seq("department")).count() == 3)
  }
}
