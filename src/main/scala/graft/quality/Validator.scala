package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex validity auditing and repair (SURVEY.md §2.2 F6/F7, §3.2:
  * the validator loop of
  * 2022-Standalone-SparkETL-identifyingDuplicateRows%26InvalidData.ipynb
  * cells 29–34: flag per-column validity, census the flags, repair,
  * re-validate).
  *
  * Rules are declarative; validation is one projection (all flags in a
  * single pass), the census one aggregation per rule — nothing here
  * shuffles more than a grouped count.
  */
object Validator {

  /** @param column   column under audit
    * @param flagCol  name of the validity flag column to add
    * @param pattern  regex that valid values must match
    * @param repair   expression producing the repaired value; applied
    *                 ONLY to pattern-valid values ([[repair]] wraps it
    *                 in the guard), so irreparable values become NULL
    *                 instead of ANSI cast errors and callers never
    *                 restate the pattern
    */
  final case class ValidationRule(column: String, flagCol: String,
                                  pattern: String, repair: Column)

  val Valid = "valid"
  val Invalid = "invalid"

  /** F6/F7 — add one validity flag per rule in a single projection. */
  def validate(df: DataFrame, rules: Seq[ValidationRule]): DataFrame =
    rules.foldLeft(df)((d, r) => d.withColumn(r.flagCol,
      when(col(r.column).rlike(r.pattern), Valid).otherwise(Invalid)))

  /** A3 — per-rule validity census: (col_name, flag, cnt).
    * ("col_name", not "column" — reserved word in several engines.)
    */
  def census(df: DataFrame, rules: Seq[ValidationRule]): DataFrame = {
    val flagged = validate(df, rules)
    rules.map { r =>
      flagged.groupBy(lit(r.column).as("col_name"), col(r.flagCol).as("flag"))
        .agg(count(lit(1)).as("cnt"))
    }.reduce(_ unionByName _)
  }

  /** Apply every rule's repair expression to its pattern-valid values
    * (invalid → NULL), leaving non-audited columns untouched.
    */
  def repair(df: DataFrame, rules: Seq[ValidationRule]): DataFrame =
    rules.foldLeft(df)((d, r) => d.withColumn(r.column,
      when(col(r.column).rlike(r.pattern), r.repair)))

  /** Re-validate after repair: true iff no invalid values remain. */
  def allValid(df: DataFrame, rules: Seq[ValidationRule]): Boolean =
    validate(df, rules)
      .filter(rules.map(r => col(r.flagCol) === Invalid).reduce(_ || _))
      .isEmpty
}
