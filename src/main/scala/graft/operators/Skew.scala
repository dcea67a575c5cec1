package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join splitting covers joins at
  * runtime; for *aggregations* over hot keys the classic fix is
  * salting: spread each key over `salts` sub-keys, partially aggregate,
  * then combine. Valid for algebraic aggregates (sum/count/min/max) —
  * the two-phase rewrite is exact, and with decimal sums it is also
  * bit-exact (associative), so salted and unsalted plans hash-match.
  *
  * At 100 TB: use when one group key holds a disproportionate share of
  * rows (e.g. a null-bucket or a bot user-id) and the partial-agg
  * map-side combine alone can't flatten it — salting moves the hot
  * key's reduction work onto `salts` reducers.
  */
object Skew {

  final case class SaltedAgg(partial: Seq[Column], combine: Seq[Column])

  /** Salted count+sum aggregate: exact same result as
    * `df.groupBy(keys).agg(count, dsum(col))` for any salt count.
    *
    * The salt is a deterministic hash of the whole row — NOT
    * `monotonically_increasing_id`/`rand`, which change on task retry
    * and silently lose or double-count rows when a reducer has already
    * consumed the old assignment (the nondeterministic-repartition
    * bug). Trade-off: byte-identical duplicate rows share a salt; hot
    * keys whose rows differ in any other column (the normal case)
    * spread evenly.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCol: String,
                     salts: Int = 16): DataFrame = {
    require(!df.columns.contains("__salt"),
      "input already has a __salt column; rename it before saltedCountSum")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(Exact.dec(col(sumCol))).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__cnt")).as("cnt"),
        sum(col("__sum")).cast("double").as(s"sum_$sumCol"))
  }

  /** Salted equi-join: byte-identical to `fact.join(dim, keys,
    * joinType)` for any salt count, with the fact side's hot keys
    * spread over `salts` reducers.
    *
    * When to reach for it (AQE's skew-join split covers the common
    * case at runtime): AQE can only split a skewed SORT-MERGE partition
    * whose rows it can re-route; it cannot help when the hot key's
    * rows must still meet ONE reducer's sort buffer first at the
    * memory cliff, and it does nothing for joins it already planned
    * differently. Static salting moves the decision to plan time:
    * every fact row takes a deterministic row-hash salt, every dim row
    * is replicated once per salt value, and the join key becomes
    * (keys, salt) — the hot key's rows land on `salts` distinct
    * reducers by construction. Price: the dim side ships `salts`×
    * (explode before the exchange), so this fits the mid-size dim that
    * is too big to broadcast but cheap to replicate — exactly the gap
    * between broadcast joins and AQE-rescued sort-merge.
    *
    * Fact-preserving join types only (`inner`, `left`): a right/full
    * join would see the dim replicas as `salts` unmatched copies.
    * Same retry-safe salt discipline as [[saltedCountSum]]: the salt
    * is a function of the row, never `rand()`.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts=$salts must be >= 1")
    require(Set("inner", "left", "left_outer")(joinType),
      s"joinType=$joinType is not fact-preserving; use inner/left")
    // withColumn would silently REPLACE a caller's __salt column and
    // then drop it — corrupting parity with the plain join
    require(!(fact.columns ++ dim.columns).contains("__salt"),
      "input already has a __salt column; rename it before saltedJoin")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, keys :+ "__salt", joinType).drop("__salt")
  }
}
