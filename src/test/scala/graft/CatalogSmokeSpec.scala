package graft

/** Every catalog query must run at sf0.001 too — the driver smoke only
  * exercises `entry`, and tiny data exposes empty-candidate /
  * empty-group edge cases the sf0.01 verify can't.
  */
class CatalogSmokeSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      df.count() // must execute without throwing; empty results are fine
      spark.catalog.clearCache()
    }
  }
}
