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

  // several oracles equate byte-level with character-level text
  // semantics (m1: UTF-8 payload bytes vs ord() codepoints; x8 and the
  // substring oracles: Java UTF-16 substring vs DuckDB characters) —
  // sound ONLY while document text is pure ASCII. If the fixture ever
  // gains non-ASCII text this fails loudly instead of as a mysterious
  // oracle hash mismatch.
  Seq(sf0001, sf001).foreach { dir =>
    test(s"fixture guard: documents.text is pure ASCII ($dir)") {
      import org.apache.spark.sql.functions._
      val offenders = graft.core.Tables.documents(spark, dir)
        .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
        .count()
      assert(offenders == 0L,
        s"$offenders non-ASCII documents — byte-vs-char oracle equivalences (m1, x8) no longer hold")
    }
  }
}
