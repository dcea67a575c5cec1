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

  // sq1_funnel's oracle rewrites the subsequence test as
  // LIKE '%signup%click%purchase%' over a joined path string — sound
  // ONLY while no event type is a substring of another (e.g. a future
  // 'clicked' type would silently false-positive 'click')
  Seq(sf0001, sf001).foreach { dir =>
    test(s"fixture guard: event types are substring-disjoint ($dir)") {
      val types = graft.core.Tables.events(spark, dir)
        .select("event_type").distinct()
        .collect().map(_.getString(0)).filter(_ != null)
      val clashes = for {
        a <- types; b <- types if a != b && b.contains(a)
      } yield s"'$a' ⊂ '$b'"
      assert(clashes.isEmpty,
        s"substring-overlapping event types break sq1's LIKE oracle: ${clashes.mkString(", ")}")
    }
  }

  // fz1/a15 compare customer names/segments character-wise across
  // engines — same ASCII requirement as documents.text
  Seq(sf0001, sf001).foreach { dir =>
    test(s"fixture guard: customer.c_name is pure ASCII ($dir)") {
      import org.apache.spark.sql.functions._
      val offenders = graft.core.Tables.customer(spark, dir)
        .filter(not(col("c_name").rlike("^[\\x00-\\x7F]*$")))
        .count()
      assert(offenders == 0L,
        s"$offenders non-ASCII customer names — levenshtein char semantics may diverge (fz1)")
    }
  }
}
