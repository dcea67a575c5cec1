package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the RefinedWeb/CCNet curation step
  * that strips lines repeated verbatim across many documents (nav
  * menus, cookie banners, copyright footers) while leaving the
  * document's unique prose intact. Operates on an exploded
  * (doc, line_no, line) relation so callers choose the line
  * segmentation (real newlines in production; the Chunker's
  * stride==size token segments for the newline-free fixtures).
  *
  * Scale design: the census is one hash-partitioned groupBy over
  * distinct (doc, line) pairs — both stages partial-aggregate
  * map-side, so the shuffle carries (line, partial count), not rows.
  * The frequent-line set is tiny by construction (boilerplate is the
  * point: few distinct lines, many repeats), so the strip is a
  * BROADCAST anti-join — the corpus never reshuffles to be filtered.
  * Reassembly is the operator's one unavoidable doc-keyed shuffle;
  * line order is restored by array_sort on (line_no, line) structs
  * (index-ordered fold discipline — collect_list order is not
  * deterministic across partition layouts, the sort makes it so).
  */
object Boilerplate {

  /** (line, doc_freq): lines appearing in at least `minDocFreq`
    * DISTINCT documents, the corpus's boilerplate census.
    */
  def frequentLines(lines: DataFrame, docCol: String, lineCol: String,
                    minDocFreq: Long): DataFrame = {
    require(minDocFreq > 0, s"minDocFreq must be positive, got $minDocFreq")
    lines.select(col(docCol), col(lineCol)).distinct()
      .groupBy(col(lineCol))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
  }

  /** Documents reassembled ('\n'-joined, line order preserved) from
    * only the lines NOT in the frequent-line set. Documents whose
    * every line was boilerplate disappear from the output entirely
    * (the standard contract: nothing left worth training on).
    *
    * @param maxBroadcastLines guard on the "frequent set is tiny"
    *   assumption: `minDocFreq` is a caller dial, and a low threshold
    *   over a large corpus could push a supposed-boilerplate census
    *   past driver/broadcast memory. The census is fetched driver-side
    *   up to the cap in ONE action (that is what a broadcast would do
    *   anyway) and rejoined as a local relation; on overflow the strip
    *   falls back to a shuffle anti-join — same semantics, the census
    *   recomputes once in that rare path instead of OOMing the driver.
    */
  def stripFrequentLines(lines: DataFrame, docCol: String,
                         lineNoCol: String, lineCol: String,
                         minDocFreq: Long,
                         maxBroadcastLines: Int = 1000000): DataFrame = {
    val frequent = frequentLines(lines, docCol, lineCol, minDocFreq)
      .select(col(lineCol))
    val capped = frequent.limit(maxBroadcastLines + 1).collect()
    val joined =
      if (capped.length <= maxBroadcastLines) {
        val local = lines.sparkSession.createDataFrame(
          java.util.Arrays.asList(capped: _*), frequent.schema)
        lines.join(broadcast(local), Seq(lineCol), "left_anti")
      } else
        // overflow path: the anti-join would otherwise recompute the
        // census on every execution of the returned plan — persist it
        // so re-executions (and multi-action consumers) pay it once.
        // Cache ownership: the CALLER releases (clearCache once the
        // result is materialized) — the lazy result rules out an
        // in-operator unpersist, the simhashCandidates contract.
        lines.join(frequent.persist(), Seq(lineCol), "left_anti")
    joined
      .groupBy(col(docCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col(lineNoCol), col(lineCol)))),
          s => s(lineCol)),
        "\n").as("text"))
  }

  /** WITHIN-document line dedup: each document keeps the first
    * occurrence of every line, in original order — the intra-doc
    * sibling of [[stripFrequentLines]] (which removes lines frequent
    * ACROSS documents). Targets scraped pages that repeat their own
    * header/nav/footer blocks several times in one document.
    *
    * Scale shape: a compiled per-row pass over the text — zero
    * shuffles, no census, no join; the whole operator is map-side.
    * Typed `map`, not an `array_distinct`-over-`split` HOF chain:
    * `array_distinct` does preserve first-occurrence order but the
    * HOF pipeline runs interpreted per row (see shingleSets's measured
    * 10× note), while this is one compiled LinkedHashSet pass.
    */
  def dedupLinesWithinDoc(df: DataFrame, docCol: String,
                          textCol: String): DataFrame = {
    // row-encoded map: every column (docCol included, whatever its
    // type) passes through untouched — an earlier cast-to-long version
    // silently nulled non-numeric ids and dropped the other columns
    require(df.columns.contains(docCol), s"missing id column $docCol")
    val idx = df.schema.fieldIndex(textCol)
    require(df.schema(idx).dataType ==
      org.apache.spark.sql.types.StringType, s"$textCol must be string")
    df.map { row =>
      val out = row.toSeq.toArray
      if (!row.isNullAt(idx)) {
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        row.getString(idx).split("\n", -1).foreach(seen.add)
        out(idx) = seen.mkString("\n")
      }
      org.apache.spark.sql.Row.fromSeq(out.toIndexedSeq)
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }
}
