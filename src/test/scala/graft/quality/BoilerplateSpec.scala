package graft.quality

class BoilerplateSpec extends graft.SparkSpec {
  import spark.implicits._

  // three docs; "footer" appears in all three, "menu" in two,
  // unique prose once each; doc 3 is pure boilerplate
  private def lines = Seq(
    (1L, 0L, "alpha beta"), (1L, 1L, "menu"), (1L, 2L, "footer"),
    (2L, 0L, "gamma delta"), (2L, 1L, "menu"), (2L, 2L, "footer"),
    (3L, 0L, "footer")
  ).toDF("doc_id", "line_no", "line")

  test("census counts distinct documents, not occurrences") {
    val dupd = lines.union(lines) // every line delivered twice
    val freq = Boilerplate.frequentLines(dupd, "doc_id", "line", 2L)
      .as[(String, Long)].collect().toMap
    assert(freq == Map("footer" -> 3L, "menu" -> 2L))
  }

  test("strip removes frequent lines, keeps order, drops empty docs") {
    val out = Boilerplate
      .stripFrequentLines(lines, "doc_id", "line_no", "line", 2L)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "alpha beta", 2L -> "gamma delta"))
    // doc 3 (all boilerplate) is gone entirely
    assert(!out.contains(3L))
  }

  test("threshold above every frequency reassembles documents verbatim") {
    val out = Boilerplate
      .stripFrequentLines(lines, "doc_id", "line_no", "line", 99L)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta\nmenu\nfooter")
    assert(out(3L) == "footer")
  }

  test("reassembly is invariant to input partition layout") {
    val a = Boilerplate
      .stripFrequentLines(lines, "doc_id", "line_no", "line", 2L)
      .orderBy("doc_id").collect().toSeq
    val b = Boilerplate
      .stripFrequentLines(lines.repartition(7), "doc_id", "line_no", "line", 2L)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("strip filters via a broadcast anti-join (corpus never reshuffles to be filtered)") {
    val docs = graft.core.Tables.documents(spark, sf001)
      .select($"doc_id", $"text")
    val segs = graft.operators.Chunker
      .chunkByTokens(docs, "doc_id", "text", 16, 16)
      .select($"doc_id", $"chunk_id".as("line_no"), $"chunk_text".as("line"))
    // string audit: AdaptiveSparkPlanExec hides the physical tree from
    // TreeNode.collect, but prints it
    val plan = Boilerplate
      .stripFrequentLines(segs, "doc_id", "line_no", "line", 5L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("within-doc dedup keeps first occurrences in order, map-side only") {
    val docs = Seq(
      (1L, "nav menu\nreal prose here\nnav menu\nmore prose\nreal prose here"),
      (2L, "only line"),
      (3L, "a\na\na"),
      (4L, "")).toDF("doc_id", "text")
    val out = Boilerplate.dedupLinesWithinDoc(docs, "doc_id", "text")
    val got = out.orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "nav menu\nreal prose here\nmore prose"),
      (2L, "only line"),
      (3L, "a"),
      (4L, "")))
    // zero shuffles: no Exchange anywhere in the executed plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
