package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] = {
    val p = pairs.toDF("a_id", "b_id")
    val n = nodes.toDF("id")
    Components.connectedComponents(p, n, "id")
      .as[(Long, Long)].collect().toMap
  }

  test("chain collapses to its minimum (multi-superstep propagation)") {
    // 5-4-3-2-1 needs label 1 to travel 4 hops
    val comps = cc(Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)), (1L to 5L))
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate clusters keep separate labels; singletons label themselves") {
    val comps = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq(1L, 2L, 3L, 10L, 11L, 99L))
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("matches brute-force transitive closure on a random-ish graph") {
    // deterministic pseudo-random edges over 30 nodes
    val nodes = (0L until 30L)
    val edges = nodes.flatMap(i => if ((i * 7 + 3) % 5 == 0) Seq((i, (i * 13 + 7) % 30)) else Nil)
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    // brute force: union-find on the driver
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = nodes.map(n => n -> find(n)).toMap
    assert(cc(edges, nodes) == expected)
  }

  private def ccLog(pairs: Seq[(Long, Long)], nodes: Seq[Long], maxIter: Int = 20): Map[Long, Long] = {
    val p = pairs.toDF("a_id", "b_id")
    val n = nodes.toDF("id")
    Components.connectedComponentsLogStar(p, n, "id", maxIter = maxIter)
      .as[(Long, Long)].collect().toMap
  }

  test("log-star variant agrees with min-label on chains, clusters, singletons") {
    val pairs = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L), (10L, 11L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 99L)
    assert(ccLog(pairs, nodes) == cc(pairs, nodes))
  }

  test("log-star variant matches brute force on the random-ish graph") {
    val nodes = (0L until 30L)
    val edges = nodes.flatMap(i => if ((i * 7 + 3) % 5 == 0) Seq((i, (i * 13 + 7) % 30)) else Nil)
      .filter { case (a, b) => a != b }
    assert(ccLog(edges, nodes) == cc(edges, nodes))
  }

  test("log-star converges on a 120-node chain within O(log n) rounds where min-label cannot") {
    // a path 0-1-2-…-119 has diameter 119: min-label needs ~119
    // supersteps; log-star must land well inside 12 rounds
    val nodes = (0L until 120L)
    val chain = (0L until 119L).map(i => (i, i + 1))
    val got = ccLog(chain, nodes, maxIter = 12)
    assert(got == nodes.map(_ -> 0L).toMap)
    // and min-label with the same tiny budget fails loudly (the property
    // that motivates the variant)
    intercept[IllegalArgumentException] {
      val p = chain.toDF("a_id", "b_id")
      Components.connectedComponents(p, nodes.toDF("id"), "id", maxIter = 12)
        .collect()
    }
  }

  test("representatives keeps exactly the component minima") {
    val p = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val n = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val comps = Components.connectedComponents(p, n, "doc_id")
    val reps = Components.representatives(comps, "doc_id").as[Long].collect().toSet
    assert(reps == Set(1L, 10L, 99L))
  }

  test("non-convergence within maxIter fails loudly") {
    val p = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)).toDF("a_id", "b_id")
    val n = (1L to 5L).toDF("id")
    assertThrows[IllegalArgumentException] {
      Components.connectedComponents(p, n, "id", maxIter = 2)
    }
  }

  test("incremental update equals from-scratch, incl. component merges") {
    // day 0: {1,2}, {3,4}, {5,6}, singleton 7..9
    val day0 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val nodes0 = (1L to 9L).toDF("id")
    val existing = Components.connectedComponentsLogStar(day0, nodes0, "id")
    // day 1: merge {1,2}+{3,4} via 2-3, grow {5,6} with 10, link
    // singletons 7-8, and a brand-new isolated pair 11-12
    val day1 = Seq((2L, 3L), (6L, 10L), (7L, 8L), (11L, 12L))
      .toDF("a_id", "b_id")
    val nodes1 = Seq(10L, 11L, 12L).toDF("id")
    val inc = Components.incrementalComponents(existing, day1, nodes1, "id")
      .as[(Long, Long)].collect().toMap
    val scratch = Components.connectedComponentsLogStar(
        day0.union(day1), nodes0.union(nodes1), "id")
      .as[(Long, Long)].collect().toMap
    assert(inc == scratch)
    assert(inc(4L) == 1L, "merged component takes the global min label")
    assert(inc(10L) == 5L && inc(9L) == 9L && inc(12L) == 11L)
  }

  test("qualityReps keeps the best-quality member, not the min id") {
    // comp 1: member 1 (worst quality, lowest id), member 2 (best),
    // member 3 (middle). comp 10: quality tie -> lowest id wins.
    // comp 99: singleton keeps itself.
    val scored = Seq(
      (1L, 1L, 0.2), (2L, 1L, 0.9), (3L, 1L, 0.5),
      (10L, 10L, 0.7), (11L, 10L, 0.7),
      (99L, 99L, 0.1)
    ).toDF("doc_id", "comp", "quality")
    val out = Components.qualityReps(scored, "doc_id")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((3L, 2L, 0.9)), "argmax quality beats min id")
    assert(out(10L) == ((2L, 10L, 0.7)), "tie broken by lowest id")
    assert(out(99L) == ((1L, 99L, 0.1)))
  }

  test("cluster split: near-duplicates can never cross the train/eval boundary") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions._
    // docs 1/2 are near-dups (one token changed), 3/4 near-dups, 5 distinct
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again through the quiet field at dawn with no one watching it run"
    val docs = Seq(
      (1L, base), (2L, base.replace("dawn", "dusk")),
      (3L, base.replace("fox", "cat").replace("dog", "bird")),
      (4L, base.replace("fox", "cat").replace("dog", "bird")
        .replace("quiet", "windy")),
      (5L, (0 until 25).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = TextDedup.candidatePairs(
      TextDedup.bandKeys(
        TextDedup.minhashSignatures(
          TextDedup.shingleSets(docs, "doc_id", "text"), "doc_id"),
        "doc_id"),
      "doc_id")
    val comps = Components.connectedComponents(pairs, docs, "doc_id")
    val split = comps.withColumn("split",
      when(Sampling.hashGate(col("comp"), 0.8), "train").otherwise("eval"))
    // the clusters actually formed (else the test proves nothing)
    val byComp = split.as[(Long, Long, String)].collect()
      .groupBy(_._2).values.toSeq
    assert(byComp.exists(_.length >= 2), "expected at least one real cluster")
    // invariant: one split per component
    for (members <- byComp)
      assert(members.map(_._3).distinct.length == 1,
        s"component split leak: $members")
    // deterministic under repartitioning
    val again = Components.connectedComponents(pairs, docs.repartition(7), "doc_id")
      .withColumn("split",
        when(Sampling.hashGate(col("comp"), 0.8), "train").otherwise("eval"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(again == split.as[(Long, Long, String)].collect().sortBy(_._1).toSeq)
  }
}
