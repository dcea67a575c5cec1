package graft.operators

class PageRankSpec extends graft.SparkSpec {
  import spark.implicits._

  private val Scale = 1000000L

  /** Independent driver-side simulation of the identical integer
    * recurrence (Maps, not DataFrames) — the spec's oracle.
    */
  private def simulate(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (15L * Scale) / (100L * n)
    var r = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => (85L * r(s)) / (100L * out(s)) }.sum
      }
      r = nodes.map(nd => nd -> (base + in.getOrElse(nd, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("matches the integer recurrence on a 5-node graph, 1..4 iterations") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (2L, 4L))
    for (k <- 1 to 4) {
      assert(run(edges, k) == simulate(edges, k), s"iteration $k")
    }
  }

  test("lineage truncation at deep iteration counts changes nothing") {
    // 4, 5, 9, 12 straddle the every-4-supersteps localCheckpoint
    // cadence (4 = checkpoint is last step and skipped, 5 = one
    // checkpoint mid-fold, 12 = three); ranks stay bit-identical to
    // the driver-side recurrence through each
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (2L, 4L))
    for (k <- Seq(4, 5, 9, 12)) {
      assert(run(edges, k) == simulate(edges, k), s"iteration $k")
    }
  }

  test("star graph: the hub outranks every spoke") {
    val edges = (2L to 9L).map(s => (s, 1L)) ++ Seq((1L, 2L))
    val ranks = run(edges, 3)
    val hub = ranks(1L)
    assert((2L to 9L).forall(s => ranks(s) < hub),
      s"hub=$hub ranks=$ranks")
    assert(ranks == simulate(edges, 3))
  }

  test("sink node keeps teleport base when nothing links in") {
    // 1 -> 2; node 3 participates only as a source (3 -> 2)
    val edges = Seq((1L, 2L), (3L, 2L))
    val ranks = run(edges, 2)
    val base = (15L * Scale) / (100L * 3)
    assert(ranks(1L) == base)
    assert(ranks(3L) == base)
    assert(ranks == simulate(edges, 2))
  }

  test("rank mass never exceeds the scale (dangling mass only leaks out)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)) // 4 is dangling
    val ranks = run(edges, 3)
    assert(ranks.values.sum <= Scale)
    assert(ranks == simulate(edges, 3))
  }

  test("iterations must be positive") {
    intercept[IllegalArgumentException] {
      PageRank.ranks(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0)
    }
  }
}
