package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge table — the classic
  * link-authority signal of web-corpus curation (host-graph rank as a
  * document quality weight, the Common-Crawl recipe), expressed as
  * pure DataFrame supersteps like [[graft.dedup.Components]] rather
  * than a graph runtime.
  *
  * All arithmetic is LONG: ranks live in `scale`-quantized units and
  * every division is an integral `div`, so iteration k's rank vector
  * is a pure integer function of the edge set — bit-identical across
  * engines, partitionings, and merge orders (the [[Exact]] discipline
  * applied to an iterative algorithm; float PageRank sums in-edge
  * contributions in shuffle order and drifts). Truncation loses at
  * most 1 unit per in-edge per round — noise at `scale` ≥ 10⁶,
  * and identical noise everywhere.
  *
  * Per iteration: one equi join ranks⋈edges on src (contribution =
  * (85·r) div (100·outdeg), map-side after the join), one partial-
  * combined agg on dst, one left join back to the node list (no
  * in-edges ⇒ teleport base only). Only (node, long) pairs ever
  * shuffle; the iteration count is fixed (authority signals use 3–10
  * rounds), so no convergence probe jobs. Dangling-node mass (no
  * out-edges) is dropped, not redistributed — ranks are a relative
  * signal here, and the oracle states the same rule.
  */
object PageRank {

  /** @param edges      (srcCol, dstCol) rows; parallel edges each
    *                    carry a contribution (dedup upstream if not
    *                    wanted)
    * @param srcCol     source node column (integral)
    * @param dstCol     destination node column (integral)
    * @param iterations fixed superstep count (≥ 1)
    * @param scale      rank quantization (1.0 of total rank mass =
    *                    `scale` units)
    * @return (node, rank_q) — rank in `scale`-units after `iterations`
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    // 85·rank_q must stay inside a long: ranks never exceed `scale`
    require(scale >= 1000L && scale <= (Long.MaxValue / 100),
      s"scale out of the overflow-safe range: $scale")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // node count as a broadcast 1-row scalar (the crossJoin stats
    // idiom) — no driver action, the plan stays lazy
    val n = nodes.agg(count(lit(1)).as("__n"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val eDeg = e.join(outdeg, "src")
    val base = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        expr(s"(15 * ${scale}L) div (100 * __n)").as("__base"),
        expr(s"${scale}L div __n").as("rank_q"))
    val withBase = (1 to iterations).foldLeft(base) { (r, it) =>
      val contrib = eDeg
        .join(r.select(col("node").as("src"), col("rank_q")), "src")
        .select(col("dst"),
          expr("(85 * rank_q) div (100 * __deg)").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      val next = r.select(col("node"), col("__base"))
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"), col("__base"),
          (col("__base") + coalesce(col("__in"), lit(0L))).as("rank_q"))
      // lineage truncation (the Components pattern): unbroken, the plan
      // nests one join per superstep — at 20+ iterations analysis time
      // and failure-recovery recomputation grow with that depth. A
      // localCheckpoint every 4 supersteps bounds both; ranks are
      // (node, long) rows, so the checkpointed footprint is minimal.
      if (it % 4 == 0 && it < iterations) next.localCheckpoint() else next
    }
    withBase.select(col("node"), col("rank_q"))
  }
}
