package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove (or score) training documents
  * that share verbatim n-grams with an evaluation/benchmark set, the
  * standard guard against test-set leakage in LLM training corpora
  * (GPT-3's 13-gram rule and its descendants).
  *
  * Scale design: the two sides are wildly asymmetric — the corpus is
  * the 100 TB side, the benchmark set is a few thousand documents. So
  * the eval n-gram set is collapsed to DISTINCT shingles and
  * BROADCAST; corpus shingles stream map-side through the broadcast
  * hash join and collapse into one per-doc partial-aggregated count.
  * Exactly one shuffle (the per-doc agg, keyed on doc id), nothing
  * quadratic, nothing driver-side. Shingling reuses
  * [[TextDedup.shingleSets]] (typed flatMap — compiled, not an
  * interpreted HOF lambda).
  *
  * Documents shorter than n tokens produce no n-grams: they cannot be
  * flagged (no row in the profile) and are always kept by
  * [[decontaminate]] — the same convention the n-gram rule itself
  * implies.
  */
object Decontam {

  /** Per-corpus-document contamination profile:
    * (idCol, ngrams, hits, contamination) where `ngrams` counts the
    * document's distinct n-grams, `hits` how many of those appear
    * anywhere in `eval`, and contamination = hits/ngrams (IEEE double:
    * one division of two exact int64s — engine-portable).
    *
    * @param maxBroadcastShingles guard on the "eval side is tiny"
    *   assumption (the same guard `Boilerplate.stripFrequentLines`
    *   carries): eval suites are a few thousand docs today, but an
    *   unguarded broadcast of a caller-supplied frame is how drivers
    *   OOM. The distinct eval shingles are fetched driver-side up to
    *   the cap in ONE action (what a broadcast would do anyway) and
    *   rejoined as a local relation; on overflow the profile falls
    *   back to a shuffle join — same semantics, the eval shingling
    *   recomputes once in that rare path instead of OOMing the driver.
    */
  def contaminationProfile(corpus: DataFrame, eval: DataFrame,
                           idCol: String, textCol: String, n: Int,
                           maxBroadcastShingles: Int = 2000000): DataFrame = {
    val corpusShingles = TextDedup.shingleSets(corpus, idCol, textCol, n)
    val evalShingles = TextDedup.shingleSets(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val capped = evalShingles.limit(maxBroadcastShingles + 1).collect()
    val evalSide =
      if (capped.length <= maxBroadcastShingles)
        broadcast(corpus.sparkSession.createDataFrame(
          java.util.Arrays.asList(capped: _*), evalShingles.schema))
      else evalShingles
    corpusShingles
      .join(evalSide.withColumn("__hit", lit(1L)), Seq("shingle"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .withColumn("contamination", col("hits") / col("ngrams"))
  }

  /** The corpus minus every document whose contamination exceeds
    * `maxHits` shared n-grams (default 0: any verbatim n-gram overlap
    * evicts). Anti-join on the flagged-id set — the corpus side never
    * carries shingles past the profile agg.
    */
  def decontaminate(corpus: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String, n: Int,
                    maxHits: Long = 0L,
                    maxBroadcastShingles: Int = 2000000): DataFrame = {
    val flagged = contaminationProfile(corpus, eval, idCol, textCol, n,
      maxBroadcastShingles)
      .filter(col("hits") > maxHits)
      .select(col(idCol))
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the
    * n-gram rule: the verbatim-overlap rule misses paraphrases, so
    * modern pipelines additionally flag training vectors whose cosine
    * against ANY eval-set embedding clears a threshold (the Phi-class
    * "fuzzy decontamination"). Returns the per-vector verdict frame
    * (idCol, max_cos, contaminated 0/1) — the dc1-style census; the
    * removal face is the same anti-join as [[decontaminate]].
    *
    * Exactness contract: cosine is the hn1 device — left-to-right
    * double dot products, the score ROUNDED to 6 dp on both engines,
    * the threshold applied to the rounded score, max over identical
    * doubles. Unembeddable vectors drop ([[Similarity.scorable]]).
    *
    * Scale shape: the eval side is tiny and BROADCAST (the corpus is
    * the 100 TB side); corpus rows stream map-side through the probe
    * cross and collapse into one per-id partial-aggregated max — one
    * shuffle, nothing quadratic in the corpus.
    */
  def semanticProfile(emb: DataFrame, probes: DataFrame,
                      idCol: String, vecCol: String,
                      tau: Double,
                      maxProbes: Int = 100000): DataFrame =
    semanticProfileWith(emb, preparedProbes(probes, vecCol, maxProbes),
      idCol, vecCol, tau)

  /** Validate + precompute the probe side ONCE: scorable filter,
    * per-probe norm (loop-invariant — computed per side, not per
    * (corpus row × probe) pair; identical IEEE operands, so the 6-dp
    * rounded score is unchanged), and the "eval side is tiny" guard —
    * the same hazard class as contaminationProfile's
    * maxBroadcastShingles: an unguarded broadcast of a caller-supplied
    * frame is how drivers OOM. Unlike the n-gram rule there is no
    * cheap shuffle fallback — scoring every corpus vector against a
    * LARGE probe set is inherently quadratic, and the right tool past
    * the cap is the ANN stack (IVF/LSH candidate paths), so this fails
    * FAST with that pointer instead of degrading into an accidental
    * cartesian. Exposed so a streaming fold validates once, not per
    * micro-batch.
    */
  private[graft] def preparedProbes(probes: DataFrame, vecCol: String,
                                    maxProbes: Int): DataFrame = {
    import graft.similarity.Similarity.{dot, scorable}
    val p = probes.filter(scorable(col(vecCol)))
      .select(col(vecCol).as("__p"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__pn"))
    val nProbes = p.limit(maxProbes + 1).count()
    require(nProbes <= maxProbes,
      s"semanticProfile: probe set exceeds maxProbes=$maxProbes — a " +
        "broadcast this size would OOM the driver; route a large eval " +
        "set through the ANN candidate paths (Similarity.ivfTopK / " +
        "lshTopK) instead of the exact cross product")
    p
  }

  /** The scoring plan over pre-validated probes: ONE corpus pass —
    * a LEFT-outer broadcast nested-loop join against the probe side
    * (condition `true`), so an EMPTY (or all-unscorable) probe set
    * keeps every scorable corpus vector in the census with a null
    * score (max_cos null, contaminated 0 — the n-gram profile's
    * left-outer convention: "clean corpus" and "no corpus scanned"
    * stay distinguishable) — then one per-id partial-combined max.
    * No second corpus scan, no corpus⇄corpus self-join.
    */
  private[graft] def semanticProfileWith(emb: DataFrame, p: DataFrame,
                                         idCol: String, vecCol: String,
                                         tau: Double): DataFrame = {
    import graft.similarity.Similarity.{dot, scorable}
    emb.filter(scorable(col(vecCol)))
      .select(col(idCol), col(vecCol),
        sqrt(dot(col(vecCol), col(vecCol))).as("__en"))
      .join(broadcast(p), lit(true), "left")
      .withColumn("__cos",
        round(dot(col(vecCol), col("__p"))
          / (col("__en") * col("__pn")), 6))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_cos"))
      .withColumn("contaminated",
        coalesce(col("max_cos") >= lit(tau), lit(false)).cast("long"))
  }

  /** IVF-ROUTED semantic decontamination — the scale path past
    * [[semanticProfile]]'s probe cap that its fail-fast message points
    * to (r15): instead of scoring every corpus vector against every
    * probe, the corpus is assigned ONCE to a frozen centroid table
    * (Lloyd-trained — the km1 induction keeps the whole route
    * SQL-replayable) and each probe scores only the vectors in its
    * `nProbe` nearest cells. Cost: corpus × nProbe/nCells scored pairs
    * instead of corpus × probes — the probe set can now be
    * benchmark-sized. The trade is bounded recall (a contaminated
    * vector hiding outside every probed cell is missed — near-dup
    * probes assign next to their sources, which is exactly the case
    * that matters); the exact [[semanticProfile]] stays the reference
    * for cap-sized eval sets.
    *
    * Census preservation: the ASSIGNED corpus left-joins the scores,
    * so unprobed cells and empty probe sets yield (max_cos null,
    * contaminated 0) — dc3's convention, and the dc4 oracle replays
    * it. Probes carry their own id column (`probeIdCol`) — per-probe
    * cell ranking needs an identity, and real eval sets have one.
    *
    * Scale shape: one broadcast of k centroids for assignment, one
    * probes×k ranking (tiny), one equi-join on the cell key with the
    * probe side broadcast, one per-id partial-combined max.
    */
  def semanticProfileIvf(emb: DataFrame, probes: DataFrame,
                         idCol: String, vecCol: String, tau: Double,
                         centroids: DataFrame, nProbe: Int,
                         probeIdCol: String = "probe_id"): DataFrame = {
    import graft.similarity.Similarity.{dot, scorable}
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val assigned = graft.similarity.Similarity.assignToCentroids(
      emb, idCol, vecCol, centroids)
    val p = probes.filter(scorable(col(vecCol)))
      .select(col(probeIdCol).as("__pid"), col(vecCol).as("__p"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__pn"))
    // probe→cell selection: the ivfTopKIndexed rule (rounded distance,
    // cell tiebreak) so the probed-cell set is cross-engine exact
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("__d"), col("cell"))
    val probeCells = p.crossJoin(broadcast(centroids))
      .withColumn("__d", round(dot(col("centroid"), col("centroid"))
        - lit(2.0) * dot(col("__p"), col("centroid")), 6))
      .withColumn("__pr", row_number().over(w))
      .filter(col("__pr") <= nProbe)
      .select(col("__pid"), col("__p"), col("__pn"), col("cell"))
    val scored = assigned
      .join(broadcast(probeCells), Seq("cell"))
      .withColumn("__cos",
        round(dot(col(vecCol), col("__p"))
          / (sqrt(dot(col(vecCol), col(vecCol))) * col("__pn")), 6))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("max_cos"))
    assigned.select(col(idCol), col("cell"))
      .join(scored, Seq(idCol), "left")
      .withColumn("contaminated",
        coalesce(col("max_cos") >= lit(tau), lit(false)).cast("long"))
  }
}
