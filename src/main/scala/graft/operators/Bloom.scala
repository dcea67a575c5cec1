package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.{ColumnBridge, SessionBridge}
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership pre-filtering — the 100 TB face of
  * "dedup against a historical store" when the store itself is too
  * large to broadcast as exact fingerprints.
  *
  * The streaming/batch store-dedup ops (DocStream.dedupAgainstStore,
  * the dc* decontamination family) broadcast the EXACT key set, which
  * is right while the store fits an executor. A year of crawl history
  * is billions of fingerprints — but a bloom filter of 10⁹ keys at 1%
  * false-positive rate is ~1.2 GB, and at 10⁸ keys ~120 MB: compact
  * enough to ship to every task where the exact set is not. The probe
  * is a map-side codegen'd expression; only bloom-POSITIVE rows (true
  * duplicates + fpp of the clean corpus) continue into the exact
  * recheck join, so the anti-join's shuffle shrinks from |corpus| to
  * |dups| + fpp·|corpus| rows. Bloom negatives are DEFINITELY absent
  * from the store (no false negatives), so rows skipping the recheck
  * are provably clean and the final result is byte-identical to the
  * plain anti-join — which is exactly how the bf1 gate oracles it.
  *
  * Spark-first plumbing: the filter is built with Catalyst's own
  * `BloomFilterAggregate` and probed with `BloomFilterMightContain` —
  * the same putLong(xxhash64(key)) scheme, and the same expression
  * pair, that Spark's runtime shuffle-join bloom filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) inject for
  * selective inner/semi joins. Spark will NOT inject them for an
  * ANTI join (a pre-filter on the anti side would drop the rows the
  * join exists to keep), which is why store-dedup needs this explicit
  * operator: the bloom predicate splits the corpus into a keep-as-is
  * branch and a recheck branch instead of filtering the join input.
  *
  * Cost shape: the corpus scan happens twice (once per branch, each
  * with the complementary probe right above the columnar scan). At
  * scale that is 2× read IO in exchange for ~99% less anti-join
  * shuffle — the standard trade; callers that already have the corpus
  * pinned in memory pay the probe twice and nothing else.
  */
object Bloom {

  /** Serialized bloom filter over `key`, built distributed (partial
    * filters merge associatively in the aggregate buffer) and
    * collected as ONE binary blob — the only driver-side object, with
    * a fail-fast size guard in the spirit of Boilerplate's census cap.
    * Returns None for an empty relation (nothing to filter against).
    */
  def buildBytes(store: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.01,
                 maxFilterBytes: Long = 256L << 20): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems=$expectedItems must be > 0")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp must be in (0, 1)")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val bytes = numBits / 8
    require(bytes <= maxFilterBytes,
      s"bloom filter would be $bytes bytes for expectedItems=$expectedItems" +
        s" fpp=$fpp, over the $maxFilterBytes cap — raise fpp, shard the" +
        " store, or raise maxFilterBytes deliberately")
    val hashed = ColumnBridge.toExpr(xxhash64(key))
    val agg = new BloomFilterAggregate(hashed, Literal(expectedItems),
      Literal(numBits)).toAggregateExpression()
    // BloomFilterAggregate Math.min's the requested numItems/numBits
    // against the RUNTIME-join bloom confs (defaults: 4M items, 8 MB) —
    // sized for injected join filters, not a 10⁸–10⁹-key store. Without
    // lifting them the build silently clamps, fpp degrades toward 1,
    // and the prefilter stops pruning (still correct, uselessly). Lift
    // them in a DERIVED session (newSession: shared SparkContext,
    // isolated conf) and run the build there — the caller's session
    // conf is never mutated, so concurrent queries keep the intended
    // bounds for injected join filters and concurrent builds can't
    // interleave a set/restore race.
    val buildSession = store.sparkSession.newSession()
    Seq("spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
      .foreach { case (k, v) =>
        if (buildSession.conf.getOption(k).forall(_.toLong < v))
          buildSession.conf.set(k, v.toString)
      }
    Option(SessionBridge.inSession(store, buildSession)
      .select(ColumnBridge.toColumn(agg).as("bf"))
      .head.getAs[Array[Byte]](0))
  }

  /** Codegen'd map-side probe: true iff `key` MIGHT be in the filter
    * (false ⇒ definitely absent).
    */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.toColumn(BloomFilterMightContain(
      Literal.create(filter, BinaryType),
      ColumnBridge.toExpr(xxhash64(key))))

  /** Corpus rows whose `keyCol` is NOT present in `store`'s `storeKey`
    * column — semantically the plain left-anti join, executed as
    * bloom-negative pass-through ∪ exact recheck of bloom positives.
    *
    * `expectedItems` sizes the filter: an UNDERestimate degrades fpp
    * (more recheck traffic, never wrong answers); use the store's
    * row-count order of magnitude.
    */
  def antiJoinWithBloom(corpus: DataFrame, keyCol: String,
                        store: DataFrame, storeKey: String,
                        expectedItems: Long, fpp: Double = 0.01,
                        maxFilterBytes: Long = 256L << 20): DataFrame =
    buildBytes(store, col(storeKey), expectedItems, fpp, maxFilterBytes) match {
      case None => corpus // empty store: nothing is a duplicate
      case Some(bf) =>
        val probe = mightContain(bf, col(keyCol))
        val clean = corpus.filter(!probe)
        val survivors = corpus.filter(probe)
          .join(store.select(col(storeKey).as(keyCol)), Seq(keyCol), "left_anti")
        clean.unionByName(survivors)
    }
}
