package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora at training-data
  * scale: shingling, MinHash signatures, LSH banding, candidate-pair
  * generation, exact n-gram Jaccard verification, and SimHash.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - shingling is a per-row projection (no shuffle);
  *  - MinHash signatures are ONE hash-partitioned aggregation over
  *    (doc, shingle) with map-side partial `min` combine — the classic
  *    shuffle-light formulation;
  *  - banding multiplies rows by `bands` (small constant) and the
  *    candidate join shuffles on band key, whose cardinality grows with
  *    the corpus so partitions stay balanced; AQE handles hot buckets;
  *  - exact Jaccard runs only on LSH candidates, never all pairs.
  *
  * Cross-engine discipline: hashes are md5 hex strings and "min" is
  * lexicographic string-min, so DuckDB reproduces every signature
  * byte-for-byte (a murmur/xxhash family would be engine-specific).
  * md5-as-minhash is slower per byte than murmur but stays exact across
  * engines; swap the hash family behind [[hashShingle]] for production.
  */
object TextDedup {

  val DefaultShingle = 3
  val NumHashes = 8
  val Bands = 4
  val RowsPerBand = 2
  require(Bands * RowsPerBand == NumHashes)

  /** (id, shingle) pairs; docs shorter than `k` tokens carry no
    * shingles and drop out (they can't near-dup at this n-gram size).
    *
    * Implementation note: this is a typed `flatMap`, not a
    * `transform(sequence(...))` higher-order expression. HOF lambdas
    * run interpreted (no codegen, no common-subexpression elimination),
    * so the `split` was re-evaluated per element_at per shingle —
    * measured ~10× slower than this compiled path at sf0.1. Token
    * split uses limit -1 to match Spark/DuckDB `split` semantics on
    * trailing separators.
    *
    * `distinct = false` skips the set-dedup shuffle — correct for
    * MinHash/LSH (min over a multiset equals min over its set), and at
    * corpus scale that shuffle is the single biggest cost of the
    * pipeline. Jaccard needs real sets: pass `distinct = true` there.
    *
    * `parallelism`: a single large input file arrives as few
    * partitions; shingling+hashing is the CPU-heavy stage, so
    * re-spreading the (tiny) doc rows before it is usually worth one
    * small shuffle. No-op when the input is already well-partitioned.
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
                  k: Int = DefaultShingle, distinct: Boolean = true,
                  parallelism: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = parallelism.map(df.repartition).getOrElse(df)
    // null text yields no shingles (crawl-scale norm; matches the SQL
    // oracle, where string_split(NULL) produces no rows) — without the
    // filter the compiled flatMap NPEs on the first null document
    val pairs = in.select(col(idCol).cast("long"), col(textCol))
      .filter(col(textCol).isNotNull)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < k) Iterator.empty
        else toks.sliding(k).map(w => (id, w.mkString(" ")))
      }
      .toDF(idCol, "shingle")
    if (distinct) pairs.distinct() else pairs
  }

  /** Universal-hash family over one md5-derived 32-bit base hash:
    * h_j(x) = (a_j * h(x) + b_j) mod P. One digest per shingle instead
    * of `numHashes` — 8× less hashing on the scan — and every term
    * stays below 2^63 (a_j < 2^31, h < 2^32) so the int64 arithmetic
    * is exact and overflow-free in any engine.
    */
  val HashP = 4294967311L // prime > 2^32
  val HashA: Seq[Long] = Seq(1000003L, 1200007L, 1400009L, 1600033L,
    1800017L, 2000003L, 2200013L, 2400007L)
  val HashB: Seq[Long] = Seq(12345L, 23456L, 34567L, 45678L,
    56789L, 67890L, 78901L, 89012L)

  private def baseHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 8), 16, 10).cast("long")

  /** MinHash signature: `numHashes` min-of-universal-hash long columns
    * `sig_0..sig_{n-1}` per id.
    */
  def minhashSignatures(shingles: DataFrame, idCol: String,
                        numHashes: Int = NumHashes): DataFrame = {
    val h = baseHash(col("shingle"))
    val aggs = (0 until numHashes).map(j =>
      min((lit(HashA(j)) * h + lit(HashB(j))) % lit(HashP)).as(s"sig_$j"))
    shingles.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (id, band_id, band_key) — docs agreeing on all rows
    * of any band share a band_key.
    */
  def bandKeys(sigs: DataFrame, idCol: String, bands: Int = Bands,
               rowsPerBand: Int = RowsPerBand): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val key = md5(concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}").cast("string")): _*))
      struct(lit(b).as("band_id"), key.as("band_key"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band_id"), col("bk.band_key"))
  }

  /** Persist an LSH band store — the dedup sibling of the ANN index's
    * saveIvfPq: (id, band_id, band_key) rows, band-partitioned so a
    * single-band probe prunes to one partition. The store feeds
    * [[graft.streaming.DocStream.nearDupAgainstStore]] (continuous
    * ingestion) and batch anti-dedup of new crawls without ever
    * re-shingling the historical corpus.
    */
  def saveBandStore(docs: DataFrame, idCol: String, textCol: String,
                    dir: String): Unit =
    bandKeys(minhashSignatures(
        shingleSets(docs, idCol, textCol, distinct = false), idCol), idCol)
      .write.mode("overwrite").partitionBy("band_id").parquet(dir)

  /** Append new documents' bands to a persisted store. Band keys are
    * pure row functions (no corpus-dependent training — unlike the ANN
    * quantizer there is nothing to freeze), so append ≡ rebuild over
    * the union BY CONSTRUCTION; the x15 gate states it anyway. Cost
    * O(new docs); the historical rows are never read.
    */
  def appendToBandStore(docs: DataFrame, idCol: String, textCol: String,
                        dir: String): Unit =
    bandKeys(minhashSignatures(
        shingleSets(docs, idCol, textCol, distinct = false), idCol), idCol)
      .write.mode("append").partitionBy("band_id").parquet(dir)

  def loadBandStore(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Pairwise join only inside buckets of at most this many members;
    * larger buckets switch to star pairing (see [[candidatePairs]]).
    * 32 members = 496 pairs, the break-even neighborhood where full
    * pairwise is still cheaper than the extra bucket-stats pass it
    * avoids; far below it, a duplicate-heavy crawl bucket (the
    * reference corpus has a ~96 k-copy key) would emit m²/2 ≈ 4.6 B
    * pairs from one bucket.
    */
  val DefaultBucketCap = 32

  /** Candidate pairs (a_id < b_id) sharing at least one band.
    *
    * Scale guard: a bucket of m near-identical docs would emit m(m-1)/2
    * pairs under a plain self-join — quadratic in the duplicate-cluster
    * size, the one cost AQE cannot rebalance away (it splits partitions,
    * it cannot reduce the pair count). Buckets larger than `bucketCap`
    * therefore emit STAR pairs only: every member against the bucket's
    * min-id representative (m-1 pairs). Downstream connected components
    * recover the full group transitively — (a,b) both pairing with rep r
    * lands a, b, r in one component exactly as the quadratic pair set
    * would — so dedup-group semantics are unchanged while the worst-case
    * pair count drops from O(m²) to O(m). Jaccard re-rank consumers see
    * rep–member pairs for giant clusters, which is the measurement that
    * matters (members of a capped bucket agree on the full signature
    * band, so rep–member similarity represents the cluster).
    *
    * The band table is cached before the joins: it is tiny (docs ×
    * bands rows) while its lineage — scan → shingle → minhash — is the
    * expensive part, and the two consumers would otherwise execute that
    * lineage twice. Bucket stats are one partial-combining aggregation
    * on the same (band_id, band_key) key the join shuffles on.
    */
  /** Containment-threshold admission against a FROZEN gram store: a
    * document is admitted only when STRICTLY fewer than `num/den` of
    * its distinct k-gram shingles already exist in the store — the
    * novelty criterion for growing a corpus incrementally (exact-fp
    * store-dedup drops only byte-copies; band-LSH drops whole-doc
    * near-dups; this rejects documents whose CONTENT is mostly
    * already known even when no single stored doc matches). Gram-less
    * docs (shorter than k) are admitted. The verdict is
    * cross-multiplied int64 — no float.
    *
    * Scale: the store arrives as grams (gram-keyed layout); probes
    * shuffle once by gram for the left join, once by doc for the
    * count — both partial-agg shapes. The store is never broadcast
    * and never rebuilt per probe batch.
    */
  def containmentAdmit(docs: DataFrame, idCol: String, textCol: String,
                       gramStore: DataFrame, k: Int = DefaultShingle,
                       num: Int = 1, den: Int = 2): DataFrame = {
    require(num > 0 && den > 0, s"threshold must be positive: $num/$den")
    val store = gramStore.select(col("shingle")).distinct()
      .withColumn("__known", lit(1L))
    val per = shingleSets(docs, idCol, textCol, k)
      .join(store, Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__known"), lit(0L))).as("__k"))
    docs.join(per, Seq(idCol), "left")
      .filter(col("__n").isNull || col("__k") * den < col("__n") * num)
      .drop("__n", "__k")
  }

  def candidatePairs(bands: DataFrame, idCol: String,
                     bucketCap: Int = DefaultBucketCap): DataFrame = {
    require(bucketCap >= 2, s"bucketCap=$bucketCap must be >= 2")
    // Bucket stats via ONE window pass, not a groupBy + join back: the
    // window's hash-partitioning on (band_id, band_key) is exactly the
    // self-join's key and survives the cache, so the annotated table
    // shuffles once and the joins below read co-partitioned cached
    // blocks (PlanSpec audits this). Alternatives measured on the
    // minhash_lsh bench: a stats-join formulation ~2× (it re-shuffled
    // the band table for the stats join, the small-side build, and
    // both self-join inputs); an adaptive eager-probe dispatch that
    // kept the uncapped plan for clean corpora was slower still (the
    // extra probe job cost more than the window's sort). The window's
    // sorted pass over the band table is the standing price of the
    // O(m) guarantee — ~0.3 s on the sf0.1 bench, constant-factor at
    // scale.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("band_id"), col("band_key"))
    // Cache ownership: the annotated band table is cached so both
    // self-join sides read the window's (band_id, band_key) hash
    // partitioning out of the cache (the plan audited below) — the
    // CALLER releases via spark.catalog.clearCache() once the pairs
    // are materialized (see simhashCandidates' ownership note: lazy
    // result ⇒ no in-operator unpersist; eager checkpoint would drop
    // the partitioning and re-shuffle the join).
    val annotated = bands
      .withColumn("__rep", min(col(idCol)).over(w))
      .withColumn("__bsz", count(lit(1)).over(w))
      .cache()
    val sm = annotated.filter(col("__bsz") <= bucketCap)
    val a = sm.select(col(idCol).as("a_id"), col("band_id"), col("band_key"))
    val b = sm.select(col(idCol).as("b_id"), col("band_id"), col("band_key"))
    val smallPairs = a.join(b, Seq("band_id", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    val starPairs = annotated
      .filter(col("__bsz") > bucketCap && col(idCol) =!= col("__rep"))
      .select(col("__rep").as("a_id"), col(idCol).as("b_id"))
    smallPairs.union(starPairs).distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B|, computed
    * from integer counts (cross-engine exact).
    */
  /** (a_id, b_id, n_inter, a_sz, b_sz) for candidate pairs — the
    * shared integer core of [[jaccard]] and [[jaccardHistogram]].
    */
  private def pairCounts(pairs: DataFrame, shingles: DataFrame,
                         idCol: String): DataFrame = {
    val sizes = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    pairs
      .join(shingles.withColumnRenamed(idCol, "a_id"), Seq("a_id"))
      .join(shingles.withColumnRenamed(idCol, "b_id"), Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed(idCol, "a_id")
        .withColumnRenamed("sz", "a_sz"), Seq("a_id"))
      .join(sizes.withColumnRenamed(idCol, "b_id")
        .withColumnRenamed("sz", "b_sz"), Seq("b_id"))
  }

  def jaccard(pairs: DataFrame, shingles: DataFrame, idCol: String): DataFrame =
    pairCounts(pairs, shingles, idCol)
      .select(col("a_id"), col("b_id"),
        (col("n_inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("n_inter")).cast("double")).as("jacc"))

  /** Candidate-pair Jaccard histogram — the LSH threshold-calibration
    * readout (how much of the candidate mass sits above a prospective
    * similarity cut). The bucket is INTEGER arithmetic end to end:
    * floor(buckets·|∩|/|∪|) computed as (|∩|·buckets) div |∪| on
    * exact int64 counts — never through the double ratio, where a
    * representation error at a bucket boundary could flip the floor.
    * A perfect pair (|∩|=|∪|) clamps into the top bucket.
    */
  def jaccardHistogram(pairs: DataFrame, shingles: DataFrame,
                       idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    pairCounts(pairs, shingles, idCol)
      .select(least(
        expr(s"(n_inter * $buckets) div (a_sz + b_sz - n_inter)"),
        lit(buckets - 1L)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
  }

  /** Directional containment for candidate pairs: C(a→b) = |A∩B|/|A|
    * and the reverse — the asymmetric sibling of [[jaccard]]. A short
    * doc quoted wholesale inside a long one has containment ≈ 1 in one
    * direction while Jaccard stays small (|A∪B| is dominated by the
    * long doc), so a Jaccard threshold alone never catches
    * quote/subsumption duplication. Same two-join shape and the same
    * cross-engine-exact integer-ratio arithmetic as [[jaccard]].
    */
  def containment(pairs: DataFrame, shingles: DataFrame,
                  idCol: String): DataFrame = {
    val sizes = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shingles.withColumnRenamed(idCol, "a_id"), Seq("a_id"))
      .join(shingles.withColumnRenamed(idCol, "b_id"), Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "a_id").withColumnRenamed("sz", "a_sz"), Seq("a_id"))
      .join(sizes.withColumnRenamed(idCol, "b_id").withColumnRenamed("sz", "b_sz"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("n_inter").cast("double") / col("a_sz").cast("double")).as("cont_a"),
        (col("n_inter").cast("double") / col("b_sz").cast("double")).as("cont_b"))
  }

  /** Corpus-level overlap estimation: one MinHash signature PER CORPUS
    * (min universal hash over the union of the corpus's shingles —
    * [[minhashSignatures]] grouped by the corpus tag instead of the doc
    * id), then estimated Jaccard between every corpus pair = the
    * fraction of agreeing signature slots. This is the dataset-audit
    * primitive (how much does crawl snapshot N overlap snapshot N-1?
    * train corpus vs eval suite?) that avoids the exact answer's
    * shingle-keyed self-join: each corpus reduces to `numHashes` longs
    * via one partial-combining aggregation, and the pairwise compare
    * is over #corpora rows — constant-size driver math at any corpus
    * size. `corpusCol` must be numeric ([[shingleSets]] casts the key
    * to long). For the exact answer at validation scale see
    * [[corpusJaccard]].
    */
  def corpusOverlap(shingles: DataFrame, corpusCol: String,
                    numHashes: Int = NumHashes): DataFrame = {
    val sigs = minhashSignatures(shingles, corpusCol, numHashes)
    val sigNames = (0 until numHashes).map(j => s"sig_$j")
    val a = sigs.select(col(corpusCol).as("corpus_a") +:
      sigNames.map(n => col(n).as(s"a_$n")): _*)
    val b = sigs.select(col(corpusCol).as("corpus_b") +:
      sigNames.map(n => col(n).as(s"b_$n")): _*)
    val agree = sigNames.map(n => (col(s"a_$n") === col(s"b_$n")).cast("int"))
      .reduce(_ + _)
    // #corpora² pairs — corpora are snapshots/splits, a handful; the
    // cross join is driver-trivial while the heavy lifting (signature
    // aggregation) already partially combined map-side
    a.crossJoin(b).filter(col("corpus_a") < col("corpus_b"))
      .select(col("corpus_a"), col("corpus_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
  }

  /** Exact corpus-pair Jaccard over distinct shingle sets: the
    * validation twin of [[corpusOverlap]]. The shingle-keyed self-join
    * shuffles the full vocabulary — fine at audit scale, the thing the
    * signature estimate exists to avoid at 100 TB.
    */
  def corpusJaccard(shingles: DataFrame, corpusCol: String): DataFrame = {
    val sz = shingles.groupBy(col(corpusCol)).agg(count(lit(1)).as("sz"))
    val inter = shingles.select(col(corpusCol).as("corpus_a"), col("shingle"))
      .join(shingles.select(col(corpusCol).as("corpus_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("corpus_a") < col("corpus_b"))
      .groupBy(col("corpus_a"), col("corpus_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sz.select(col(corpusCol).as("corpus_a"), col("sz").as("a_sz")), Seq("corpus_a"))
      .join(sz.select(col(corpusCol).as("corpus_b"), col("sz").as("b_sz")), Seq("corpus_b"))
      .select(col("corpus_a"), col("corpus_b"), col("n_inter"),
        (col("a_sz") + col("b_sz") - col("n_inter")).as("n_union"),
        (col("n_inter").cast("double") /
          (col("a_sz") + col("b_sz") - col("n_inter")).cast("double")).as("jacc"))
  }

  /** SimHash over whitespace tokens (all occurrences, so term frequency
    * weights naturally): `bits`-wide bit-vote on a 16-bit md5-derived
    * token hash, emitted as a bit string (msb first).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    val tokenized = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int"))
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"bit_$b"))
    val voted = tokenized.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val bitChars = ((bits - 1) to 0 by -1).map(b =>
      when(col(s"bit_$b") >= 0, "1").otherwise("0"))
    voted.select(col(idCol), concat(bitChars: _*).as("simhash"))
  }

  /** SimHash near-dup candidates with hamming distance ≤ `maxHamming`
    * via the pigeonhole principle: split the bit string into
    * `maxHamming + 1` bands — a pair within the distance budget agrees
    * exactly on at least one band, so an equi-join per band finds every
    * such pair (the exact hamming filter then removes band-collisions
    * that differ more). Same join-not-cross-product shape as MinHash
    * banding, so it scales the same way. `bits` must match the
    * `simhash(bits = …)` that produced the signatures and be divisible
    * by the band count.
    *
    * Cache ownership: the band table is cached (tiny: ids × bands) so
    * the self-join reuses the window's partitioning instead of
    * recomputing its lineage per side — the CALLER owns the release
    * (`spark.catalog.clearCache()` once the pairs are materialized;
    * the batch mains exit, the streaming faces clear per drain). An
    * in-operator unpersist is impossible because the result is lazy,
    * and an eager checkpoint would both discard the partitioning
    * (re-shuffling the self-join) and blind the PlanSpec audits.
    *
    * Downstream CC contract: with a finite `bucketCap`, route the
    * pairs through [[Components.connectedComponentsLogStar]], never
    * min-label — a capped bucket of DISTINCT hashes has empty run-
    * stars and its boundary edges form a sorted CHAIN; when sort-
    * adjacent hashes sit within `maxHamming` the chain survives the
    * filter, and min-label needs ~chain-length supersteps
    * (ComponentsSpec pins the pathology; m15 routes accordingly).
    */
  def simhashCandidates(sims: DataFrame, idCol: String,
                        maxHamming: Int = 1, bits: Int = 16,
                        bucketCap: Int = Int.MaxValue): DataFrame = {
    val nBands = maxHamming + 1
    require(bits % nBands == 0,
      s"bits=$bits must be divisible by maxHamming+1=$nBands bands")
    require(bucketCap >= 2, s"bucketCap must be >= 2, got $bucketCap")
    val width = bits / nBands
    val bandStructs = (0 until nBands).map(bnd =>
      struct(lit(bnd).as("band"),
        substring(col("simhash"), bnd * width + 1, width).as("key")))
    val banded = sims.select(col(idCol), col("simhash"),
      explode(array(bandStructs: _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.band"), col("b.key"))
      .cache()
    // Hamming distance via bit arithmetic, not per-bit substrings
    // (r17): the old spelling evaluated `bits` substring comparisons
    // per candidate pair — 64 string ops × every pair the bands emit
    // (a duplicate-heavy corpus emits hundreds of thousands) was the
    // dominant per-pair cost of the image/audio neardup bench entries.
    // Each side's bit string is parsed into ≤32-bit chunks (conv
    // returns a decimal STRING; a full 64-bit parse would overflow the
    // long cast when the top bit is set) and the distance is
    // Σ bit_count(aᵢ XOR bᵢ) — identical by definition: differing
    // substring positions ARE the set bits of the XOR.
    val hamming = (0 until bits by 32).map { off =>
      val len = math.min(32, bits - off)
      def chunk(c: Column): Column =
        conv(substring(c, off + 1, len), 2, 10).cast("long")
      bit_count(chunk(col("a_sim")).bitwiseXOR(chunk(col("b_sim"))))
    }.reduce(_ + _).cast("int")
    // Scale guard: a band bucket of m rows would emit m(m-1)/2 pairs —
    // quadratic in the duplicate cluster (measured: a 1028-member
    // 16-bit band bucket on the sf0.1 image corpus put the all-pairs
    // spelling at 72 s; capped it is ~3 s). Buckets past `bucketCap`
    // emit m−1 edges in a RUN-STAR + BOUNDARY topology over the
    // (hash, id) sort order: every member of an EQUAL-hash run links to
    // the run's min id (hamming 0 — always survives the filter, and the
    // run collapses at CC diameter 2, so a 1000-copy cluster never
    // needs 1000 min-label supersteps the way a naive sorted CHAIN
    // does), plus one edge between sort-adjacent members of DIFFERENT
    // hashes (the cross-run candidates a bucket-min rep-star provably
    // loses: the rep can be far from two members that are hamming-close
    // to each other). Cross-hash pairs separated in sort order inside
    // an oversized bucket are the documented recall trade for linear
    // output. The per-bucket window is the candidatePairs annotation
    // discipline — one (band, key) exchange, no stats-join re-shuffle —
    // and the default ∞ cap takes the original exact two-reference
    // self-join plan untouched (the x7 contract).
    val pairsRaw =
      if (bucketCap == Int.MaxValue) {
        val a = banded.select(col(idCol).as("a_id"), col("simhash").as("a_sim"),
          col("band"), col("key"))
        val b = banded.select(col(idCol).as("b_id"), col("simhash").as("b_sim"),
          col("band"), col("key"))
        a.join(b, Seq("band", "key"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("a_sim"), col("b_id"), col("b_sim"))
      } else {
        import org.apache.spark.sql.expressions.Window
        val byBucket = Window.partitionBy(col("band"), col("key"))
        val ordered = byBucket.orderBy(col("simhash"), col(idCol))
        val annotated = banded.withColumn("__c", count(lit(1)).over(byBucket))
        val small = annotated.filter(col("__c") <= bucketCap)
        val allPairs = small
          .select(col(idCol).as("a_id"), col("simhash").as("a_sim"),
            col("band"), col("key"))
          .join(small.select(col(idCol).as("b_id"), col("simhash").as("b_sim"),
            col("band"), col("key")), Seq("band", "key"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("a_sim"), col("b_id"), col("b_sim"))
        val byRun = Window.partitionBy(col("band"), col("key"), col("simhash"))
        val big = annotated.filter(col("__c") > bucketCap)
          .withColumn("__runmin", min(col(idCol)).over(byRun))
          .withColumn("__pid", lag(col(idCol), 1).over(ordered))
          .withColumn("__psim", lag(col("simhash"), 1).over(ordered))
        val runStar = big.filter(col(idCol) =!= col("__runmin"))
          .select(col("__runmin").as("a_id"), col("simhash").as("a_sim"),
            col(idCol).as("b_id"), col("simhash").as("b_sim"))
        val boundary = big
          .filter(col("__pid").isNotNull && col("__psim") =!= col("simhash"))
          .select(
            least(col("__pid"), col(idCol)).as("a_id"),
            when(col("__pid") < col(idCol), col("__psim"))
              .otherwise(col("simhash")).as("a_sim"),
            greatest(col("__pid"), col(idCol)).as("b_id"),
            when(col("__pid") < col(idCol), col("simhash"))
              .otherwise(col("__psim")).as("b_sim"))
        allPairs.unionByName(runStar).unionByName(boundary)
      }
    // filter BEFORE the distinct (r17): a pair's hamming is the same
    // value from whichever band it surfaced, so filter∘distinct ≡
    // distinct∘filter — but filtering first keeps every over-budget
    // collision out of the distinct's exchange (shuffle fewer bytes,
    // guide §2.3)
    pairsRaw
      .select(col("a_id"), col("b_id"), hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ------------------------------------------------------- DuckDB spellings

  object Sql {
    /** CTE producing distinct (id, shingle); 1-based list indexing. */
    def shingleSets(src: String, id: String, text: String,
                    k: Int = DefaultShingle): String = {
      val concat = (0 until k).map(j => s"t[i+$j]").mkString(" || ' ' || ")
      s"""(SELECT DISTINCT $id, $concat AS shingle
         | FROM (SELECT $id, string_split($text, ' ') AS t FROM $src) s
         | CROSS JOIN LATERAL unnest(generate_series(1, len(t) - ${k - 1})) AS u(i)
         | WHERE len(t) >= $k)""".stripMargin
    }

    def minhashAggs(numHashes: Int = NumHashes): String = {
      val h = "(('0x' || substr(md5(shingle), 1, 8))::BIGINT)"
      (0 until numHashes)
        .map(j => s"min((${HashA(j)} * $h + ${HashB(j)}) % $HashP) AS sig_$j")
        .mkString(", ")
    }

    def bandKeyExprs(bands: Int = Bands, rowsPerBand: Int = RowsPerBand): Seq[(Int, String)] =
      (0 until bands).map { b =>
        val cols = (0 until rowsPerBand)
          .map(r => s"CAST(sig_${b * rowsPerBand + r} AS VARCHAR)")
        b -> s"md5(${cols.mkString(" || '|' || ")})"
      }

    /** Star-capped candidate-pair CTEs over a `bands(doc_id, band_id,
      * band_key)` relation — byte-for-byte the [[candidatePairs]]
      * semantics: full pairwise inside buckets of ≤ `bucketCap`
      * members, rep–member star pairs above.
      */
    def pairsCtes(id: String, bucketCap: Int = DefaultBucketCap): String =
      s"""bstats AS (SELECT band_id, band_key, MIN($id) AS rep_id, COUNT(*) AS bsz
         |  FROM bands GROUP BY band_id, band_key),
         |pairs AS (SELECT DISTINCT a_id, b_id FROM (
         |  SELECT a.$id AS a_id, b.$id AS b_id
         |  FROM bands a
         |  JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
         |    AND a.$id < b.$id
         |  JOIN bstats s ON s.band_id = a.band_id AND s.band_key = a.band_key
         |  WHERE s.bsz <= $bucketCap
         |  UNION ALL
         |  SELECT s.rep_id AS a_id, m.$id AS b_id
         |  FROM bands m
         |  JOIN bstats s ON s.band_id = m.band_id AND s.band_key = m.band_key
         |  WHERE s.bsz > $bucketCap AND m.$id <> s.rep_id) u)""".stripMargin

    def simhashSql(src: String, id: String, text: String, bits: Int = 16): String = {
      val votes = (0 until bits)
        .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS bit_$b")
        .mkString(", ")
      val bitChars = ((bits - 1) to 0 by -1)
        .map(b => s"CASE WHEN bit_$b >= 0 THEN '1' ELSE '0' END").mkString(" || ")
      s"""(SELECT $id, $bitChars AS simhash FROM (
         |   SELECT $id, $votes FROM (
         |     SELECT $id, ('0x' || substr(md5(tok), 1, 4))::INT AS h
         |     FROM (SELECT $id, unnest(string_split($text, ' ')) AS tok FROM $src) tk) hh
         |   GROUP BY $id) v)""".stripMargin
    }
  }
}
