package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling (SURVEY.md §2.11 R1's
  * scale-path sibling). `df.sample(seed)` is reproducible only within
  * one engine AND one partitioning — at 100 TB a repartition or an AQE
  * re-plan silently changes which rows a seeded RNG sample keeps.
  * Hash-gating on a stable key has none of that: the keep/drop decision
  * is a pure per-row function, so it survives repartitioning, retries,
  * and engine swaps, and the same expression doubles as a consistent
  * train/holdout splitter (disjoint fractions never overlap).
  */
object Sampling {

  /** Lowercase 8-hex-digit threshold for `fraction` of the 32-bit
    * md5-prefix space — shared with the DuckDB oracle so both engines
    * gate on the identical constant.
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val t = math.round(fraction * (1L << 32)).min((1L << 32) - 1)
    f"$t%08x"
  }

  /** The string actually compared against the md5 prefix. fraction=1.0
    * cannot be expressed as a hex threshold under strict `<` — clamping
    * to "ffffffff" would silently drop any row whose prefix is exactly
    * ffffffff (expected dozens of rows at 100 TB). "g" sorts after
    * every hex digit, so `prefix < 'g'` keeps ALL rows — same trick in
    * the SQL oracles, which must use this exact token.
    */
  def thresholdToken(fraction: Double): String =
    if (fraction >= 1.0) "g" else thresholdHex(fraction)

  /** Keep rows whose md5(key) 32-bit hex prefix < fraction * 2^32. */
  def hashGate(key: Column, fraction: Double): Column =
    substring(md5(key.cast("string")), 1, 8) < lit(thresholdToken(fraction))

  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashGate(col(keyCol), fraction))

  /** Stratified variant (the `sampleBy` shape, made deterministic):
    * per-stratum keep fractions, strata not listed keep `default`.
    * Still one codegen'd projection+filter over the scan — no
    * per-stratum passes, no driver-side stratum discovery.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           default: Double = 0.0): DataFrame = {
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(thresholdToken(default))) { case (acc, (s, f)) =>
      when(col(strataCol) === s, lit(thresholdToken(f))).otherwise(acc)
    }
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 8) < threshold)
  }

  /** Epoch-weighted corpus mixing — the data-mixing step of LLM
    * training recipes where per-source weights EXCEED 1 (repeat a rare
    * high-quality source 2.3×) as well as downsample (0.5×). A row in
    * stratum with weight w appears once per full epoch 0..floor(w)-1
    * unconditionally, plus in epoch floor(w) iff the fractional hash
    * gate keeps it; the gate key is salted with the epoch number so the
    * fractional pass is an independent subsample, not a rescan of the
    * same rows. Output = input columns + `epoch` (long); (key, epoch)
    * is unique, making the repeat structure explicit for the shard
    * writer downstream.
    *
    * Scale shape: per-stratum constants fold into two when-chains, the
    * fan-out is a generate (explode of a ≤ ceil(max w)-element
    * sequence) in the same codegen'd stage — no shuffle, no
    * per-stratum passes, deterministic under repartitioning (pure
    * function of the row).
    */
  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: keep
    * the `k` rows with the largest `u^(1/w)` — equivalently the
    * largest `ln(u)/w` — where `u` is a uniform draw per row. The
    * data-mixing primitive for "sample 10M docs proportional to
    * quality weight" in ONE distributed pass, no per-stratum loops, no
    * replacement bookkeeping.
    *
    * Determinism discipline (same as [[hashGate]]): `u` is md5-derived
    * from (id, seed), not an RNG — the sample is a pure function of
    * the data, invariant to partitioning, retries, and engine. The
    * rank key is ROUNDED to 6 dp with the id as tiebreak (the
    * float-rank oracle rule: ln may differ in the last ulp across
    * libm implementations; at 6 dp the boundary probability is
    * negligible and ties order identically both engines).
    *
    * Scale shape: the sort+limit plans as TakeOrderedAndProject — k
    * rows per partition cross the wire, never the corpus. Rows with
    * non-positive weight are excluded (zero weight = never sampled).
    */
  /** The Efraimidis–Spirakis rank key, floor-quantized to 1e-6:
    * floor(ln(u)/w · 1e6 + 1e-4) / 1e6 with
    * u = (60-bit md5 prefix + 0.5) / 2^60 ∈ (0,1). 2^60 is exactly
    * representable as a double, and decimal-string→double (Spark conv)
    * and int→double (DuckDB) both round to the same nearest double, so
    * u is bit-identical cross-engine. The t9 NUDGED FLOOR (not a
    * decimal round — the round-9 t13 lesson: never round a raw
    * transcendental) absorbs ln's last-ulp libm skew: a flip needs the
    * true value within ~1e-10 quantized units of boundary−1e-4, where
    * round(…, 6) flips whenever ln lands ulp-close to the half
    * boundary. The id tiebreak keeps ordering deterministic under the
    * ≤1e-6 quantization ties. Shared by the batch draws and the
    * streaming face (stream ≡ batch because the key is a pure row
    * function).
    */
  private[graft] def esKey(id: Column, weight: Column,
                           seed: String): Column = {
    val h = conv(substring(md5(concat(id.cast("string"),
      lit("#" + seed))), 1, 15), 16, 10).cast("double")
    floor(log((h + 0.5) / 1152921504606846976.0) / weight * lit(1e6)
      + lit(1e-4)).cast("double") / lit(1e6)
  }

  def weightedTopK(df: DataFrame, idCol: String, weightCol: String, k: Int,
                   seed: String = ""): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", esKey(col(idCol), col(weightCol), seed))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Per-stratum Efraimidis–Spirakis: keep the `k` best weighted draws
    * WITHIN each stratum ("20 docs per language by quality weight") —
    * same deterministic key as [[weightedTopK]], ranked per stratum.
    *
    * Scale shape: [[GroupTopK.topKPerGroup]] (the TopKStructs native
    * aggregate), NOT a rank window — the window formulation ships and
    * sorts EVERY row through the stratum exchange, while the aggregate
    * partial-combines map-side so at most k rows per stratum per
    * partition cross the wire. Ordering (es_key desc, id asc) is
    * realized as an ascending struct sort on (−es_key, id); the key is
    * strictly negative (u<1 ⇒ ln u<0), so negation is order-exact.
    */
  def weightedTopKPerStratum(df: DataFrame, idCol: String,
                             strataCol: String, weightCol: String, k: Int,
                             seed: String = ""): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val keyed = df.filter(col(weightCol) > 0)
      .withColumn("es_key", esKey(col(idCol), col(weightCol), seed))
      .withColumn("__negkey", -col("es_key"))
    GroupTopK.topKPerGroup(keyed, Seq(strataCol), Seq("__negkey", idCol), k)
      .drop("__negkey", "rn")
      .select(df.columns.map(col) :+ col("es_key"): _*)
  }

  def epochMix(df: DataFrame, keyCol: String, strataCol: String,
               weights: Map[String, Double],
               default: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(_ >= 0.0),
      "mix weights must be non-negative")
    def full(w: Double) = math.floor(w).toInt
    def frac(w: Double) = w - math.floor(w)
    val sorted = weights.toSeq.sortBy(_._1)
    val fullChain = sorted.foldLeft(lit(full(default))) {
      case (acc, (s, w)) => when(col(strataCol) === s, lit(full(w))).otherwise(acc)
    }
    val thrChain = sorted.foldLeft(lit(thresholdToken(frac(default)))) {
      case (acc, (s, w)) =>
        when(col(strataCol) === s, lit(thresholdToken(frac(w)))).otherwise(acc)
    }
    val saltedKey = concat(col(keyCol).cast("string"), lit("#"),
      col("epoch").cast("string"))
    df.withColumn("__full", fullChain).withColumn("__thr", thrChain)
      .withColumn("epoch", explode(sequence(lit(0), col("__full"))))
      .filter(col("epoch") < col("__full") ||
        substring(md5(saltedKey), 1, 8) < col("__thr"))
      .withColumn("epoch", col("epoch").cast("long"))
      .drop("__full", "__thr")
  }
}
