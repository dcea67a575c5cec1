package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shard manifests — the integrity artifact that ships next to every
  * exported shard set (tk6 token shards, pack exports, the warehouse
  * stage): per shard, the row count, token total, id range, and an
  * order-independent content checksum. A consumer re-derives the
  * manifest from what it received and diffs; any dropped, duplicated,
  * or bit-flipped document flips its shard's row.
  *
  * Checksum design: SUM over rows of a 32-bit md5-derived integer
  * (`conv(substr(md5(id || ':' || text), 1, 8))` — the TextDedup hash
  * convention). Addition is commutative, so the checksum is
  * independent of row order and partitioning (manifests from a
  * 1000-way parallel export and a single-thread re-read agree), and
  * 2^32-bounded terms keep the int64 sum exact to ~2^31 rows per
  * shard — far past any real shard size. NOT cryptographic: this
  * catches transport/export corruption, not adversaries.
  *
  * Scale shape: one map-side projection + one `nShards`-key partial
  * agg — the manifest of a 100 TB export costs the scan it already
  * paid. The diff is an `nShards`-row join.
  */
object Manifest {

  /** Deterministic shard id: leading md5 hex of the id, mod nShards —
    * matches the md5-keyed layout `Sources.shuffledShards` writes.
    */
  def shardOf(id: org.apache.spark.sql.Column, nShards: Int) =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long"), lit(nShards.toLong))

  def shardManifest(df: DataFrame, idCol: String, textCol: String,
                    nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val rowHash = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":"), col(textCol))), 1, 8), 16, 10).cast("long")
    df.select(shardOf(col(idCol), nShards).as("shard"),
      col(idCol).cast("long").as("__id"),
      graft.functions.TextAnalysis.tokenCount(col(textCol))
        .cast("long").as("__n"),
      rowHash.as("__h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"),
        sum(col("__h")).as("checksum"))
  }

  /** Incremental cross-release overlap at MANIFEST granularity (mf3):
    * given release A only as its SHIPPED ARTIFACTS — the shard
    * manifest and the distinct content-fingerprint store (`fp` =
    * md5(text), the store the e11/x15 dedup path already maintains) —
    * and release B as data, report per shard how many B documents are
    * exact content duplicates of A, recomputing ONLY the shards whose
    * manifest changed:
    *
    *  - UNCHANGED shards (manifest row identical): B's docs there are
    *    byte-for-byte A's docs (the manifest's integrity contract), so
    *    n_overlap = n_docs with zero document reads — the carry.
    *  - CHANGED shards: only their B docs probe the A fingerprint
    *    store (fp-keyed left join — a changed doc can duplicate an A
    *    doc from ANY shard, so the probe is never shard-local on the
    *    store side).
    *
    * A 100 TB re-release where 2 of 10k shards moved pays two shards
    * of probes plus the manifest scan it already owed — not a corpus²
    * recompute. The mf3 gate holds the scoped result to the full-
    * corpus recompute (the oracle) on a planted delta that exercises
    * both the carry and a cross-doc duplicate inside a changed shard.
    * Output: (shard, n_docs, n_overlap), one row per non-empty B shard.
    */
  def scopedOverlap(aManifest: DataFrame, aFps: DataFrame, b: DataFrame,
                    idCol: String, textCol: String,
                    nShards: Int): DataFrame = {
    val mb = shardManifest(b, idCol, textCol, nShards)
    val changed = manifestDiff(aManifest, mb).select(col("shard"))
    val carried = mb.join(changed, Seq("shard"), "left_anti")
      .select(col("shard"), col("n_docs"), col("n_docs").as("n_overlap"))
    val probes = b.select(shardOf(col(idCol), nShards).as("shard"),
        md5(col(textCol)).as("fp"))
      .join(changed, Seq("shard"), "left_semi")
    val store = aFps.select(col("fp")).distinct()
      .withColumn("__hit", lit(1L))
    val recomputed = probes.join(store, Seq("fp"), "left")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
    carried.unionByName(recomputed)
  }

  /** Shards where two manifests disagree, with both sides' counts and
    * checksums — the receiver's verification readout. A full outer
    * join so a shard missing entirely from one side still reports
    * (null columns on the absent side).
    */
  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("shard"), col("n_docs").as("a_docs"),
      col("n_tokens").as("a_tokens"), col("checksum").as("a_checksum"))
    val r = b.select(col("shard"), col("n_docs").as("b_docs"),
      col("n_tokens").as("b_tokens"), col("checksum").as("b_checksum"))
    l.join(r, Seq("shard"), "full_outer")
      .filter(
        !(col("a_docs") <=> col("b_docs")) ||
          !(col("a_tokens") <=> col("b_tokens")) ||
          !(col("a_checksum") <=> col("b_checksum")))
  }
}
