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

  /** Distinct (id, shingle) pairs; docs shorter than `k` tokens carry
    * no shingles and drop out (they can't near-dup at this n-gram size).
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
                  k: Int = DefaultShingle): DataFrame = {
    val toks = split(col(textCol), " ")
    val sh = transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (1 to k).map(j => element_at(toks, i + lit(j))): _*))
    df.filter(size(toks) >= k)
      .select(col(idCol), explode(sh).as("shingle"))
      .distinct()
  }

  private def hashShingle(seed: Int, shingle: Column): Column =
    md5(concat(lit(s"$seed:"), shingle))

  /** MinHash signature: `numHashes` lexicographic-min md5 columns
    * `sig_0..sig_{n-1}` per id.
    */
  def minhashSignatures(shingles: DataFrame, idCol: String,
                        numHashes: Int = NumHashes): DataFrame = {
    val aggs = (0 until numHashes).map(j =>
      min(hashShingle(j, col("shingle"))).as(s"sig_$j"))
    shingles.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (id, band_id, band_key) — docs agreeing on all rows
    * of any band share a band_key.
    */
  def bandKeys(sigs: DataFrame, idCol: String, bands: Int = Bands,
               rowsPerBand: Int = RowsPerBand): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val key = md5(concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*))
      struct(lit(b).as("band_id"), key.as("band_key"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col("bk.band_id"), col("bk.band_key"))
  }

  /** Candidate pairs (a_id < b_id) sharing at least one band. */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("a_id"), col("band_id"), col("band_key"))
    val b = bands.select(col(idCol).as("b_id"), col("band_id"), col("band_key"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B|, computed
    * from integer counts (cross-engine exact).
    */
  def jaccard(pairs: DataFrame, shingles: DataFrame, idCol: String): DataFrame = {
    val sizes = shingles.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(shingles.withColumnRenamed(idCol, "a_id"), Seq("a_id"))
      .join(shingles.withColumnRenamed(idCol, "b_id"), Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "a_id").withColumnRenamed("sz", "a_sz"), Seq("a_id"))
      .join(sizes.withColumnRenamed(idCol, "b_id").withColumnRenamed("sz", "b_sz"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
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

    def minhashAggs(numHashes: Int = NumHashes): String =
      (0 until numHashes)
        .map(j => s"min(md5('$j:' || shingle)) AS sig_$j").mkString(", ")

    def bandKeyExprs(bands: Int = Bands, rowsPerBand: Int = RowsPerBand): Seq[(Int, String)] =
      (0 until bands).map { b =>
        val cols = (0 until rowsPerBand).map(r => s"sig_${b * rowsPerBand + r}")
        b -> s"md5(${cols.mkString(" || '|' || ")})"
      }

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
