package graft.bench

import graft.core.Tables
import graft.dedup.TextDedup
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the minhash pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    for (i <- 1 to 2) {
      println(s"--- pass $i")
      val sh = TextDedup.shingleSets(docs, "doc_id", "text", distinct = false)
      time("shingles")(sh.count())
      val sigs = TextDedup.minhashSignatures(sh, "doc_id")
      time("signatures")(sigs.count())
      val bands = TextDedup.bandKeys(sigs, "doc_id")
      time("bands")(bands.count())
      val pairs = TextDedup.candidatePairs(bands, "doc_id")
      time("pairs")(pairs.count())
      time("full-pipeline")(Pipelines.minhashLsh(spark, sfDir).count())
    }
    spark.stop()
  }
}
