package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared measurement methodology for the dev probes (ScaleProbe,
  * LayoutProbe) — one copy so the DESIGN.md claim that the probes
  * mirror each other stays true by construction.
  */
object ProbeUtil {

  /** Multiply a fixture by unioning id-offset copies. */
  def multiply(df: DataFrame, idCol: String, copies: Int, offset: Long): DataFrame =
    (1 until copies).foldLeft(df)((acc, i) =>
      acc.union(df.withColumn(idCol, col(idCol) + lit(i * offset))))

  /** Print `tag name seconds rows`, min over `repeats` runs (min is the
    * standard stabilizer against shared-host GC/scheduler noise).
    */
  def time(tag: String, name: String, repeats: Int = 1)(f: => Long): Unit = {
    val runs = (1 to repeats).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(f"[$tag] $name%-34s ${runs.map(_._1).min}%8.3f s  rows=${runs.head._2}")
  }
}
