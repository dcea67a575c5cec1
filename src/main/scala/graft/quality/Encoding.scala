package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-quality census and repair — the ftfy-style curation stage:
  * crawl text arrives with U+FFFD replacement characters (decoder gave
  * up), stray C0 control bytes (binary bleed-through), and
  * UTF-8-read-as-Latin-1 mojibake ("cafÃ©" for "café"). The census
  * counts each artifact class per document (the drop/repair decision
  * signal); the repair face fixes what is mechanically fixable —
  * mojibake reverses through a fixed pair table, control and
  * replacement characters strip — and leaves the text otherwise
  * untouched.
  *
  * Exactness: counts are char-length differences after literal
  * `replace`/`regexp_replace` (every character involved is BMP, so
  * Spark's UTF-16 `length` and DuckDB's code-point `length` agree),
  * and the repair is a fixed left-to-right replace chain both engines
  * replay literally. Scale shape: pure codegen'd projections,
  * map-side, no shuffle, no UDF.
  */
object Encoding {

  /** U+FFFD — the decoder's "I gave up" marker. */
  val Replacement = "�"

  /** C0 controls except tab/newline/carriage-return (which are
    * legitimate text); identical syntax and semantics in Java regex
    * and RE2.
    */
  val CtrlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"
  /** The common UTF-8-as-Latin-1 double-encoding pairs (mojibake →
    * intended), applied in order: the Ã-class, i.e. a two-byte UTF-8
    * accented letter whose bytes were re-read as Latin-1 ("cafÃ©" for
    * "café"). Every character on both sides is a PRINTABLE BMP
    * codepoint, so the literals survive source/JSON/SQL round-trips
    * byte-exactly; the â€-class (curly quotes/dashes) is deliberately
    * excluded — its mojibake forms contain invisible C1 controls and
    * depend on a cp1252 (not Latin-1) read, which is not a literal
    * both engines can share safely.
    */
  val MojibakePairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é",
    "Ã¨" -> "è",
    "Ã¤" -> "ä",
    "Ã¶" -> "ö",
    "Ã¼" -> "ü",
    "Ã±" -> "ñ")

  private def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) /
      lit(needle.length)).cast("long")

  /** Per-document artifact census: replacement chars, stray C0
    * controls, mojibake pair hits, and the combined `clean` bit.
    */
  def census(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val nRepl = countOccurrences(t, Replacement).as("n_replacement")
    val nCtrl = (length(t) - length(regexp_replace(t, CtrlClass, "")))
      .cast("long").as("n_ctrl")
    val nMoji = MojibakePairs.map(p => countOccurrences(t, p._1))
      .reduce(_ + _).as("n_mojibake")
    docs.select(col(idCol), nRepl, nCtrl, nMoji)
      .withColumn("clean",
        (col("n_replacement") === 0L && col("n_ctrl") === 0L &&
          col("n_mojibake") === 0L).cast("int"))
  }

  /** The repair column: mojibake reversed through [[MojibakePairs]] in
    * order, then replacement and control characters stripped.
    */
  def repaired(text: Column): Column = {
    val demojied = MojibakePairs.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }
    regexp_replace(replace(demojied, lit(Replacement), lit("")),
      CtrlClass, "")
  }

  /** Repair face: all input columns, `textCol` replaced by its
    * repaired form.
    */
  def repair(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, repaired(col(textCol)))

  /** DuckDB spellings of the same census/repair over a text SQL
    * expression — the literal pair table emitted from the SAME Scala
    * constants (no transcription to drift).
    */
  object Sql {
    private def sq(s: String): String = s.replace("'", "''")

    def countOccurrences(t: String, needle: String): String =
      s"CAST((length($t) - length(replace($t, '${sq(needle)}', ''))) // ${needle.length} AS BIGINT)"

    def nCtrl(t: String): String =
      s"CAST(length($t) - length(regexp_replace($t, '$CtrlClass', '', 'g')) AS BIGINT)"

    def nMojibake(t: String): String =
      MojibakePairs.map(p => countOccurrences(t, p._1)).mkString(" + ")

    def repaired(t: String): String = {
      val demojied = MojibakePairs.foldLeft(t) { case (e, (bad, good)) =>
        s"replace($e, '${sq(bad)}', '${sq(good)}')"
      }
      s"regexp_replace(replace($demojied, '$Replacement', ''), '$CtrlClass', '', 'g')"
    }
  }
}
