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
    * byte-exactly; the â€-class (curly quotes/dashes), whose forms
    * contain invisible C1 controls, lives in [[Cp1252Pairs]] under the
    * explicit-escape discipline.
    */
  val MojibakePairs: Seq[(String, String)] = Seq(
    "Ã©" -> "é",
    "Ã¨" -> "è",
    "Ã¤" -> "ä",
    "Ã¶" -> "ö",
    "Ã¼" -> "ü",
    "Ã±" -> "ñ")

  /** The cp1252 â€-class (mojibake → intended): a three-byte UTF-8
    * punctuation mark (curly quote, dash, ellipsis — the most common
    * real-crawl class after the Ã-class) whose bytes were re-read as
    * cp1252. Sources are `â` + `€` + one third character; every
    * codepoint is written as an explicit `\\uXXXX` escape because the
    * right-double-quote form ends in U+009D — an INVISIBLE C1 control
    * (0x9D is unmapped in cp1252, so a Latin-1-style read passes the
    * raw byte through) that no editor/locale round-trip can be trusted
    * with; the SQL side emits controls as `chr(n)` ([[Sql.sqlLit]]) so
    * the literal also survives the JSON hop to the oracle harness.
    * The repair chain is a fixed left-to-right fold, so a repair that
    * materializes another pair's source (e.g. `â€` + the `â€œ` form →
    * the en-dash form after the quote repairs) cascades — identically
    * on both engines, since both replay the same ordered chain.
    */
  val Cp1252Pairs: Seq[(String, String)] = Seq(
    "\u00E2\u20AC\u0153" -> "\u201C", //  left double quote
    "\u00E2\u20AC\u009D" -> "\u201D", //  right double quote (C1 form)
    "\u00E2\u20AC\u02DC" -> "\u2018", //  left single quote
    "\u00E2\u20AC\u2122" -> "\u2019", //  right single quote
    "\u00E2\u20AC\u201C" -> "\u2013", //  en dash
    "\u00E2\u20AC\u201D" -> "\u2014", //  em dash
    "\u00E2\u20AC\u00A6" -> "\u2026") //  ellipsis

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
    val nCp = Cp1252Pairs.map(p => countOccurrences(t, p._1))
      .reduce(_ + _).as("n_cp1252")
    docs.select(col(idCol), nRepl, nCtrl, nMoji, nCp)
      .withColumn("clean",
        (col("n_replacement") === 0L && col("n_ctrl") === 0L &&
          col("n_mojibake") === 0L && col("n_cp1252") === 0L).cast("int"))
  }

  /** The repair column: mojibake reversed through [[MojibakePairs]]
    * then [[Cp1252Pairs]] in order, then replacement and control
    * characters stripped. The C0 strip runs LAST and the C1-bearing
    * cp1252 forms are not C0, so the strip cannot eat a form before
    * its repair fires.
    */
  def repaired(text: Column): Column = {
    val demojied = (MojibakePairs ++ Cp1252Pairs).foldLeft(text) {
      case (c, (bad, good)) => replace(c, lit(bad), lit(good))
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

    /** A DuckDB string literal that survives every hop: printable
      * runs as quoted literals, C0/C1 controls as `chr(n)` pieces —
      * a raw control byte inside a literal parses in DuckDB but not
      * every JSON/editor transit between here and the oracle harness.
      */
    def sqlLit(v: String): String = {
      def ctrl(c: Char) = c < ' ' || (c >= '\u007F' && c <= '\u009F')
      if (v.isEmpty) "''"
      else {
        val parts = scala.collection.mutable.ListBuffer[String]()
        var run = new StringBuilder
        for (c <- v) {
          if (ctrl(c)) {
            if (run.nonEmpty) { parts += s"'${sq(run.toString)}'"; run = new StringBuilder }
            parts += s"chr(${c.toInt})"
          } else run.append(c)
        }
        if (run.nonEmpty) parts += s"'${sq(run.toString)}'"
        parts.mkString(" || ")
      }
    }

    def countOccurrences(t: String, needle: String): String =
      s"CAST((length($t) - length(replace($t, ${sqlLit(needle)}, ''))) // ${needle.length} AS BIGINT)"

    def nCtrl(t: String): String =
      s"CAST(length($t) - length(regexp_replace($t, '$CtrlClass', '', 'g')) AS BIGINT)"

    def nMojibake(t: String): String =
      MojibakePairs.map(p => countOccurrences(t, p._1)).mkString(" + ")

    def nCp1252(t: String): String =
      Cp1252Pairs.map(p => countOccurrences(t, p._1)).mkString(" + ")

    def repaired(t: String): String = {
      val demojied = (MojibakePairs ++ Cp1252Pairs).foldLeft(t) {
        case (e, (bad, good)) =>
          s"replace($e, ${sqlLit(bad)}, ${sqlLit(good)})"
      }
      s"regexp_replace(replace($demojied, '$Replacement', ''), '$CtrlClass', '', 'g')"
    }
  }
}
