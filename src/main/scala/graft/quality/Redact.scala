package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrubbing pass between web-scale ingest and
  * training-data export: replace personally-identifying spans (emails,
  * IPs, phone-shaped and long digit runs) with typed placeholder
  * tokens, keeping surrounding text intact.
  *
  * The patterns deliberately use the regex subset that Java
  * (Spark's engine) and RE2 (DuckDB's) interpret identically — no
  * backreferences, no lookaround — so the oracle can run the very same
  * pattern text. Order matters: emails before long-digit-runs (an
  * email local part may contain digits), IPs before phones (dotted
  * quads contain phone-length digit runs).
  *
  * Scale design: a chain of codegen'd `regexp_replace` calls in ONE
  * projection — per-row, shuffle-free, pipelined inside whole-stage
  * codegen with whatever filter/projection surrounds it.
  */
object Redact {

  /** (pattern, replacement) in application order. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    // email: conservative RFC-ish local@domain.tld
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // IPv4 dotted quad (word-bounded so version strings survive)
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    // phone-shaped: 3-3-4 groups with -, space or . separators,
    // optional +1/0n country prefix
    ("(\\+\\d{1,2}[ -]?)?\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"),
    // long digit runs (account numbers, SSN-ish with separators removed)
    ("\\b\\d{9,}\\b", "<NUM>"))

  /** The redaction column expression. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** DuckDB spelling over a column expression — same patterns, same
    * order; 'g' makes RE2 replace globally like Java's replaceAll.
    */
  def redactSql(textExpr: String): String =
    PiiPatterns.foldLeft(textExpr) { case (e, (pat, rep)) =>
      // DuckDB single-quoted literals are verbatim (no backslash
      // escapes) — the Java pattern text passes through unchanged
      val quoted = pat.replace("'", "''")
      s"regexp_replace($e, '$quoted', '$rep', 'g')"
    }

  private def className(rep: String): String =
    rep.replaceAll("[<>]", "").toLowerCase

  /** Per-class PII occurrence counts — the rate-tracking census run
    * before/after redaction. Each class counts matches on the text
    * AFTER the earlier classes were replaced (the same precedence the
    * redaction chain applies: an email's digits never double-count as
    * a digit run, a dotted quad never recounts as a phone). Returns
    * (class, count-column) pairs in chain order; still one codegen'd
    * projection — no shuffle, no UDF.
    */
  def piiCensus(text: Column): Seq[(String, Column)] = {
    val (cols, _) = PiiPatterns.foldLeft(
      (Seq.empty[(String, Column)], text)) {
      case ((acc, cur), (pat, rep)) =>
        val n = size(regexp_extract_all(cur, lit(pat), lit(0)))
          .cast("long")
        (acc :+ (className(rep) -> n), regexp_replace(cur, pat, rep))
    }
    cols
  }

  /** The census restated for DuckDB: same progressive chain, same
    * pattern texts, `len(regexp_extract_all(...))` counts.
    */
  def censusSql(textExpr: String): Seq[(String, String)] = {
    val (cols, _) = PiiPatterns.foldLeft(
      (Seq.empty[(String, String)], textExpr)) {
      case ((acc, cur), (pat, rep)) =>
        val quoted = pat.replace("'", "''")
        val n = s"CAST(len(regexp_extract_all($cur, '$quoted')) AS BIGINT)"
        (acc :+ (className(rep) -> n),
          s"regexp_replace($cur, '$quoted', '$rep', 'g')")
    }
    cols
  }
}
