package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Registrable-domain extraction against the public-suffix list — the
  * exact variant of [[Urls.domain]]'s two-label approximation. The
  * registrable domain ("foo.co.uk" for host "bar.foo.co.uk") is the
  * unit nearly every web-curation decision keys on (per-domain caps,
  * blocklists, quality priors); the two-label rule is exact for
  * generic TLDs but wrong for every country-code suffix that itself
  * spans two+ labels.
  *
  * Algorithm (publicsuffix.org): find the LONGEST suffix-list entry
  * that is a label-suffix of the host; the registrable domain is that
  * entry plus one more label. Implemented as a tiered expression —
  * check the 3-label suffix set first, then the 2-label set, then fall
  * back to the generic two-label rule (single-label TLDs need no
  * list: "anything.com" is registrable at two labels).
  *
  * Scale shape: the suffix list is a FIXED-size dimension (~10k
  * entries for the full PSL, a few hundred here), so it ships to
  * executors inside the plan as literal `isin` sets — Catalyst
  * compiles a >10-element In to an O(1) hashed InSet — making the
  * whole operator map-side with zero joins and zero shuffles. That
  * beats the broadcast-join formulation at any corpus size: same
  * broadcast effect, no join operator, no codegen break.
  *
  * [[Default]] is an embedded subset of the public-suffix list (the
  * high-traffic country-code second-level suffixes; the list itself is
  * public data). Wildcard (`*.ck`) and exception (`!www.ck`) rules are
  * not modeled — deployments needing them pass the expanded list, or
  * extend the tiers the same way. Hosts with fewer than two labels
  * ("localhost") yield the empty string, matching [[Urls.domain]].
  */
object PublicSuffix {

  /** Embedded 2-label public suffixes (suffix consumes two labels ⇒
    * registrable domain keeps three).
    */
  val Default2: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    // Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    // China / Taiwan / Hong Kong
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "nic.in",
    // New Zealand / South Africa / Singapore
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz", "gen.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Mexico / Argentina / Turkey / Israel
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "gen.tr", "web.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "k12.il",
    // Spain / Poland / Ukraine
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    // Southeast Asia
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.th", "ac.th", "go.th", "or.th", "in.th",
    "co.id", "ac.id", "go.id", "or.id", "sch.id", "web.id",
    // Egypt / Saudi Arabia / Pakistan / Nigeria
    "com.eg", "edu.eg", "gov.eg", "com.sa", "edu.sa", "gov.sa",
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    "com.ng", "edu.ng", "gov.ng", "net.ng", "org.ng")

  /** Embedded 3-label public suffixes (registrable keeps four labels)
    * — the Australian state education suffixes, the PSL's most common
    * 3-label class.
    */
  val Default3: Seq[String] = Seq(
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au")

  /** Last `k` dot-separated labels of `host`, or '' if host has fewer. */
  private def lastLabels(host: Column, k: Int): Column =
    regexp_extract(host, s"((?:[^.]+\\.){${k - 1}}[^.]+)$$", 1)

  /** Registrable domain of a (lowercased) host column. Longest suffix
    * wins: 3-label suffixes before 2-label before the generic rule.
    * A host that IS a bare public suffix has no registrable domain per
    * the PSL; this returns the suffix itself (the corpus-curation
    * convention — such hosts then share one cap bucket).
    */
  def registrableFromHost(host: Column,
                          suffixes2: Seq[String] = Default2,
                          suffixes3: Seq[String] = Default3): Column = {
    val l2 = lastLabels(host, 2)
    val l3 = lastLabels(host, 3)
    val l4 = lastLabels(host, 4)
    when(l3.isin(suffixes3: _*) && l4 =!= "", l4)
      .when(l2.isin(suffixes2: _*) && l3 =!= "", l3)
      .otherwise(l2)
  }

  /** Registrable domain straight from a URL column. */
  def registrableDomain(url: Column): Column =
    registrableFromHost(Urls.host(url))

  /** Build the tiered expression from a suffix TABLE (one string
    * column) — the deployment path for the full public-suffix list.
    * The table is collected once on the driver (it is a fixed ~10k-row
    * dimension; `maxEntries` guards against feeding a corpus in by
    * mistake) and embedded as InSet literals, keeping scoring map-side
    * exactly like the embedded default.
    */
  def registrableFromHost(host: Column, suffixTable: DataFrame,
                          maxEntries: Int): Column = {
    val n = suffixTable.count()
    require(n <= maxEntries,
      s"suffix table has $n rows, over the $maxEntries guard — " +
        "is this really a suffix list?")
    val col0 = suffixTable.columns.head
    val entries = suffixTable.select(org.apache.spark.sql.functions.col(col0))
      .collect().map(_.getString(0)).toSeq
    val byLabels = entries.groupBy(_.count(_ == '.') + 1)
    val unsupported = byLabels.keySet.filter(k => k != 2 && k != 3)
    require(unsupported.isEmpty,
      s"unsupported suffix label counts: $unsupported (1-label TLDs " +
        "need no list entry; extend the tiers for deeper suffixes)")
    registrableFromHost(host,
      byLabels.getOrElse(2, Seq.empty), byLabels.getOrElse(3, Seq.empty))
  }
}
