package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization, domain extraction, and per-domain caps — the
  * web-corpus curation layer (CCNet/RefinedWeb-style pipelines key
  * nearly every corpus decision on the registrable domain: caps,
  * blocklists, per-domain quality priors).
  *
  * Everything is built from codegen'd expressions (`parse_url` +
  * regexp chains) — no UDF and no higher-order-function lambdas, which
  * run interpreted (the known hot-loop trap): URL cleanup executes
  * once per document at corpus scale, exactly where interpreted
  * expressions hurt.
  */
object Urls {

  /** Tracking query parameters stripped by [[normalize]] (regex
    * alternation; extend per deployment).
    */
  val TrackingParams = "utm_[^=&]*|gclid|fbclid|msclkid"

  def host(url: Column): Column = lower(parse_url(url, lit("HOST")))

  /** Registrable-domain approximation: the last two host labels —
    * exact for generic TLDs, wrong for multi-label country suffixes
    * (`foo.co.uk`). [[PublicSuffix.registrableDomain]] is the faithful
    * variant (tiered longest-suffix match against the public-suffix
    * list, embedded as map-side InSet literals); this stays the cheap
    * default where the corpus is known generic-TLD.
    */
  def domain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Non-default explicit port (":8080") or empty; parse_url HOST
    * drops the port, AUTHORITY keeps it.
    */
  private def portPart(url: Column, proto: Column): Column = {
    val port = regexp_extract(parse_url(url, lit("AUTHORITY")), ":([0-9]+)$", 1)
    when(port === "", lit(""))
      .when(proto === "https" && port === "443", lit(""))
      .when(proto === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
  }

  /** Query string minus tracking params: each tracked key=value is
    * removed together with its PRECEDING separator (or from the string
    * head), then a stranded leading '&' is trimmed — two anchored
    * regexp_replace passes, order-preserving for surviving params.
    */
  def stripTracking(query: Column): Column =
    regexp_replace(
      regexp_replace(query, s"(?:^|&)(?:$TrackingParams)(?:=[^&]*)?", ""),
      "^&", "")

  /** Canonical URL: lowercased scheme and host, default port dropped
    * (explicit non-default ports kept), fragment dropped, tracking
    * params stripped (query dropped entirely if nothing survives),
    * path kept verbatim. Two normalized URLs compare equal iff the
    * originals differ only in those presentation details — the key for
    * URL-level exact dedup upstream of text dedup.
    */
  def normalize(url: Column): Column = {
    val proto = lower(parse_url(url, lit("PROTOCOL")))
    val q = stripTracking(coalesce(parse_url(url, lit("QUERY")), lit("")))
    concat(
      proto, lit("://"), host(url), portPart(url, proto),
      coalesce(parse_url(url, lit("PATH")), lit("")),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Blocklist gate: keep rows whose registrable domain is NOT in
    * `blockedDomains` and whose URL path+query does NOT match
    * `blockedPattern` — the standard crawl-curation block stage
    * (spam/adult/aggregator domains plus URL-shape heuristics).
    *
    * Scale shape: domain blocklists are fixed dimensions (10⁴–10⁶
    * entries). Up to `maxInline` they ship as a hashed InSet literal in
    * the plan (map-side, zero joins — the PublicSuffix discipline);
    * larger lists become a broadcast LEFT ANTI join on the domain key,
    * which still never shuffles the corpus. The pattern test is one
    * codegen'd rlike on the scan.
    */
  def blocklistFilter(df: DataFrame, urlCol: String,
                      blockedDomains: Seq[String],
                      blockedPattern: String = "",
                      maxInline: Int = 100000): DataFrame = {
    val dom = PublicSuffix.registrableDomain(col(urlCol))
    val pathOk =
      if (blockedPattern.isEmpty) lit(true)
      else !coalesce(
        concat(coalesce(parse_url(col(urlCol), lit("PATH")), lit("")),
          lit("?"), coalesce(parse_url(col(urlCol), lit("QUERY")), lit(""))),
        lit("")).rlike(blockedPattern)
    if (blockedDomains.isEmpty) df.filter(pathOk)
    else if (blockedDomains.length <= maxInline)
      df.filter(!dom.isin(blockedDomains: _*) && pathOk)
    else {
      val spark = df.sparkSession
      import spark.implicits._
      val block = blockedDomains.toDF("__blocked_domain")
      df.withColumn("__dom", dom)
        .join(broadcast(block),
          col("__dom") === col("__blocked_domain"), "left_anti")
        .drop("__dom")
        .filter(pathOk)
    }
  }

  /** Per-domain cap: keep at most `cap` rows per domain, preferring
    * high `scoreCol` with `idCol` as the deterministic tiebreak — the
    * standard anti-SEO-farm volume control. One hash-partitioned
    * window on the domain key; domain cardinality grows with the
    * corpus so partitions stay balanced, and a pathological megadomain
    * is exactly what the cap truncates (rank early, before any payload
    * joins). For cap=1 prefer the argmax-struct aggregation (a11
    * shape) — it partial-combines map-side where a window ships every
    * row.
    */
  def domainCap(df: DataFrame, domainCol: String, scoreCol: String,
                idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap=$cap must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
