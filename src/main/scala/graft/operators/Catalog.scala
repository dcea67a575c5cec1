package graft.operators

import graft.core.Tables
import graft.profile.Profiler
import graft.quality.{Dedup, NullRepair}
import graft.transform.Cleansers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The oracle-gated query catalog: every SURVEY.md §2 operator group is
  * exercised by at least one named query here, each paired with a
  * DuckDB SQL spelling in [[Catalog.oracle]] that must hash-match
  * exactly (see [[Exact]] for the float discipline).
  *
  * Column names are aliased identically on both sides — the driver
  * sorts columns by name before hashing. Every query also carries a
  * deterministic ORDER BY on both sides (cheap at verify scale; bench
  * uses the un-sorted pipelines).
  */
object Catalog {
  import Exact._

  /** Shared null-injection view over customer (negative balances and the
    * BUILDING segment become NULL) — mirrors the loanstats null topology
    * without mutating fixtures (FIXTURES.md B).
    */
  private def customerNulls(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir).select(
      $"c_custkey",
      when($"c_acctbal" < 0, lit(null)).otherwise($"c_acctbal").as("bal"),
      when($"c_mktsegment" === "BUILDING", lit(null)).otherwise($"c_mktsegment").as("seg"))
  }
  private val customerNullsSql =
    """cn AS (SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
      |  CASE WHEN c_mktsegment = 'BUILDING' THEN NULL ELSE c_mktsegment END AS seg
      | FROM customer)""".stripMargin

  /** D1 occurrence numbering over a composite key (lineitem analogue of
    * the 22-column loanstats window, SURVEY §2.3).
    */
  private def dupWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.withOccurrenceId(
      Tables.lineitem(spark, sfDir)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey"),
      keys = Seq("l_partkey", "l_suppkey"),
      order = Seq($"l_orderkey", $"l_linenumber"))
  }
  private val dupWindowSql =
    """dw AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  ROW_NUMBER() OVER (PARTITION BY l_partkey, l_suppkey
      |                     ORDER BY l_orderkey, l_linenumber) AS occur_id
      | FROM lineitem)""".stripMargin

  // ----------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 — wide projection + F2 range predicate (pushed to parquet scan)
    "p1_projection" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .filter($"l_quantity" > 30)
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // F3 — disjunctive predicate as isin
    "f3_filter_in" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .filter($"o_orderstatus".isin("F", "P"))
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // F6/F7/A3 — regex validator + conditional flag + census
    "f6_regex_validate" -> ((spark, dir) => {
      import spark.implicits._
      Tables.documents(spark, dir)
        .withColumn("lang_flag",
          when($"lang".rlike("\\A(en|fr)\\z"), "valid").otherwise("invalid"))
        .groupBy($"lang", $"lang_flag").agg(count(lit(1)).as("cnt"))
        .orderBy($"lang")
    }),

    // D1 — duplicate-occurrence numbering (windowed)
    "d1_dup_window" -> ((spark, dir) =>
      dupWindow(spark, dir).orderBy(col("l_orderkey"), col("l_linenumber"))),

    // D2 — occurrence histogram
    "d2_dup_profile" -> ((spark, dir) => Dedup.occurrenceProfile(dupWindow(spark, dir))),

    // D3 — reconciliation sum(cnt) == input rows
    "d3_reconcile" -> ((spark, dir) =>
      Dedup.reconcile(Dedup.occurrenceProfile(dupWindow(spark, dir)))),

    // D4 — dedup by first occurrence
    "d4_dedup_filter" -> ((spark, dir) =>
      Dedup.dedupByOccurrence(dupWindow(spark, dir))
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_partkey"), col("l_suppkey"))),

    // D6 — whole-row distinct (partial-agg based)
    "d6_distinct" -> ((spark, dir) => {
      import spark.implicits._
      Dedup.dropExactDuplicates(
        Tables.lineitem(spark, dir).select($"l_returnflag", $"l_linestatus"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // F8 — empty-string vs NULL distinction (the reference counts both
    // separately: LAB-…-MLPCModel-3.ipynb cell 33)
    "f8_empty_vs_null" -> ((spark, dir) => {
      import spark.implicits._
      customerNulls(spark, dir)
        .withColumn("seg", when($"c_custkey" % 7 === 0, "").otherwise($"seg"))
        .agg(
          count(when($"seg" === "", 1)).as("n_empty"),
          count(when($"seg".isNull, 1)).as("n_null"),
          count(when($"seg".isNotNull && $"seg" =!= "", 1)).as("n_value"))
    }),

    // N1 — per-column null census (single row)
    "n1_null_census" -> ((spark, dir) => NullRepair.nullCensus(customerNulls(spark, dir))),

    // N2/F4 — rows containing any null (dynamic OR-fold)
    "n2_null_rows" -> ((spark, dir) =>
      NullRepair.rowsWithAnyNull(customerNulls(spark, dir))
        .select(col("c_custkey")).orderBy(col("c_custkey"))),

    // N4 — drop-any-null
    "n4_dropna" -> ((spark, dir) =>
      NullRepair.dropNulls(customerNulls(spark, dir))
        .select(col("c_custkey")).orderBy(col("c_custkey"))),

    // N3 — drop-all over a subset: dropped only when EVERY subset
    // column is null (c_custkey is never null, so the subset is what
    // makes the policy observable)
    "n3_dropall_subset" -> ((spark, dir) =>
      NullRepair.dropNulls(customerNulls(spark, dir), "all", Seq("bal", "seg"))
        .select(col("c_custkey")).orderBy(col("c_custkey"))),

    // N5 — drop-any over a single-column subset
    "n5_drop_subset" -> ((spark, dir) =>
      NullRepair.dropNulls(customerNulls(spark, dir), "any", Seq("bal"))
        .select(col("c_custkey")).orderBy(col("c_custkey"))),

    // C10 — prediction relabel (match value → hit label)
    "c10_relabel" -> ((spark, dir) =>
      Tables.orders(spark, dir).select(col("o_orderkey"),
        Cleansers.relabel((col("o_orderkey") % 2).cast("double"), 0.0,
          "Good Loan", "Bad Loan").as("label"))
        .orderBy(col("o_orderkey"))),

    // N6/N7 — per-column constant fill
    "n6_fillna" -> ((spark, dir) =>
      NullRepair.fill(customerNulls(spark, dir), Map("bal" -> 0.0, "seg" -> "UNKNOWN"))
        .orderBy(col("c_custkey"))),

    // N8 — mean imputation (broadcast scalar, not driver closure)
    "n8_impute_mean" -> ((spark, dir) =>
      NullRepair.imputeMean(customerNulls(spark, dir), Seq("bal"))
        .select(col("c_custkey"), col("bal")).orderBy(col("c_custkey"))),

    // N9 — median imputation, discrete-median exactness gate: fit the
    // statistic on a filtered subset (the reference's idiom — fit on
    // rows where another column is present), repair the full frame
    "n9_impute_median" -> ((spark, dir) => {
      val cn = customerNulls(spark, dir)
      NullRepair.imputeMedianExact(cn, "bal", Some(cn.filter(col("seg").isNotNull)))
        .select(col("c_custkey"), col("bal")).orderBy(col("c_custkey"))
    }),

    // N10 — group census with percent-of-total (denominator broadcast
    // in-plan, no driver-side count)
    "n10_group_census" -> ((spark, dir) =>
      NullRepair.groupCensus(Tables.customer(spark, dir), Seq("c_mktsegment"))),

    // A6 — global min/max scalars
    "a6_minmax" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir).agg(
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"),
        count(lit(1)).as("n"))
    }),

    // A7 — summary statistics (exact describe)
    "a7_describe" -> ((spark, dir) =>
      Profiler.describeExact(Tables.orders(spark, dir), "o_totalprice")),

    // A8 — distinct values
    "a8_distinct" -> ((spark, dir) =>
      Profiler.distinctValues(Tables.orders(spark, dir), "o_orderpriority")),

    // W1 — ranking family over a partition
    "w1_rank" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc)
      val wTie = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(spark, dir)
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(wTie).as("rn"))
        .orderBy($"c_mktsegment", $"rn")
    }),

    // O2/O4 — top-k with deterministic tiebreak (TakeOrderedAndProject)
    "o2_topk" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(100)
    }),

    // U1 — filter-then-union idiom
    "u1_union" -> ((spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir).select($"o_orderkey", $"o_orderstatus")
      o.filter($"o_orderstatus" === "F").union(o.filter($"o_orderstatus" === "O"))
        .orderBy($"o_orderkey")
    }),

    // C1/C2 — regex replace/extract cleansing
    "c1_regex_clean" -> ((spark, dir) => {
      import spark.implicits._
      Tables.part(spark, dir).select(
        $"p_partkey",
        regexp_replace($"p_type", " ", "_").as("type_u"),
        regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"))
        .orderBy($"p_partkey")
    }),

    // C14 — HTML→text extraction: script/style blocks die wholesale,
    // tags strip, entities unescape (&amp; last), whitespace collapses
    // — the WARC→plain-text stage, as one codegen'd chain on the scan
    "c14_html_strip" -> ((spark, dir) => {
      import spark.implicits._
      val html = concat(
        lit("<html><head><script type=\"text/javascript\">var x = 1 < 2;" +
          "</script><style>p { color: red; }</style></head><body><p>"),
        $"text",
        lit("</p><div class=\"f\">Tom &amp; Jerry &lt;3&gt; " +
          "&quot;hi&quot; it&#39;s&nbsp;here</div></body></html>"))
      Tables.documents(spark, dir).select(
        $"doc_id", Cleansers.stripHtml(html).as("text"))
        .orderBy($"doc_id")
    }),

    // C7 — month-token extraction ("1-URGENT" → "1"; dash-less unchanged)
    "c7_month_token" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir).select(
        $"o_orderkey",
        Cleansers.monthToken($"o_orderpriority").as("priority_code"))
        .orderBy($"o_orderkey")
    }),

    // C8 — term parse " N months" → N.0 (round-trips p_size)
    "c8_term_parse" -> ((spark, dir) => {
      import spark.implicits._
      Tables.part(spark, dir).select(
        $"p_partkey",
        Cleansers.termMonths(concat(lit(" "), $"p_size".cast("string"), lit(" months")))
          .as("term"))
        .orderBy($"p_partkey")
    }),

    // C9/A6 — min-max normalization via broadcast aggregate
    "c9_normalize" -> ((spark, dir) => {
      val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
      Cleansers.minMaxNormalize(o, Seq("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J1 — dimension joins (broadcast both dims; no shuffle of customer)
    "j1_join_broadcast" -> ((spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_cust"), dsum($"c_acctbal").as("sum_bal"))
        .orderBy($"r_name")
    }),

    // J2 — fact-fact shuffle join + exact revenue rollup
    "j2_join_shuffle" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n_items"),
          dsumDisc($"l_extendedprice", $"l_discount").as("revenue"))
        .orderBy($"o_orderstatus")
    }),

    // J3 — anti join: customers with no orders. The fixture gives
    // every customer at least one order, so the raw anti join is
    // trivially empty (an anti-join bug that also returns empty would
    // pass). Plant orderless customers deterministically ON BOTH SIDES
    // (the CurationCatalog convention): every 97th custkey re-enters
    // offset by 1e8 — guaranteed outside both the customer and the
    // orders key range, so exactly the planted rows survive.
    "j3_join_anti" -> ((spark, dir) => {
      import spark.implicits._
      val cust = Tables.customer(spark, dir).select($"c_custkey")
      val planted = cust.filter($"c_custkey" % 97 === 0)
        .select(($"c_custkey" + lit(100000000L)).as("c_custkey"))
      cust.unionByName(planted)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey").orderBy($"c_custkey")
    }),

    // J4 — semi join: count of customers with at least one order. Same
    // planted orderless customers as J3, so the semi join must EXCLUDE
    // rows (n_active < input count) — without the plant every customer
    // qualifies and a semi join that degenerates to a pass-through
    // would still gate green.
    "j4_join_semi" -> ((spark, dir) => {
      import spark.implicits._
      val cust = Tables.customer(spark, dir).select($"c_custkey")
      val planted = cust.filter($"c_custkey" % 97 === 0)
        .select(($"c_custkey" + lit(100000000L)).as("c_custkey"))
      cust.unionByName(planted)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey", "left_semi")
        .agg(count(lit(1)).as("n_active"), sum($"c_custkey").as("key_sum"))
    }),

    // E1 — tumbling-hour event rollup (batch face of the streaming op)
    "e1_event_windows" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"hour_start", $"event_type")
    }),

    // E2 — JSON property extraction + census
    "e2_json_extract" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .select(get_json_object($"props", "$.k").cast("int").as("k_val"))
        .groupBy($"k_val").agg(count(lit(1)).as("cnt"))
        .orderBy($"k_val")
    }),

    // W2 — analytic windows beyond ranking: running sum, lag, lead
    "w2_running" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(spark, dir).select(
        $"o_custkey", $"o_orderkey",
        sum(dec($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_total"),
        lag($"o_orderkey", 1).over(w).as("prev_order"),
        lead($"o_orderkey", 1).over(w).as("next_order"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // K1 — salted two-phase aggregation (skew path); must equal the
    // plain groupBy exactly
    "k1_salted_agg" -> ((spark, dir) =>
      Skew.saltedCountSum(Tables.lineitem(spark, dir),
        Seq("l_returnflag"), "l_extendedprice")
        .orderBy(col("l_returnflag"))),

    // K2 — salted equi-join (skew path); must equal the plain join
    // exactly, pair for pair
    "k2_salted_join" -> ((spark, dir) =>
      Skew.saltedJoin(
        Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity")),
        Tables.part(spark, dir)
          .select(col("p_partkey").as("l_partkey"), col("p_name")),
        Seq("l_partkey"), salts = 8)
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // E4 — session windows (gap-based) per user; oracle derives the
    // same sessions independently via lag + running sum, so Spark's
    // native session_window semantics (end = last event + gap) are
    // cross-checked, not assumed
    "e4_session_windows" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          unix_micros($"w.start").as("start_us"),
          unix_micros($"w.end").as("end_us"),
          $"n_events")
        .orderBy($"user_id", $"start_us")
    }),

    // RJ1 — range self-join via time-binning: pairs of same-user events
    // within 10 minutes, as a bin equi-join + filter instead of an
    // inequality join (the non-exploding formulation at scale)
    "rj1_range_join" -> ((spark, dir) => {
      import spark.implicits._
      val tolUs = 10L * 60 * 1000000
      val ev = Tables.events(spark, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"))
      val a = ev.select($"user_id", $"event_id".as("a_id"), $"ts_us".as("a_ts"))
        .withColumn("bin", explode(array(
          expr(s"a_ts div $tolUs") - 1, expr(s"a_ts div $tolUs"),
          expr(s"a_ts div $tolUs") + 1)))
      val b = ev.select($"user_id", $"event_id".as("b_id"), $"ts_us".as("b_ts"))
        .withColumn("bin", expr(s"b_ts div $tolUs"))
      // no distinct needed: b carries one bin and a's three exploded
      // bins are distinct, so each qualifying pair joins exactly once
      a.join(b, Seq("user_id", "bin"))
        .filter($"a_id" < $"b_id" && abs($"b_ts" - $"a_ts") <= tolUs)
        .select($"user_id", $"a_id", $"b_id")
        .orderBy($"user_id", $"a_id", $"b_id")
    }),

    // AJ1 — as-of join: each purchase enriched with the user's most
    // recent prior (or simultaneous) click; epoch-micros longs on both
    // engines so the ordering is identical
    "aj1_asof_join" -> ((spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("ts_us"), $"value")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts_us", $"event_id", $"value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts_us", $"event_id".as("click_id"),
          $"value".as("click_value"))
      AsOfJoin.asof(purchases, clicks, keys = Seq("user_id"), tsCol = "ts_us",
        rightCols = Seq("click_id", "click_value"))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // A14 — exact covariance/correlation: the built-in corr/covar use
    // order-dependent streaming merges (never cross-engine exact), so
    // both are derived from decimal-exact component sums and assembled
    // with the same IEEE ops on both engines (a7's discipline)
    "a14_covariance" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      val x = dec($"o_totalprice")
      val y = $"o_custkey".cast(DecimalType(18, 2))
      Tables.orders(spark, dir)
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum((x * y).cast(DecimalType(30, 4))).cast("double").as("sxy"),
          sum((x * x).cast(DecimalType(30, 4))).cast("double").as("sxx"),
          sum((y * y).cast(DecimalType(30, 4))).cast("double").as("syy"))
        .select(
          $"n".cast("long").as("n"),
          (($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1.0)).as("covar"),
          (($"sxy" - $"sx" * $"sy" / $"n") /
            (sqrt($"sxx" - $"sx" * $"sx" / $"n") *
              sqrt($"syy" - $"sy" * $"sy" / $"n"))).as("corr"))
    }),

    // H1 — fixed-width histogram: one codegen'd bucket projection +
    // groupBy (no per-bucket passes). The bucket formula is spelled the
    // same single-division way on both engines — width_bucket built-ins
    // differ in internal rounding order across engines, so the explicit
    // form is the cross-engine-exact one.
    "h1_histogram" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .select((floor($"o_totalprice" / 50000.0).cast("long") + 1L).as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
        .orderBy($"bucket")
    }),

    // TS1 — hourly resample with LOCF gap-fill: each user's irregular
    // event stream becomes a fixed hourly series carrying the latest
    // (event_id, value) forward; oracle derives the same grid with
    // generate_series + an explicit argmax pick
    "ts1_resample_locf" -> ((spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
      Resample.resampleLocf(ev, keys = Seq("user_id"), tsCol = "ts_us",
        payload = Seq("event_id", "value"), stepUs = 3600000000L)
        .orderBy($"user_id", $"ts_us")
    }),

    // AJ2 — forward as-of with tolerance: each purchase enriched with
    // the user's NEXT click within 10 minutes (nulls beyond); oracle is
    // the explicit argmin spelling of the same pick
    "aj2_asof_fwd_tol" -> ((spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("ts_us"), $"value")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts_us", $"event_id", $"value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts_us", $"event_id".as("click_id"),
          $"value".as("click_value"))
      AsOfJoin.asof(purchases, clicks, keys = Seq("user_id"), tsCol = "ts_us",
        rightCols = Seq("click_id", "click_value"),
        direction = "forward", tolerance = Some(600000000L))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // G1 — cube: all grouping-set rollups in one pass
    "g1_cube" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // G6 — explicit GROUPING SETS (the general form cube/rollup
    // specialize): two single-column rollups + grand total in one
    // pass, grouping() flags disambiguating real NULL keys from
    // superaggregate rows; SQL-text face (the DataFrame API exposes
    // only cube/rollup), same exact-sum discipline
    "g6_grouping_sets" -> ((spark, dir) => {
      Tables.orders(spark, dir).createOrReplaceTempView("g6_orders")
      spark.sql(
        """SELECT o_orderpriority, o_orderstatus,
          |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
          |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
          |  COUNT(*) AS cnt,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
          |FROM g6_orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY g_pri, g_st, o_orderpriority ASC NULLS FIRST,
          |  o_orderstatus ASC NULLS FIRST""".stripMargin)
    }),

    // G2 — pivot: priorities to columns, exact sums
    "g2_pivot" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(dsum($"o_totalprice"))
        .orderBy($"o_orderstatus")
    }),

    // I1/I2 — set intersect / except (distinct semantics both engines)
    "i1_intersect" -> ((spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .orderBy($"o_custkey")
    }),
    "i2_except" -> ((spark, dir) => {
      import spark.implicits._
      val o = Tables.orders(spark, dir)
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .except(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .orderBy($"o_custkey")
    }),

    // A10 — sketch aggregates for 100 TB profiling: HLL distinct counts
    // and approximate quantiles replace exact distinct/percentile scans.
    // Oracle-gated: the exact distinct counts are verified by DuckDB
    // directly, and the sketch outputs are gated as within-bounds flags
    // (sketch internals are engine-specific; DuckDB asserts the flags'
    // expected value, SketchSpec asserts the bounds analytically)
    "a10_sketches" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir).agg(
          countDistinct($"l_partkey").as("nd_partkey"),
          countDistinct($"l_orderkey").as("nd_orderkey"),
          approx_count_distinct($"l_partkey").as("hll_pk"),
          approx_count_distinct($"l_orderkey").as("hll_ok"),
          percentile_approx($"l_extendedprice", lit(0.5), lit(10000)).as("p50"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
        .select($"nd_partkey", $"nd_orderkey",
          ($"hll_pk" >= $"nd_partkey" * 0.9 && $"hll_pk" <= $"nd_partkey" * 1.1)
            .cast("int").as("hll_partkey_within_10pct"),
          ($"hll_ok" >= $"nd_orderkey" * 0.9 && $"hll_ok" <= $"nd_orderkey" * 1.1)
            .cast("int").as("hll_orderkey_within_10pct"),
          (abs($"p50" - $"p50_exact") <= abs($"p50_exact") * 0.01)
            .cast("int").as("p50_within_1pct"))
    }),

    // A12 — per-GROUP sketch profile: distinct-cardinality per segment
    // is the standard 100 TB profiling query; exact counts oracled
    // directly, HLL gated as a bound flag (same contract as a10)
    "a12_group_sketches" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir).groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("nd_partkey"),
          approx_count_distinct($"l_partkey").as("hll_pk"))
        .select($"l_returnflag", $"nd_partkey",
          ($"hll_pk" >= $"nd_partkey" * 0.9 && $"hll_pk" <= $"nd_partkey" * 1.1)
            .cast("int").as("hll_within_10pct"))
        .orderBy($"l_returnflag")
    }),

    // X4 — temp-view + SQL-text entry point (the reference registers a
    // view but never queries it; we expose the full surface)
    "x4_temp_view_sql" -> ((spark, dir) => {
      Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
      spark.sql(
        """SELECT o_orderstatus, COUNT(*) AS cnt FROM orders_v
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),

    // R1 — seeded bernoulli sample. Exact membership is engine-specific
    // RNG, so (like a10's sketches) the gate is the operator's testable
    // CONTRACT as flags DuckDB asserts: (a) same seed ⇒ identical
    // sample across two independent plan instantiations (count AND
    // membership, via an order-free keyset sum); (b) the kept count
    // sits within 5 standard deviations of Binomial(N, 0.3) — computed
    // from N, so the gate holds at any SF. Raw sampled rows stay
    // spec-covered (SamplingSpec).
    "r1_sample" -> ((spark, dir) => {
      import spark.implicits._
      def samp() = Tables.orders(spark, dir)
        .sample(withReplacement = false, 0.3, 42)
        .agg(count(lit(1)).as("n"), sum($"o_orderkey").as("keysum"))
      val total = Tables.orders(spark, dir).agg(count(lit(1)).as("total"))
      samp().crossJoin(samp().select($"n".as("n2"), $"keysum".as("keysum2")))
        .crossJoin(total)
        .select(
          ($"n" === $"n2" && $"keysum" === $"keysum2")
            .cast("int").as("seed_deterministic"),
          (abs($"n" - $"total" * 0.3) <=
            lit(5.0) * sqrt($"total" * lit(0.3 * 0.7)))
            .cast("int").as("count_within_5sd"))
    }),

    // R3 — deterministic hash-gate sample (oracle-exact: the keep/drop
    // decision is a pure function of the key, identical in any engine —
    // the sampling primitive that survives repartitioning at 100 TB)
    "r3_hash_sample" -> ((spark, dir) => {
      import spark.implicits._
      Sampling.hashSample(Tables.orders(spark, dir), "o_orderkey", 0.3)
        .select($"o_orderkey", $"o_orderstatus")
        .orderBy($"o_orderkey")
    }),

    // R4 — stratified hash-gate sample (deterministic sampleBy: rebalance
    // classes in one codegen'd filter, no per-stratum passes)
    "r4_stratified_sample" -> ((spark, dir) => {
      import spark.implicits._
      Sampling.stratifiedHashSample(Tables.orders(spark, dir),
        "o_orderkey", "o_orderstatus", Map("F" -> 0.5, "O" -> 0.1, "P" -> 1.0))
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("kept"))
        .orderBy($"o_orderstatus")
    }),

    // A11 — argmax-per-group WITHOUT a window: max over a comparison
    // struct aggregates with map-side partials, so each partition sends
    // ONE row per key through the shuffle — a window row_number ships
    // every row. (Struct max plans as SortAggregate — variable-width
    // buffer — but the partial combine is what matters at 100 TB.)
    // Lexicographic struct compare gives a deterministic tie-break.
    "a11_argmax" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .groupBy($"o_custkey")
        .agg(max(struct($"o_totalprice", $"o_orderkey")).as("m"))
        .select($"o_custkey", $"m.o_totalprice".as("best_price"),
          $"m.o_orderkey".as("best_order"))
        .orderBy($"o_custkey")
    }),

    // W3 — distribution window functions: ntile bucketing, percent_rank,
    // cume_dist. Order is tie-broken by the unique key so every function
    // is deterministic; the ratios are single IEEE divisions of exact
    // ints, identical in any engine (no rounding needed).
    "w3_distribution" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(spark, dir).select(
        $"c_custkey", $"c_mktsegment", $"c_acctbal",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
        .orderBy($"c_mktsegment", $"c_acctbal".desc, $"c_custkey")
    }),

    // G3 — unpivot/melt: wide metric columns to long (metric, value)
    // rows — the normalization step before per-metric aggregation. A
    // pure projection+generate (no shuffle); the oracle is the UNION ALL
    // spelling of the same relation.
    "g3_unpivot" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
          "metric", "value")
        .orderBy($"l_orderkey", $"l_linenumber", $"metric")
    }),

    // MU1 — MERGE/upsert: a CDC batch (deterministically derived — key%100
    // rows repriced ×2, key%500 rows reinserted under shifted keys)
    // overlays the base table. ×2 is an exact IEEE scaling, so values
    // hash-match any engine.
    "mu1_merge_upsert" -> ((spark, dir) => {
      import spark.implicits._
      val base = Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val updates = base.filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey", lit("U").as("o_orderstatus"),
          ($"o_totalprice" * 2).as("o_totalprice"))
        .unionByName(base.filter($"o_orderkey" % 500 === 0)
          .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), lit(1.0).as("o_totalprice")))
      Warehouse.upsert(base, updates, Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    }),

    // SC1 — SCD2 interval derivation over the event stream: per-user
    // event_type changes become [valid_from, valid_to) rows; micros
    // longs + event_id tiebreak keep the ordering engine-exact
    "sc1_scd2" -> ((spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"event_type")
      Warehouse.scd2(ev, keys = Seq("user_id"), tsCol = "ts_us",
        orderCols = Seq($"ts_us", $"event_id"), stateCol = "event_type")
        .select($"user_id", $"event_type", $"valid_from", $"valid_to", $"is_current")
        // event_type tiebreak: two changes at one microsecond would tie
        // (user_id, valid_from) — the oracle rule wants total order
        .orderBy($"user_id", $"valid_from", $"event_type")
    }),

    // O3b — top-k per group: rank window + filter. The mixed-direction
    // order (desc bal, asc key) keeps this OUT of both rewrite rules
    // (argmax claims k=1, TopKWindowToAggregate claims uniform-direction
    // k<=128), so the gate exercises the plain window path. Unique-key
    // tiebreak makes every rank deterministic.
    "o3_group_topk" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"c_mktsegment", $"rn", $"c_custkey", $"c_acctbal")
        .orderBy($"c_mktsegment", $"rn")
    }),

    // O4b — top-k per group WITHOUT a window: the TopKStructs
    // TypedImperativeAggregate caps partial buffers at k rows per group
    // per partition (see GroupTopK); must equal the rank-window spelling
    // the oracle uses
    "o4_group_topk_agg" -> ((spark, dir) => {
      import spark.implicits._
      GroupTopK.topKPerGroup(
        Tables.customer(spark, dir).select($"c_mktsegment", $"c_acctbal", $"c_custkey"),
        keys = Seq("c_mktsegment"), sortCols = Seq("c_acctbal", "c_custkey"),
        k = 3, descending = true)
        .orderBy($"c_mktsegment", $"rn")
    }),

    // J5 — null-safe equi-join (<=>): null keys match each other (the
    // CDC/SCD key-matching semantics a plain equi-join silently drops);
    // still a hash-joinable equi-key in Spark, so no plan degradation
    "j5_nullsafe_join" -> ((spark, dir) => {
      import spark.implicits._
      val a = customerNulls(spark, dir).select($"c_custkey".as("a_key"), $"seg".as("a_seg"))
      val b = customerNulls(spark, dir).select($"c_custkey".as("b_key"), $"seg".as("b_seg"))
      a.join(b, $"a_seg" <=> $"b_seg")
        .groupBy($"a_seg").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"a_seg".asc_nulls_first)
    }),

    // E5 — schema'd JSON parse: from_json with an explicit schema stays
    // in codegen and yields one typed struct per row (e2's
    // get_json_object re-parses the document per extracted path)
    "e5_json_schema" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
      Tables.events(spark, dir)
        .select($"event_id",
          from_json($"props", StructType(Seq(StructField("k", IntegerType)))).as("p"))
        .select($"event_id", $"p.k".as("k_val"))
        .orderBy($"event_id")
    })
  )

  // ------------------------------------------------------------------ oracle

  def oracle: Map[String, String] = Map(
    "p1_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f3_filter_in" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus IN ('F','P')
        |ORDER BY o_orderkey""".stripMargin,

    "f6_regex_validate" ->
      """SELECT lang,
        |  CASE WHEN regexp_matches(lang, '^(en|fr)$') THEN 'valid' ELSE 'invalid' END AS lang_flag,
        |  COUNT(*) AS cnt
        |FROM documents GROUP BY 1, 2 ORDER BY lang""".stripMargin,

    "d1_dup_window" ->
      s"""WITH $dupWindowSql
         |SELECT * FROM dw ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "d2_dup_profile" ->
      s"""WITH $dupWindowSql
         |SELECT occur_id, COUNT(*) AS cnt FROM dw GROUP BY occur_id ORDER BY occur_id""".stripMargin,

    "d3_reconcile" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS total_rows FROM lineitem""",

    "d4_dedup_filter" ->
      s"""WITH $dupWindowSql
         |SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber
         |FROM dw WHERE occur_id <= 1 ORDER BY l_partkey, l_suppkey""".stripMargin,

    "d6_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "f8_empty_vs_null" ->
      s"""WITH $customerNullsSql,
         |cn2 AS (SELECT c_custkey, bal,
         |    CASE WHEN c_custkey % 7 = 0 THEN '' ELSE seg END AS seg FROM cn)
         |SELECT COUNT(CASE WHEN seg = '' THEN 1 END) AS n_empty,
         |  COUNT(CASE WHEN seg IS NULL THEN 1 END) AS n_null,
         |  COUNT(CASE WHEN seg IS NOT NULL AND seg <> '' THEN 1 END) AS n_value
         |FROM cn2""".stripMargin,

    "n1_null_census" ->
      s"""WITH $customerNullsSql
         |SELECT COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS c_custkey,
         |       COUNT(CASE WHEN bal IS NULL THEN 1 END) AS bal,
         |       COUNT(CASE WHEN seg IS NULL THEN 1 END) AS seg
         |FROM cn""".stripMargin,

    "n2_null_rows" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey FROM cn
         |WHERE c_custkey IS NULL OR bal IS NULL OR seg IS NULL
         |ORDER BY c_custkey""".stripMargin,

    "n4_dropna" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey FROM cn
         |WHERE c_custkey IS NOT NULL AND bal IS NOT NULL AND seg IS NOT NULL
         |ORDER BY c_custkey""".stripMargin,

    "n3_dropall_subset" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey FROM cn
         |WHERE NOT (bal IS NULL AND seg IS NULL)
         |ORDER BY c_custkey""".stripMargin,

    "n5_drop_subset" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey FROM cn WHERE bal IS NOT NULL
         |ORDER BY c_custkey""".stripMargin,

    "c10_relabel" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'Good Loan' ELSE 'Bad Loan' END AS label
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "n6_fillna" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey, COALESCE(bal, 0.0) AS bal, COALESCE(seg, 'UNKNOWN') AS seg
         |FROM cn ORDER BY c_custkey""".stripMargin,

    "n8_impute_mean" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey,
         |  COALESCE(bal,
         |    (SELECT CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(bal) AS DOUBLE) FROM cn)
         |  ) AS bal
         |FROM cn ORDER BY c_custkey""".stripMargin,

    // quantile_disc picks the element at rank ceil(n/2) — an actual
    // data value, so the compare is exact with no float arithmetic
    "n9_impute_median" ->
      s"""WITH $customerNullsSql
         |SELECT c_custkey,
         |  COALESCE(bal,
         |    (SELECT quantile_disc(bal, 0.5) FROM cn WHERE seg IS NOT NULL)
         |  ) AS bal
         |FROM cn ORDER BY c_custkey""".stripMargin,

    "n10_group_census" ->
      """SELECT c_mktsegment, COUNT(*) AS cnt,
        |  CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE) AS percent
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY cnt DESC, c_mktsegment""".stripMargin,

    "a6_minmax" ->
      """SELECT MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        |  COUNT(*) AS n FROM orders""".stripMargin,

    "a7_describe" -> Profiler.describeExactSql("orders", "o_totalprice"),

    "a8_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",

    "w1_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
        |  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        |FROM customer ORDER BY c_mktsegment, rn""".stripMargin,

    "o2_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "u1_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,

    "c1_regex_clean" ->
      """SELECT p_partkey,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_u,
        |  COALESCE(regexp_extract(p_brand, '([0-9]+)', 1), '') AS brand_num
        |FROM part ORDER BY p_partkey""".stripMargin,

    "c14_html_strip" -> {
      // identical regex chain (RE2-safe: no lookahead) + identical
      // literal-replace order as Cleansers.stripHtml
      val entities = Cleansers.HtmlEntities.foldLeft("t3") {
        case (acc, (from, to)) =>
          s"replace($acc, '${from.replace("'", "''")}', '${to.replace("'", "''")}')"
      }
      s"""WITH h AS (SELECT doc_id,
         |  '<html><head><script type="text/javascript">var x = 1 < 2;</script><style>p { color: red; }</style></head><body><p>'
         |  || text ||
         |  '</p><div class="f">Tom &amp; Jerry &lt;3&gt; &quot;hi&quot; it&#39;s&nbsp;here</div></body></html>' AS html
         |FROM documents),
         |s AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(html,
         |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |    '<[^>]*>', ' ', 'g') AS t3
         |FROM h)
         |SELECT doc_id, trim(regexp_replace($entities, '\\s+', ' ', 'g')) AS text
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "c7_month_token" ->
      """SELECT o_orderkey, split_part(o_orderpriority, '-', 1) AS priority_code
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "c8_term_parse" ->
      """SELECT p_partkey,
        |  CAST(replace(' ' || CAST(p_size AS VARCHAR) || ' months', 'months', '') AS DOUBLE) AS term
        |FROM part ORDER BY p_partkey""".stripMargin,

    "c9_normalize" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN (SELECT MAX(o_totalprice) FROM orders) = (SELECT MIN(o_totalprice) FROM orders)
        |       THEN 0.0
        |       ELSE (o_totalprice - (SELECT MIN(o_totalprice) FROM orders))
        |            / ((SELECT MAX(o_totalprice) FROM orders) - (SELECT MIN(o_totalprice) FROM orders))
        |  END AS o_totalprice_norm
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "j1_join_broadcast" ->
      s"""SELECT r_name, COUNT(*) AS n_cust, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "j2_join_shuffle" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_items,
         |  ${sqlDsumDisc("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "j3_join_anti" ->
      """WITH cust AS (
        |  SELECT c_custkey FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 100000000 AS c_custkey FROM customer
        |  WHERE c_custkey % 97 = 0)
        |SELECT c_custkey FROM cust
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j4_join_semi" ->
      """WITH cust AS (
        |  SELECT c_custkey FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 100000000 AS c_custkey FROM customer
        |  WHERE c_custkey % 97 = 0)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_active,
        |  CAST(SUM(c_custkey) AS BIGINT) AS key_sum
        |FROM cust
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "e1_event_windows" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
         |  COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "e2_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val, COUNT(*) AS cnt
        |FROM events GROUP BY k_val ORDER BY k_val""".stripMargin,

    "e5_json_schema" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,

    "j5_nullsafe_join" ->
      s"""WITH $customerNullsSql
         |SELECT a.seg AS a_seg, COUNT(*) AS n_pairs
         |FROM cn a JOIN cn b ON a.seg IS NOT DISTINCT FROM b.seg
         |GROUP BY a.seg ORDER BY a_seg NULLS FIRST""".stripMargin,

    "o3_group_topk" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "o4_group_topk_agg" ->
      """SELECT c_mktsegment, CAST(rn AS INTEGER) AS rn, c_acctbal, c_custkey FROM (
        |  SELECT c_mktsegment, c_acctbal, c_custkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |  FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "x4_temp_view_sql" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "e4_session_windows" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |marked AS (SELECT user_id, us,
        |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM ev),
        |sess AS (SELECT user_id, us,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(us) AS start_us,
        |  MAX(us) + 1800000000 AS end_us, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,

    "rj1_range_join" ->
      """WITH ev AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
        |SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(b.us - a.us) <= 600000000
        |ORDER BY a.user_id, a_id, b_id""".stripMargin,

    // explicit argmax rather than DuckDB's native ASOF JOIN: among clicks
    // tied at equal (user_id, c_ts), native ASOF picks arbitrarily while
    // the Spark side (AsOfJoin.scala) deterministically carries the
    // greatest (click_id, click_value) struct — spell that pick out here
    "aj1_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
        |p AS (SELECT user_id, ts_us, event_id, value FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS c_ts, event_id AS click_id, value AS click_value
        |      FROM ev WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.ts_us, p.event_id, p.value,
        |             c.click_id, c.click_value,
        |             ROW_NUMBER() OVER (PARTITION BY p.event_id
        |               ORDER BY c.c_ts DESC, c.click_id DESC, c.click_value DESC) AS rn
        |      FROM p LEFT JOIN c
        |        ON p.user_id = c.user_id AND c.c_ts <= p.ts_us)
        |SELECT user_id, ts_us, event_id, value,
        |       click_id AS r_click_id, click_value AS r_click_value
        |FROM j WHERE rn = 1
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "a14_covariance" ->
      """WITH s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(o_custkey AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_custkey AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(CAST(o_custkey AS DECIMAL(18,2)) * CAST(o_custkey AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS DOUBLE) AS syy
        |  FROM orders)
        |SELECT CAST(n AS BIGINT) AS n,
        |  (sxy - sx * sy / n) / (n - 1.0) AS covar,
        |  (sxy - sx * sy / n) /
        |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr
        |FROM s""".stripMargin,

    "h1_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 AS bucket,
        |  COUNT(*) AS cnt
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "ts1_resample_locf" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    event_id, value FROM events),
        |b AS (SELECT user_id, MIN(ts_us) AS lo, MAX(ts_us) AS hi
        |      FROM ev GROUP BY user_id),
        |grid AS (SELECT b.user_id, g.t AS ts_us FROM b CROSS JOIN LATERAL
        |  (SELECT unnest(generate_series((lo // 3600000000) * 3600000000,
        |                                 ((hi + 3599999999) // 3600000000) * 3600000000,
        |                                 3600000000)) AS t) g),
        |j AS (SELECT grid.user_id, grid.ts_us, ev.event_id, ev.value,
        |        ROW_NUMBER() OVER (PARTITION BY grid.user_id, grid.ts_us
        |          ORDER BY ev.ts_us DESC, ev.event_id DESC) AS rn
        |      FROM grid LEFT JOIN ev
        |        ON grid.user_id = ev.user_id AND ev.ts_us <= grid.ts_us)
        |SELECT user_id, ts_us, event_id AS r_event_id, value AS r_value
        |FROM j WHERE rn = 1
        |ORDER BY user_id, ts_us""".stripMargin,

    "aj2_asof_fwd_tol" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
        |p AS (SELECT user_id, ts_us, event_id, value FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us AS c_ts, event_id AS click_id, value AS click_value
        |      FROM ev WHERE event_type = 'click'),
        |j AS (SELECT p.user_id, p.ts_us, p.event_id, p.value,
        |             c.click_id, c.click_value,
        |             ROW_NUMBER() OVER (PARTITION BY p.event_id
        |               ORDER BY c.c_ts ASC, c.click_id DESC, c.click_value DESC) AS rn
        |      FROM p LEFT JOIN c
        |        ON p.user_id = c.user_id
        |       AND c.c_ts >= p.ts_us AND c.c_ts <= p.ts_us + 600000000)
        |SELECT user_id, ts_us, event_id, value,
        |       click_id AS r_click_id, click_value AS r_click_value
        |FROM j WHERE rn = 1
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "g1_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "g6_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_pri,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_pri, g_st, o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,

    "g2_pivot" ->
      s"""SELECT o_orderstatus,
         |  ${sqlDsum("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS "1-URGENT",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END")} AS "2-HIGH",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END")} AS "3-MEDIUM",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END")} AS "4-NOT SPECIFIED",
         |  ${sqlDsum("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END")} AS "5-LOW"
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "i1_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "i2_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    // exact distinct counts verified directly; the sketch columns are
    // gated as bound flags whose expected value DuckDB asserts
    "a10_sketches" ->
      """SELECT COUNT(DISTINCT l_partkey) AS nd_partkey,
        |  COUNT(DISTINCT l_orderkey) AS nd_orderkey,
        |  1 AS hll_partkey_within_10pct,
        |  1 AS hll_orderkey_within_10pct,
        |  1 AS p50_within_1pct
        |FROM lineitem""".stripMargin,

    "a12_group_sketches" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_partkey,
        |  1 AS hll_within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "r3_hash_sample" ->
      s"""SELECT o_orderkey, o_orderstatus FROM orders
         |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) < '${Sampling.thresholdToken(0.3)}'
         |ORDER BY o_orderkey""".stripMargin,

    "r4_stratified_sample" ->
      s"""SELECT o_orderstatus, COUNT(*) AS kept FROM orders
         |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) <
         |  CASE o_orderstatus
         |    WHEN 'F' THEN '${Sampling.thresholdToken(0.5)}'
         |    WHEN 'O' THEN '${Sampling.thresholdToken(0.1)}'
         |    WHEN 'P' THEN '${Sampling.thresholdToken(1.0)}'
         |    ELSE '${Sampling.thresholdToken(0.0)}' END
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a11_argmax" ->
      """SELECT o_custkey,
        |  (max(struct_pack(p := o_totalprice, k := o_orderkey))).p AS best_price,
        |  (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS best_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "w3_distribution" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  NTILE(4) OVER w AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal DESC, c_custkey""".stripMargin,

    "g3_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "mu1_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', 1.0 FROM base WHERE o_orderkey % 500 = 0)
        |SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL SELECT * FROM upd
        |ORDER BY o_orderkey""".stripMargin,

    "sc1_scd2" ->
      """WITH ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    event_id, event_type FROM events),
        |ch AS (SELECT *, LAG(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM ev),
        |c2 AS (SELECT user_id, ts_us, event_id, event_type FROM ch
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts_us AS valid_from,
        |  LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to,
        |  LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL AS is_current
        |FROM c2 ORDER BY user_id, valid_from, event_type""".stripMargin,

    "w2_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |  LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |  LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "k1_salted_agg" ->
      s"""SELECT l_returnflag, COUNT(*) AS cnt,
         |  ${sqlDsum("l_extendedprice")} AS sum_l_extendedprice
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // the salt is an execution detail — semantics are the plain join
    "k2_salted_join" ->
      """SELECT l_partkey, l_orderkey, l_linenumber, l_quantity, p_name
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // exact sample membership is engine-specific RNG; the flags state
    // the seeded-sample contract DuckDB asserts (a10-style flag gate)
    "r1_sample" ->
      "SELECT 1 AS seed_deterministic, 1 AS count_within_5sd"
  )
}
