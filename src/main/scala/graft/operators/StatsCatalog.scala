package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistics / time-series / fuzzy-matching operators (round-3 widening
  * of SURVEY.md §2.5–§2.7 "beyond reference" coverage), each with a
  * DuckDB oracle twin. Float discipline per [[Exact]]: decimal-routed
  * window sums, identical IEEE assembly, index-ordered folds, rounded
  * interpolated percentiles.
  */
object StatsCatalog {
  import Exact._

  /** Shared events projection: epoch-micros + the unique event_id
    * tiebreak that makes every per-key order total (null values carry
    * no fold/frame position — excluded on both engines).
    */
  private def ev(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"value")
      .filter($"user_id".isNotNull && $"value".isNotNull)
  }
  private val evSql =
    """ev AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  event_id, CAST(value AS DOUBLE) AS value
      | FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A13 — exact interpolated percentiles per group. `percentile` keeps
    // a per-group counts map (bounded by the column's distinct values —
    // fine for metric columns; unbounded-cardinality columns belong to
    // the a10 sketch path). Rounded at 6dp: Spark interpolates
    // lower+(upper-lower)*frac, DuckDB lower*(1-frac)+upper*frac — same
    // value, different last-ulp arithmetic.
    "a13_percentile" -> ((spark, dir) => {
      import spark.implicits._
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(
          round(percentile($"l_quantity", lit(0.25)), 6).as("p25"),
          round(percentile($"l_quantity", lit(0.5)), 6).as("p50"),
          round(percentile($"l_quantity", lit(0.75)), 6).as("p75"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // A15 — order-insensitive collect: collect_set is shuffle-order-
    // nondeterministic, so it is only oracle-able (or production-safe)
    // canonicalized — sort_array + join to one string
    "a15_collect_agg" -> ((spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir)
        .groupBy($"c_nationkey")
        .agg(
          concat_ws(",", sort_array(collect_set($"c_mktsegment"))).as("segments"),
          count(lit(1)).as("n"))
        .orderBy($"c_nationkey")
    }),

    // W4 — rolling row-frame aggregates (ROWS BETWEEN 3 PRECEDING AND
    // CURRENT ROW): decimal-exact frame sums; avg assembled as the same
    // two-double division on both engines
    "w4_rolling" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(-3, Window.currentRow)
      ev(spark, dir).select(
        $"user_id", $"ts_us", $"event_id",
        sum(dec($"value")).over(w).cast("double").as("roll_sum"),
        (sum(dec($"value")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("roll_avg"))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // TS2 — recursive EWMA per key (secondary-sort fold, see Ewma):
    // bit-exact vs DuckDB list_reduce because both fold the same values
    // in the same total order with the same IEEE ops (alpha = 0.25 so
    // alpha and 1-alpha are both exactly representable)
    "ts2_ewma" -> ((spark, dir) => {
      import spark.implicits._
      Ewma.ewmaLast(ev(spark, dir), "user_id", "value",
        orderCols = Seq("ts_us", "event_id"), alpha = 0.25)
        .orderBy($"user_id")
    }),

    // FZ1 — blocked edit-distance pairs (entity resolution): nationkey
    // as the block key bounds the quadratic Levenshtein stage
    "fz1_fuzzy_pairs" -> ((spark, dir) => {
      import spark.implicits._
      Fuzzy.blockedEditDistancePairs(
        Tables.customer(spark, dir).select($"c_custkey", $"c_name", $"c_nationkey"),
        idCol = "c_custkey", textCol = "c_name",
        blockCols = Seq("c_nationkey"), maxDist = 2)
        .orderBy($"a_id", $"b_id")
    }),

    // A16 — exact skewness / excess kurtosis per group. Power sums run
    // over the INTEGER-scaled value y = 100·x at decimal scale 0:
    // standardized moments are scale-invariant, and scale-0 sums make
    // the final decimal→double cast a SINGLE rounding on both engines —
    // a fractional-scale decimal whose scaled integer exceeds 2^53
    // double-rounds in DuckDB (int128→double, then ÷10^s) and came out
    // ~24 ulps off Spark's correctly-rounded BigDecimal cast (measured).
    // ^1.5 is spelled v*sqrt(v): sqrt is correctly rounded everywhere,
    // pow is not (a14's discipline, extended).
    "a16_moments" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      val y = ($"l_quantity".cast(DecimalType(8, 2)) * lit(100)).cast(DecimalType(10, 0))
      val y2 = (y * y).cast(DecimalType(14, 0))
      val y3 = (y2 * y).cast(DecimalType(18, 0))
      val y4 = (y3 * y).cast(DecimalType(20, 0))
      val agged = Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("nD"),
          sum(y).cast("double").as("sx"),
          sum(y2).cast("double").as("sx2"),
          sum(y3).cast("double").as("sx3"),
          sum(y4).cast("double").as("sx4"))
      val m1 = $"sx" / $"nD"
      val s2 = $"sx2" / $"nD"
      val s3 = $"sx3" / $"nD"
      val s4 = $"sx4" / $"nD"
      val v = s2 - m1 * m1
      agged.select(
        $"l_returnflag",
        $"nD".cast("long").as("n"),
        ((s3 - lit(3.0) * m1 * s2 + lit(2.0) * m1 * m1 * m1) /
          (v * sqrt(v))).as("skewness"),
        ((s4 - lit(4.0) * m1 * s3 + lit(6.0) * m1 * m1 * s2
          - lit(3.0) * m1 * m1 * m1 * m1) / (v * v) - lit(3.0)).as("kurtosis"))
        .orderBy($"l_returnflag")
    }),

    // R5 — leakage-safe train/holdout split at GROUP granularity: the
    // md5 hash-gate keys on user_id, so every event of a user lands in
    // the same split (row-level seeded sampling would leak users across
    // the boundary); deterministic under repartitioning and engine swap
    "r5_group_split" -> ((spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .filter($"user_id".isNotNull)
        .withColumn("split",
          when(Sampling.hashGate($"user_id", 0.8), "train").otherwise("test"))
        .groupBy($"split")
        .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n_events"))
        .orderBy($"split")
    }),

    // A17 — weighted average (the aggregation min-max/mean profiling
    // misses): decimal-exact numerator and denominator, one double
    // division
    "a17_weighted_avg" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      Tables.lineitem(spark, dir)
        .groupBy($"l_returnflag")
        .agg(
          (sum((dec($"l_quantity") * dec($"l_extendedprice")).cast(DecimalType(30, 4)))
            .cast("double") /
            sum(dec($"l_extendedprice")).cast("double")).as("wavg_qty"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    }),

    // H2 — equi-depth histogram via ntile: unlike h1's fixed-width
    // buckets, depth buckets track the distribution; the unique-key
    // tiebreak makes every bucket assignment total-order deterministic.
    // The global (unpartitioned) window is a single-task sort — correct
    // for the profiling use (a bounded sample/summary input); the 100 TB
    // spelling derives cutpoints from percentile_approx (a10's sketch
    // path) and bucket-joins them, trading exact depths for parallelism
    "h2_equidepth" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy($"o_totalprice", $"o_orderkey")
      Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_totalprice", ntile(10).over(w).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("cnt"),
          min($"o_totalprice").as("lo"), max($"o_totalprice").as("hi"))
        .orderBy($"bucket")
    }),

    // O5 — per-group head (first k rows in key order): spelled as the
    // rank-window idiom, but the UNIFORM-direction order makes it
    // eligible for the TopKWindowToAggregate rewrite, so this gate runs
    // the k-bounded aggregate path under the oracle (the way d4 runs
    // under the argmax rule); o3 keeps the un-rewritten window path
    "o5_group_head" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
      Tables.customer(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .select($"c_mktsegment", $"rn", $"c_custkey", $"c_acctbal")
        .orderBy($"c_mktsegment", $"rn")
    }),

    // EP1 — per-group Shannon entropy (nats) of a categorical column
    // (data-profiling signal: key skew / label balance). Per-term
    // -p·ln(p) is quantized to int64 before the sum (t9's discipline —
    // double sums are merge-order-dependent, quantized sums are exact)
    "ep1_entropy" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val n = Window.partitionBy($"o_orderpriority")
      Tables.orders(spark, dir)
        .groupBy($"o_orderpriority", $"o_orderstatus").agg(count(lit(1)).as("c"))
        .withColumn("p", $"c".cast("double") / sum($"c").over(n).cast("double"))
        .withColumn("tq", floor(-($"p" * log($"p")) * lit(1000000.0)).cast("long"))
        .groupBy($"o_orderpriority")
        .agg((sum($"tq").cast("double") / lit(1000000.0)).as("entropy_nats"),
          count(lit(1)).as("n_values"))
        .orderBy($"o_orderpriority")
    }),

    // SQ1 — funnel stage per user (signup→click→purchase as an in-order
    // subsequence, anything in between): one-pass state machine
    // (Sequences), never materializing per-user paths. The oracle
    // spells the same subsequence test as LIKE '%s%c%p%' over an
    // ordered path string — sound because no fixture event type is a
    // substring of another
    "sq1_funnel" -> ((spark, dir) => {
      import spark.implicits._
      val typed = Tables.events(spark, dir)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id", $"event_type")
      Sequences.funnelStages(typed, "user_id", "event_type",
        orderCols = Seq("ts_us", "event_id"),
        steps = Seq("signup", "click", "purchase"))
        .orderBy($"user_id")
    }),

    // RS1 — robust scaling by discrete per-group quantiles (rank
    // ceil(q·n) — an actual data value, engine-exact; vs a13's
    // interpolated percentiles which need rounding)
    "rs1_robust_scale" -> ((spark, dir) => {
      import spark.implicits._
      RobustScale.robustScale(
        Tables.customer(spark, dir).select($"c_custkey", $"c_mktsegment", $"c_acctbal"),
        keyCols = Seq("c_mktsegment"), valueCol = "c_acctbal",
        tiebreakCols = Seq("c_custkey"))
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal", $"scaled")
        .orderBy($"c_custkey")
    }),

    // C10 — calendar breakdown (the date-part family the reference
    // skipped by keeping dates as strings): year/quarter/month/day plus
    // ISO weekday — Spark's dayofweek is 1=Sunday, so both engines
    // spell Monday=1..Sunday=7 explicitly (DuckDB via isodow)
    "c10_calendar" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir).select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        ((dayofweek($"o_orderdate") + lit(5)) % lit(7) + lit(1)).as("iso_dow"))
        .orderBy($"o_orderkey")
    }),

    // SD1 — snapshot diff (CDC changeset between two full snapshots):
    // old = customer; new = customer with %10 keys deleted, %7 balances
    // bumped (updates), and %100 keys re-inserted under offset ids —
    // a deterministic fixture-derived pair both engines can build
    "sd1_snapshot_diff" -> ((spark, dir) => {
      import spark.implicits._
      val old = Tables.customer(spark, dir).select($"c_custkey", $"c_acctbal")
      val neu = Tables.customer(spark, dir)
        .filter($"c_custkey" % 10 =!= 0)
        .select($"c_custkey",
          when($"c_custkey" % 7 === 0, $"c_acctbal" + lit(10.0))
            .otherwise($"c_acctbal").as("c_acctbal"))
        .unionAll(Tables.customer(spark, dir)
          .filter($"c_custkey" % 100 === 0)
          .select(($"c_custkey" + lit(1000000L)).as("c_custkey"),
            lit(0.0).as("c_acctbal")))
      Warehouse.snapshotDiff(old, neu, keys = Seq("c_custkey"),
        compareCols = Seq("c_acctbal"))
        .orderBy($"c_custkey")
    }),

    // G5 — rollup: the hierarchical subset of cube (prefix groupings
    // only — (a,b), (a), ()): same exact-sum + nulls-first discipline
    // as g1_cube
    "g5_rollup" -> ((spark, dir) => {
      import spark.implicits._
      Tables.orders(spark, dir)
        .rollup($"o_orderpriority", $"o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum($"o_totalprice").as("sum_price"))
        .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
    }),

    // I3 — set union (UNION DISTINCT): the dedup-across-sources shape;
    // u1 keeps bag semantics, this one collapses
    "i3_union_set" -> ((spark, dir) => {
      import spark.implicits._
      val hi = Tables.orders(spark, dir).filter($"o_totalprice" > 300000.0)
        .select($"o_custkey")
      val urgent = Tables.orders(spark, dir).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      hi.union(urgent).distinct().orderBy($"o_custkey")
    }),

    // C12b — string-function suite in one projection (upper/lower/trim/
    // lpad/substring/replace/concat/length — the cleansing vocabulary
    // beyond regex): every function ASCII-safe by the fixture guards
    "c12_string_suite" -> ((spark, dir) => {
      import spark.implicits._
      Tables.customer(spark, dir).select(
        $"c_custkey",
        upper($"c_mktsegment").as("seg_up"),
        lower($"c_name").as("name_lo"),
        trim(concat(lit("  "), $"c_mktsegment", lit(" "))).as("seg_trim"),
        lpad($"c_custkey".cast("string"), 10, "0").as("key_pad"),
        substring($"c_name", 1, 8).as("name_head"),
        regexp_replace($"c_name", "Customer", "Cust").as("name_short"),
        length($"c_name").cast("int").as("name_len"))
        .orderBy($"c_custkey")
    }),

    // CJ1 — explicit cross join (the one join shape the taxonomy still
    // lacked): dimension × dimension only — a cross join is broadcastable
    // by definition or it should not exist; Spark requires the explicit
    // crossJoin call, which is the right API friction at 100 TB
    "cj1_cross" -> ((spark, dir) => {
      import spark.implicits._
      Tables.region(spark, dir).select($"r_regionkey")
        .crossJoin(Tables.nation(spark, dir).select($"n_nationkey", $"n_regionkey"))
        .select($"r_regionkey", $"n_nationkey",
          ($"r_regionkey" === $"n_regionkey").as("is_home"))
        .orderBy($"r_regionkey", $"n_nationkey")
    }),

    // W6 — first_value/last_value: navigation over explicit frames
    // (last_value needs the full-partition frame — the default frame
    // ends at CURRENT ROW and silently returns the current value)
    "w6_first_last" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev(spark, dir).select(
        $"user_id", $"ts_us", $"event_id",
        first($"value").over(w).as("first_v"),
        last($"value").over(wAll).as("last_v"))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // W5 — ratio-to-report (share of group total): decimal-exact window
    // sum, one double division — the percent-of-total idiom every
    // reporting layer needs
    "w5_share" -> ((spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderpriority")
      Tables.orders(spark, dir).select(
        $"o_orderkey", $"o_orderpriority",
        (dec($"o_totalprice").cast("double") /
          sum(dec($"o_totalprice")).over(w).cast("double")).as("share"))
        .orderBy($"o_orderkey")
    }),

    // G4 — dynamic pivot: values discovered via the documented bounded
    // driver collect (Pivots.dynamicPivot); output columns are the
    // discovered values themselves, so the oracle (which must name its
    // columns statically) spells out the fixture's status set {F,O,P} —
    // same convention as the IN-list oracles
    "g4_dynamic_pivot" -> ((spark, dir) => {
      import spark.implicits._
      Pivots.dynamicPivot(Tables.orders(spark, dir),
        groupCols = Seq("o_orderpriority"), pivotCol = "o_orderstatus",
        agg = dsum($"o_totalprice"))
        .orderBy($"o_orderpriority")
    }),

    // A18 — all-pairs correlation matrix from ONE aggregation pass
    // (a14's decimal-component discipline generalized to k columns)
    "a18_corr_matrix" -> ((spark, dir) => {
      import spark.implicits._
      CorrMatrix.corrMatrix(Tables.orders(spark, dir),
        Seq("o_totalprice", "o_custkey", "o_orderkey"))
        .orderBy($"col_x", $"col_y")
    }),

    // A19 — exact discrete quartiles PER GROUP: the keyed (scalable)
    // complement of the global single-partition rank gates — one
    // group-keyed shuffle, groups in parallel, integer ranks
    "a19_group_quartiles" -> ((spark, dir) => {
      import spark.implicits._
      GroupStats.groupQuartiles(
        Tables.documents(spark, dir), Seq("source"), "n_chars")
        .orderBy($"source")
    }),

    // A20 — per-column cardinality census: mergeable-HLL estimate
    // gated by the exact distinct count (v6-style audit contract)
    "a20_cardinality_profile" -> ((spark, dir) => {
      import spark.implicits._
      GroupStats.cardinalityProfile(
        Tables.documents(spark, dir), Seq("lang", "source", "doc_id"))
        // the HLL estimate itself is sketch-implementation-specific;
        // the gate compares the exact side and the tolerance verdict
        .select($"col_name", $"exact_nd", $"within_tol")
        .orderBy($"col_name")
    }),

    // OL1 — IQR (Tukey-fence) outlier report with discrete quartiles;
    // bounds broadcast back, verdicts in identical double arithmetic
    "ol1_iqr_outliers" -> ((spark, dir) => {
      import spark.implicits._
      Outliers.iqrOutliers(
        Tables.events(spark, dir)
          .select($"event_id", $"user_id", $"value"),
        "value", k = 1.5)
        .orderBy($"event_id")
    }),

    // DD1/DD2 — PSI distribution drift between order-year snapshots
    // (h1 bucketing + t9 quantized ln + ts2 index-ordered fold)
    "dd1_psi_profile" -> ((spark, dir) => {
      import spark.implicits._
      val (b, c) = psiSnapshots(spark, dir)
      Drift.psiProfile(b, c, "o_totalprice", nBuckets = 10)
        .orderBy($"bucket")
    }),

    "dd2_psi" -> ((spark, dir) => {
      val (b, c) = psiSnapshots(spark, dir)
      Drift.psi(b, c, "o_totalprice", nBuckets = 10)
    }),

    // DD4 — multi-column drift SWEEP: the monitoring sweep a nightly
    // pipeline runs over every numeric column at once (one (col, psi)
    // verdict row each). Each column is its own pair of bounded-bucket
    // partial aggs — the sweep is a union of tiny plans, no
    // cross-column shuffle; at 100 TB the columns share the two scans
    // via cache if desired, the aggregates stay ≤ nBuckets rows each.
    "dd4_psi_sweep" -> ((spark, dir) => {
      val li = Tables.lineitem(spark, dir)
      val b = li.filter(year(col("l_shipdate")) <= 1994)
      val c = li.filter(year(col("l_shipdate")) >= 1995)
      Seq("l_discount", "l_extendedprice", "l_quantity").map { cn =>
        Drift.psi(b, c, cn, nBuckets = 10)
          .select(lit(cn).as("col_name"), col("psi"))
      }.reduce(_ union _).orderBy(col("col_name"))
    }),

    // W7 — trailing 1-hour RANGE-frame window (frame bounded by the
    // ORDER value, not row count — w4's rows-frame sibling): per-user
    // sum+count of the last hour of events at every event. Decimal-
    // routed frame sum; range bounds are inclusive on both engines.
    "w7_range_frame" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us")
        .rangeBetween(-3600000000L, 0L)
      ev(spark, dir)
        .withColumn("trail_sum", sum(dec($"value")).over(w).cast("double"))
        .withColumn("n_frame", count(lit(1)).over(w))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // TS3 — trapezoidal TIME-WEIGHTED mean per user: irregular samples
    // weight by the interval they span, twa = Σ(vᵢ+vᵢ₊₁)·dtᵢ / 2·Σdtᵢ
    // — the sensor/price-series mean a row-count average misstates.
    // Exactness: each term is DECIMAL(v)+DECIMAL(v₊₁) times an integer
    // dt — exact; sums exact; ONE double division at the end.
    // Zero-dt ties contribute zero whatever the pair order, so the
    // (ts, event_id) ordering fully determines the result.
    "ts3_time_weighted" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(spark, dir)
        .withColumn("__nts", lead($"ts_us", 1).over(w))
        .withColumn("__nv", lead($"value", 1).over(w))
        .filter($"__nts".isNotNull)
        .groupBy($"user_id")
        .agg(
          sum((dec($"value") + dec($"__nv")) * ($"__nts" - $"ts_us"))
            .as("__sterm"),
          sum($"__nts" - $"ts_us").as("__sdt"))
        .select($"user_id",
          // the decimal sums exceed 2^53 scaled units, where the two
          // engines' decimal->double conversions can differ by an ulp
          // (single correctly-rounded conversion vs unscaled-int*10^-s)
          // - the 6-decimal round absorbs it, the house float contract
          when($"__sdt" > 0,
            round($"__sterm".cast("double") / (lit(2.0) * $"__sdt".cast("double")), 6))
            .as("twa"))
        .orderBy($"user_id")
    }),

    // W8 — lag/lead inter-event gaps: per-user time since previous and
    // until next event ((ts_us, event_id) order — the w-family's
    // deterministic-ordering rule). Pure integer lag/lead differences;
    // one user-keyed window exchange, no arithmetic beyond subtraction.
    "w8_lag_gaps" -> ((spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      ev(spark, dir)
        .withColumn("gap_prev_us", $"ts_us" - lag($"ts_us", 1).over(w))
        .withColumn("gap_next_us", lead($"ts_us", 1).over(w) - $"ts_us")
        .select($"user_id", $"ts_us", $"event_id",
          $"gap_prev_us", $"gap_next_us")
        .orderBy($"user_id", $"ts_us", $"event_id")
    }),

    // N11 — per-key forward fill (LOCF over existing rows — TS1's
    // sibling without the resample grid): nulls planted on both
    // engines (every 5th event), carried value = last non-null in
    // (ts_us, event_id) order; pure value copy, no float arithmetic
    "n11_ffill" -> ((spark, dir) => {
      import spark.implicits._
      val planted = Tables.events(spark, dir)
        .filter($"user_id".isNotNull)
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
          when($"event_id" % 5 === 0, lit(null)).otherwise($"value")
            .as("value"))
      planted.withColumn("value_ffill",
        last($"value", ignoreNulls = true).over(
          Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
        .orderBy($"user_id", $"ts_us", $"event_id")
    }))

  private def psiSnapshots(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(spark, dir)
    (o.filter(year(col("o_orderdate")) <= 1994),
      o.filter(year(col("o_orderdate")) >= 1995))
  }

  private val psiSnapshotsSql =
    """base AS (SELECT o_totalprice AS x FROM orders WHERE year(o_orderdate) <= 1994),
      |cur AS (SELECT o_totalprice AS x FROM orders WHERE year(o_orderdate) >= 1995)""".stripMargin

  def oracle: Map[String, String] = Map(

    "a18_corr_matrix" ->
      s"""SELECT col_x, col_y, corr
         |FROM ${CorrMatrix.corrSql("orders",
               Seq("o_totalprice", "o_custkey", "o_orderkey"))} m
         |ORDER BY col_x, col_y""".stripMargin,

    "a19_group_quartiles" ->
      s"""SELECT source, count(*) AS n,
         |  quantile_disc(n_chars, 0.25) AS q1,
         |  quantile_disc(n_chars, 0.5) AS median,
         |  quantile_disc(n_chars, 0.75) AS q3
         |FROM documents WHERE n_chars IS NOT NULL
         |GROUP BY source ORDER BY source""".stripMargin,

    // exact side + pinned flag: the oracle independently derives the
    // exact cardinalities; the engine's HLL estimate must sit within
    // tolerance of ITS exact count (approx_nd itself is sketch-
    // implementation-specific, so it is not compared — same contract
    // as v6_ivf_recall)
    "a20_cardinality_profile" ->
      s"""SELECT col_name, exact_nd, within_tol FROM (
         |  SELECT 'doc_id' AS col_name, count(DISTINCT doc_id) AS exact_nd, 1 AS within_tol FROM documents
         |  UNION ALL
         |  SELECT 'lang', count(DISTINCT lang), 1 FROM documents
         |  UNION ALL
         |  SELECT 'source', count(DISTINCT source), 1 FROM documents)
         |ORDER BY col_name""".stripMargin,

    "ol1_iqr_outliers" -> {
      val (lo, hi) = Outliers.boundsSql("events", "value", 1.5)
      s"""SELECT event_id, user_id, value FROM events
         |WHERE value IS NOT NULL AND (value < $lo OR value > $hi)
         |ORDER BY event_id""".stripMargin
    },

    "ts3_time_weighted" ->
      s"""WITH $evSql,
         |l AS (SELECT user_id, ts_us, value,
         |    LEAD(ts_us, 1) OVER w AS nts, LEAD(value, 1) OVER w AS nv
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |t AS (SELECT user_id,
         |    SUM((CAST(value AS DECIMAL(18,2)) + CAST(nv AS DECIMAL(18,2)))
         |        * (nts - ts_us)) AS sterm,
         |    SUM(nts - ts_us) AS sdt
         |  FROM l WHERE nts IS NOT NULL GROUP BY user_id)
         |SELECT user_id,
         |  CASE WHEN sdt > 0
         |       THEN round(CAST(sterm AS DOUBLE) / (2.0 * CAST(sdt AS DOUBLE)), 6)
         |  END AS twa
         |FROM t ORDER BY user_id""".stripMargin,

    "w8_lag_gaps" ->
      s"""WITH $evSql
         |SELECT user_id, ts_us, event_id,
         |  ts_us - LAG(ts_us, 1) OVER w AS gap_prev_us,
         |  LEAD(ts_us, 1) OVER w - ts_us AS gap_next_us
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "w7_range_frame" ->
      s"""WITH $evSql
         |SELECT user_id, ts_us, event_id, value,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trail_sum,
         |  COUNT(*) OVER w AS n_frame
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
         |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "n11_ffill" ->
      """WITH pl AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    event_id,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value
        |  FROM events WHERE user_id IS NOT NULL)
        |SELECT user_id, ts_us, event_id, value,
        |  last_value(value IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
        |FROM pl ORDER BY user_id, ts_us, event_id""".stripMargin,

    "dd1_psi_profile" ->
      s"""WITH $psiSnapshotsSql
         |SELECT bucket, base_n, cur_n, p, q, term
         |FROM ${Drift.profileSql(10)} t
         |ORDER BY bucket""".stripMargin,

    "dd2_psi" ->
      s"""WITH $psiSnapshotsSql
         |SELECT list_reduce(
         |    list_prepend(CAST(0.0 AS DOUBLE),
         |      array_agg(term ORDER BY bucket)),
         |    (a, b) -> a + b) AS psi
         |FROM ${Drift.profileSql(10)} t""".stripMargin,

    "dd4_psi_sweep" -> {
      def one(cn: String) =
        s"""SELECT '$cn' AS col_name, psi FROM (
           |  WITH base AS (SELECT $cn AS x FROM lineitem
           |         WHERE year(l_shipdate) <= 1994),
           |       cur AS (SELECT $cn AS x FROM lineitem
           |         WHERE year(l_shipdate) >= 1995)
           |  SELECT list_reduce(
           |      list_prepend(CAST(0.0 AS DOUBLE),
           |        array_agg(term ORDER BY bucket)),
           |      (a, b) -> a + b) AS psi
           |  FROM ${Drift.profileSql(10)} t)""".stripMargin
      Seq("l_discount", "l_extendedprice", "l_quantity").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "a13_percentile" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS p25,
        |  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
        |  ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS p75,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a15_collect_agg" ->
      """SELECT c_nationkey,
        |  array_to_string(list_sort(list_distinct(array_agg(c_mktsegment))), ',') AS segments,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "w4_rolling" ->
      s"""WITH $evSql
         |SELECT user_id, ts_us, event_id,
         |  CAST(SUM(${sqlDec("value")}) OVER w AS DOUBLE) AS roll_sum,
         |  CAST(SUM(${sqlDec("value")}) OVER w AS DOUBLE)
         |    / CAST(COUNT(*) OVER w AS DOUBLE) AS roll_avg
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
         |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, ts_us, event_id""".stripMargin,

    "ts2_ewma" ->
      s"""WITH $evSql
         |SELECT user_id, COUNT(*) AS n_obs,
         |  list_reduce(array_agg(value ORDER BY ts_us, event_id),
         |    (acc, x) -> acc * CAST(0.75 AS DOUBLE) + x * CAST(0.25 AS DOUBLE)) AS ewma
         |FROM ev GROUP BY user_id ORDER BY user_id""".stripMargin,

    "fz1_fuzzy_pairs" ->
      """SELECT a.c_nationkey AS c_nationkey, a.c_custkey AS a_id,
        |  b.c_custkey AS b_id, levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY a_id, b_id""".stripMargin,

    "a16_moments" ->
      """WITH q AS (SELECT l_returnflag,
        |    CAST(CAST(l_quantity AS DECIMAL(8,2)) * 100 AS DECIMAL(10,0)) AS y
        |  FROM lineitem),
        |p AS (SELECT l_returnflag, y,
        |    CAST(y * y AS DECIMAL(14,0)) AS y2 FROM q),
        |p3 AS (SELECT l_returnflag, y, y2,
        |    CAST(y2 * y AS DECIMAL(18,0)) AS y3 FROM p),
        |p4 AS (SELECT l_returnflag, y, y2, y3,
        |    CAST(y3 * y AS DECIMAL(20,0)) AS y4 FROM p3),
        |s AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
        |  CAST(SUM(y) AS DOUBLE) AS sx,
        |  CAST(SUM(y2) AS DOUBLE) AS sx2,
        |  CAST(SUM(y3) AS DOUBLE) AS sx3,
        |  CAST(SUM(y4) AS DOUBLE) AS sx4
        | FROM p4 GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  (sx3 / n - 3.0 * (sx / n) * (sx2 / n) + 2.0 * (sx / n) * (sx / n) * (sx / n))
        |    / ((sx2 / n - (sx / n) * (sx / n)) * sqrt(sx2 / n - (sx / n) * (sx / n))) AS skewness,
        |  (sx4 / n - 4.0 * (sx / n) * (sx3 / n) + 6.0 * (sx / n) * (sx / n) * (sx2 / n)
        |    - 3.0 * (sx / n) * (sx / n) * (sx / n) * (sx / n))
        |    / ((sx2 / n - (sx / n) * (sx / n)) * (sx2 / n - (sx / n) * (sx / n))) - 3.0 AS kurtosis
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "r5_group_split" -> {
      val tok = Sampling.thresholdToken(0.8)
      s"""WITH t AS (SELECT user_id,
         |  CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 8) < '$tok'
         |       THEN 'train' ELSE 'test' END AS split
         |  FROM events WHERE user_id IS NOT NULL)
         |SELECT split, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
         |FROM t GROUP BY split ORDER BY split""".stripMargin
    },

    "a17_weighted_avg" ->
      s"""SELECT l_returnflag,
         |  CAST(SUM(CAST(${sqlDec("l_quantity")} * ${sqlDec("l_extendedprice")} AS DECIMAL(30,4))) AS DOUBLE)
         |    / CAST(SUM(${sqlDec("l_extendedprice")}) AS DOUBLE) AS wavg_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "h2_equidepth" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice,
        |    NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS cnt,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "o5_group_head" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS rn
        |  FROM customer) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    "ep1_entropy" ->
      """WITH cnt AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS c
        |  FROM orders GROUP BY o_orderpriority, o_orderstatus),
        |pr AS (SELECT o_orderpriority,
        |    CAST(c AS DOUBLE) / CAST(SUM(c) OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS p
        |  FROM cnt),
        |tq AS (SELECT o_orderpriority,
        |    CAST(FLOOR(-(p * ln(p)) * 1000000.0) AS BIGINT) AS tq FROM pr)
        |SELECT o_orderpriority,
        |  CAST(SUM(tq) AS DOUBLE) / 1000000.0 AS entropy_nats,
        |  COUNT(*) AS n_values
        |FROM tq GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "sq1_funnel" ->
      """WITH t AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    event_id, event_type FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |p AS (SELECT user_id,
        |    array_to_string(array_agg(event_type ORDER BY ts_us, event_id), '>') AS path
        |  FROM t GROUP BY user_id)
        |SELECT user_id,
        |  CASE WHEN path LIKE '%signup%click%purchase%' THEN 3
        |       WHEN path LIKE '%signup%click%' THEN 2
        |       WHEN path LIKE '%signup%' THEN 1 ELSE 0 END AS stage
        |FROM p ORDER BY user_id""".stripMargin,

    "rs1_robust_scale" ->
      """WITH r AS (SELECT c_custkey, c_mktsegment, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal, c_custkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM customer),
        |q AS (SELECT c_mktsegment,
        |    MAX(CASE WHEN rn = CAST(ceil(CAST(0.25 AS DOUBLE) * n) AS BIGINT) THEN c_acctbal END) AS p25,
        |    MAX(CASE WHEN rn = CAST(ceil(CAST(0.5 AS DOUBLE) * n) AS BIGINT) THEN c_acctbal END) AS med,
        |    MAX(CASE WHEN rn = CAST(ceil(CAST(0.75 AS DOUBLE) * n) AS BIGINT) THEN c_acctbal END) AS p75
        |  FROM r GROUP BY c_mktsegment)
        |SELECT r.c_custkey, r.c_mktsegment, r.c_acctbal,
        |  CASE WHEN (q.p75 - q.p25) <> 0 THEN (r.c_acctbal - q.med) / (q.p75 - q.p25) END AS scaled
        |FROM r JOIN q ON r.c_mktsegment = q.c_mktsegment
        |ORDER BY r.c_custkey""".stripMargin,

    "c10_calendar" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
        |  CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INTEGER) AS d,
        |  CAST(EXTRACT(isodow FROM o_orderdate) AS INTEGER) AS iso_dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "sd1_snapshot_diff" ->
      """WITH oldt AS (SELECT c_custkey, c_acctbal FROM customer),
        |newt AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS c_acctbal
        |  FROM customer WHERE c_custkey % 10 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000 AS c_custkey, 0.0 AS c_acctbal
        |  FROM customer WHERE c_custkey % 100 = 0),
        |d AS (SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
        |  CASE WHEN o.c_custkey IS NULL THEN 'insert'
        |       WHEN n.c_custkey IS NULL THEN 'delete'
        |       WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal THEN 'update'
        |       ELSE 'unchanged' END AS change_type,
        |  o.c_acctbal AS old_c_acctbal, n.c_acctbal AS new_c_acctbal
        |FROM oldt o FULL JOIN newt n ON o.c_custkey = n.c_custkey)
        |SELECT * FROM d WHERE change_type <> 'unchanged'
        |ORDER BY c_custkey""".stripMargin,

    "g5_rollup" ->
      s"""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
         |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,

    "i3_union_set" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "c12_string_suite" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_up,
        |  lower(c_name) AS name_lo,
        |  trim(concat('  ', c_mktsegment, ' ')) AS seg_trim,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
        |  substr(c_name, 1, 8) AS name_head,
        |  replace(c_name, 'Customer', 'Cust') AS name_short,
        |  CAST(length(c_name) AS INTEGER) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "cj1_cross" ->
      """SELECT r.r_regionkey, n.n_nationkey,
        |  r.r_regionkey = n.n_regionkey AS is_home
        |FROM region r CROSS JOIN nation n
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,

    "w6_first_last" ->
      s"""WITH $evSql
         |SELECT user_id, ts_us, event_id,
         |  first_value(value) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS first_v,
         |  last_value(value) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_v
         |FROM ev ORDER BY user_id, ts_us, event_id""".stripMargin,

    "w5_share" ->
      s"""SELECT o_orderkey, o_orderpriority,
         |  CAST(${sqlDec("o_totalprice")} AS DOUBLE) /
         |    CAST(SUM(${sqlDec("o_totalprice")})
         |         OVER (PARTITION BY o_orderpriority) AS DOUBLE) AS share
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "g4_dynamic_pivot" ->
      s"""SELECT o_orderpriority,
         |  CAST(SUM(${sqlDec("o_totalprice")}) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS F,
         |  CAST(SUM(${sqlDec("o_totalprice")}) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS O,
         |  CAST(SUM(${sqlDec("o_totalprice")}) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS P
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
