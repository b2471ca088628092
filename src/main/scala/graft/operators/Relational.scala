package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.GraftFunctions._
import graft.sources.Tables

/** §2b relational query surface.
  *
  * dumpty rides on Spark SQL for its extract queries; this module
  * demonstrates the full relational operator set — scan w/ pushdown,
  * hash agg, broadcast/shuffle/semi/anti joins, windows, rollup,
  * distinct, union/sort/limit, correlated EXISTS, time bucketing,
  * sessionization — each as a Catalyst-optimizable DataFrame plan
  * with a DuckDB-checkable oracle (bit-exact via decimal money math,
  * see GraftFunctions.money).
  */
object Relational {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  /** TPC-H Q1-style pricing summary: single scan, hash aggregate with
    * map-side partial agg; shuffles only |groups| rows per partition.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_shipdate") <= ts("1998-09-02"))
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = disc * (lit(1.0) + col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        msum(disc).as("sum_disc_price"),
        msum(charge).as("sum_charge"),
        (msum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (msum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (msum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q6-style: all predicates + 2-column projection reach the
    * parquet scan (PushedFilters / ReadSchema — see PlanSpec).
    */
  def qFilterPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
      .filter(col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07))
      .filter(col("l_quantity") < lit(24.0))
      .agg(msum(col("l_extendedprice") * col("l_discount")).as("revenue"),
           count(lit(1)).as("n_rows"))

  /** TPC-H Q3-style: dim-filtered customer broadcast into orders,
    * shuffle join to lineitem on the (large) orderkey, top-10.
    */
  def q3JoinTopk(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-03-15"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-03-15"))
    l.join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
           col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
  }

  /** TPC-H Q5-style: five joins; region/nation/supplier broadcast
    * (dim-sized), customer⋈orders⋈lineitem shuffled on their keys.
    */
  def q5Multijoin(s: SparkSession, dir: String): DataFrame = {
    val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir).join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
    val sup = Tables.supplier(s, dir).join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    Tables.lineitem(s, dir)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir),
            col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Explicit broadcast-join: part is dim-sized, lineitem never moves. */
  def qBroadcastJoin(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_size") <= 20)),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), msum(col("l_quantity")).as("sum_qty"))

  /** Left-semi (EXISTS) and left-anti (NOT EXISTS) joins. */
  def qSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val ok = Tables.orders(s, dir).select(col("o_custkey"))
    val semi = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).select(lit("with_orders").as("kind"), col("cnt"))
    val anti = c.join(ok, c("c_custkey") === ok("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).select(lit("no_orders").as("kind"), col("cnt"))
    semi.unionAll(anti)
  }

  /** Window functions: per-supplier monthly revenue, rank within
    * supplier, running total. Decimal revenue keeps ordering exact.
    */
  def qWindow(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey"), date_trunc("month", col("l_shipdate")).as("month"))
      .agg(sum(money(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("rev").desc, col("month"))
    val running = Window.partitionBy(col("l_suppkey")).orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("rnk", row_number().over(w))
      .withColumn("running_rev", sum(col("rev")).over(running).cast("double"))
      .filter(col("rnk") <= 3)
      .select(col("l_suppkey"), col("month"), col("rev").cast("double").as("rev"),
              col("rnk"), col("running_rev"))
  }

  /** Exact interpolated percentiles per group (single partial-agg
    * pass; both engines use the same linear-interpolation formula).
    */
  def qPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.95)"), 6).as("p95_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"),
        count(lit(1)).as("cnt"))

  /** ntile + first_value window coverage: customers bucketed into
    * acctbal quartiles per nation, with the nation's richest
    * customer carried alongside.
    */
  def qNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir).select(
      col("c_custkey"), col("c_nationkey"),
      col("c_acctbal"),
      ntile(4).over(w).as("quartile"),
      first_value(col("c_custkey")).over(w).as("richest_cust"))
  }

  /** Deterministic nested-array aggregation: per-customer sorted
    * order key list (collect_list is unordered by contract —
    * sort_array makes it reproducible), emitted as a canonical
    * comma-joined string. The gate's comparator hashes scalar cells
    * (array cells broke the r2 driver compare), so the list is
    * serialized identically on both sides: DuckDB mirrors with
    * string_agg(k, ',' ORDER BY k). Integer-to-string rendering is
    * engine-identical; the sort happens numerically pre-cast.
    */
  def qCollect(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        expr("array_join(transform(sort_array(collect_list(o_orderkey))," +
          " x -> cast(x AS STRING)), ',')").as("order_keys"))

  /** Salted-join parity through the oracle gate: the salted plan
    * must aggregate to exactly what the plain SQL join yields.
    */
  def qSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    Skew.saltedJoin(li, o, "l_orderkey", salts = 7)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), msum(col("l_quantity")).as("sum_qty"))
  }

  /** Join/groupBy skew diagnostic: the 10 heaviest keys with their
    * share of the table (ppm) and the salt factor [[Skew.saltedJoin]]
    * would need to level them (ceil(cnt · n_keys / total), i.e. how
    * many average keys this one is worth). One partial-agg shuffle
    * over the key + a TakeOrdered top-10 — the join itself is never
    * run, which is the point: at 100 TB this is the pre-flight check
    * that decides between a plain shuffle join and a salted one.
    * Integer arithmetic end-to-end (cross-engine exact).
    */
  def qSkewDiag(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        expr("(cnt * n_keys + total - 1) div total").as("salt_factor"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(10)
  }

  /** Join-cardinality estimate WITHOUT running the join: the exact
    * self-join blow-up of events on user_id from the per-key count
    * table alone — est_pairs = Σ c(u)², the row count the self-join
    * WOULD produce. One partial-agg shuffle over ~n rows versus the
    * est_pairs-row join output it predicts; at 100 TB this is the
    * guard that catches a quadratic key before the cluster does.
    * blowup_ppm = est_pairs·10⁶ div n_rows (integer, exact).
    */
  def qJoinEstimate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        sum(col("cnt") * col("cnt")).as("est_pairs"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("est_pairs"),
        expr("est_pairs * 1000000 div n_rows").as("blowup_ppm"))

  /** Rollup aggregate (subtotals + grand total). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(msum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  /** Exact distinct counts (single pass, partial aggregation). */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(
      countDistinct(col("l_partkey")).as("d_part"),
      countDistinct(col("l_suppkey")).as("d_supp"),
      count(lit(1)).as("total"))

  /** Union + deterministic top-5 per side. orderBy+limit compiles to
    * TakeOrderedAndProject (per-partition heaps + driver merge) —
    * distributed, unlike a global row_number window.
    */
  def qUnionSort(s: SparkSession, dir: String): DataFrame = {
    def top5(df: DataFrame, kind: String, name: String, bal: String) =
      df.select(lit(kind).as("kind"), col(name).as("name"), col(bal).as("bal"))
        .orderBy(col("bal").desc, col("name"))
        .limit(5)
    top5(Tables.customer(s, dir), "customer", "c_name", "c_acctbal")
      .unionAll(top5(Tables.supplier(s, dir), "supplier", "s_name", "s_acctbal"))
  }

  /** TPC-H Q4-style correlated EXISTS via left-semi join. */
  def qExists(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1996-04-01"))
    val big = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45).select(col("l_orderkey"))
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Batch tumbling-window event aggregation (streaming-equivalent
    * plan lives in graft.streaming.EventStreams).
    */
  def qEventsWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           msum(col("value")).as("sum_value"),
           countDistinct(col("user_id")).as("n_users"))

  /** Gap-based sessionization (30-min inactivity): lag + cumulative
    * sum over a per-user window — one shuffle on user_id.
    */
  def qSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > lit(1800L * 1000000L), 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
  }

  /** Semi-structured parsing: pull a field out of the JSON props
    * column and aggregate on it (get_json_object is codegen'd; for
    * repeated access at scale, parse once with from_json to a
    * struct column instead).
    */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Left-outer join with null-aware aggregation: every order keeps
    * a row; orders without matching (filtered) lineitems count 0.
    */
  def qOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"), col("l_quantity"))
    Tables.orders(s, dir)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("joined_rows"),
        count(col("l_orderkey")).as("matched_rows"),
        msum(coalesce(col("l_quantity"), lit(0.0))).as("sum_big_qty"))
  }

  /** Cube aggregate: all grouping-set combinations of two dims. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), msum(col("o_totalprice")).as("sum_price"))

  /** GROUPING SETS — the general form cube/rollup specialize: the
    * caller names exactly the aggregation levels wanted (here each
    * single dimension plus the grand total — the "marginals" layout
    * a report needs without cube's full cross). Catalyst expands to
    * one Expand + one partial-agg shuffle, same as cube.
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), msum(col("o_totalprice")).as("sum_price"))

  /** Linear multi-touch attribution — the events-analytics op beyond
    * last-touch (that is [[qAsofJoin]]): every click within the
    * lookback window before a purchase shares the credit equally;
    * per click, the total attributed share in integer ppm
    * (1e6 div n_touches per purchase — order-independent exact sums)
    * and the purchases touched. The pair join is user-keyed (the
    * natural co-location key; never a cross), the share split is one
    * count window per purchase, and the final fold is a partial agg
    * on click id.
    */
  val AttributionWindowUs: Long = 3600L * 1000000L

  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_ts"))
    val pairs = purchases.join(clicks,
      col("p_user") === col("c_user")
        && col("c_ts") >= col("p_ts") - AttributionWindowUs
        && col("c_ts") <= col("p_ts"))
    val wn = Window.partitionBy(col("purchase_id"))
    pairs.withColumn("n_touches", count(lit(1)).over(wn))
      .groupBy(col("click_id"), col("c_user"))
      .agg(countDistinct(col("purchase_id")).as("n_purchases"),
        sum(expr("1000000 div n_touches")).as("share_ppm_total"))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("n_purchases"), col("share_ppm_total"))
  }

  /** Deterministic argmin per group: each customer's cheapest order
    * (window row_number with a full tiebreak — min_by/arg_min tie
    * behavior is engine-defined, a rank is not).
    */
  def qArgmin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("cheapest_order"),
        col("o_totalprice").as("min_price"))
  }

  /** Binned histogram (width_bucket-style) of order totals. */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(floor(col("o_totalprice") / lit(1000.0)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"), msum(col("o_totalprice")).as("sum_price"))

  /** Pivot: order counts per priority × status. */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))

  /** As-of join: each purchase event picks up the user's most recent
    * click at-or-before it (see AsOfJoin for the single-window
    * composition).
    */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    AsOfJoin.asof(purchases, clicks, "user_id", "ts", "ts",
        rightVals = Seq("ts", "event_id"), tiebreak = "event_id")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("__ts").as("purchase_ts"), col("asof_ts").as("asof_click_ts"),
        col("asof_event_id").as("asof_click_id"), col("n_right_before").as("n_clicks_before"))
  }

  /** Batch interval (range) join, binned: for every event, count and
    * sum the same-type events within ±RangeJoinWindow. A naive theta
    * join (|Δts| ≤ w) is O(n·m) in Spark — BroadcastNestedLoop at any
    * scale. Binning ts to window-width buckets turns it into an
    * equi-join on (type, bin): each probe row expands to 3 candidate
    * bins (b-1, b, b+1 cover every |Δ| ≤ w neighbor exactly once,
    * since a neighbor's bin is fixed), the join shuffles on the bin
    * key, and the exact |Δ| predicate filters residuals — the
    * standard distributed range-join rewrite (DuckDB's native IEJoin
    * verifies it). At 100 TB the bin key is (type, 10-min bucket):
    * uniform-ish by construction; AQE skew-split covers hot buckets.
    */
  val RangeJoinWindowUs: Long = 600L * 1000000L
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("et"), col("value"))
    val bin = (c: org.apache.spark.sql.Column) =>
      floor(c / lit(RangeJoinWindowUs)).cast("long")
    val probe = ev.withColumn("nb",
      explode(array(bin(col("et")) - 1, bin(col("et")), bin(col("et")) + 1)))
    val build = ev.toDF("n_event_id", "n_event_type", "n_et", "n_value")
      .withColumn("n_bin", bin(col("n_et")))
    val agg = probe.join(build,
        col("nb") === col("n_bin") && col("event_type") === col("n_event_type")
          && col("event_id") =!= col("n_event_id")
          && abs(col("et") - col("n_et")) <= RangeJoinWindowUs)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_nbrs"), msum(col("n_value")).as("sum_nbr_value"))
    ev.select(col("event_id")).join(agg, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        coalesce(col("sum_nbr_value"), lit(0.0)).as("sum_nbr_value"))
  }

  /** Calendar gap-fill + cumulative: daily per-type counts joined
    * against the full (type × day) grid — the grid sides are an
    * exploded 1-row min/max aggregate and a distinct-types dim, both
    * broadcast (BNLJ over tiny sides, never a shuffled cartesian) —
    * then a per-type running total (partitioned window).
    */
  def qGapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val days = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    days.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("cum_events", sum(col("n_events")).over(w))
      .select(col("event_type"), col("day"), col("n_events"), col("cum_events"))
  }

  /** Rate-anomaly thresholds: observed/expected above the spike or
    * below the collapse bound (ppm of the trailing mean) flags the
    * cell, once at least [[RateMinBaseDays]] baseline days exist.
    */
  val RateSpikePpm = 1500000L
  val RateCollapsePpm = 600000L
  val RateMinBaseDays = 3L

  /** Event-rate anomaly detection — the pipeline-health monitor over
    * the event stream: per (type, day) the observed count against a
    * trailing 7-day baseline, flagged when the ratio leaves the
    * [collapse, spike] band. Ingestion failures show as collapses,
    * runaway producers and replay storms as spikes — per TYPE, so one
    * stream's failure is not averaged away by the blend (the
    * source-drift philosophy on the time axis).
    *
    * Exactness discipline: the ratio is integer ppm of the trailing
    * MEAN — n·base_n·1e6 div base_sum — with zero-history cells
    * guarded (base_n < MinBaseDays never flags; empty baseline
    * divides by the greatest(…,1) floor). Days with no events at all
    * must still report (a silent day IS the anomaly), so counts ride
    * the gap-filled (type × day) grid: both grid sides are tiny
    * broadcasts (BNLJ, never a shuffled cartesian — the qGapfill
    * scheme) and the only real shuffle is the daily partial agg; the
    * baseline window is PARTITIONED by type. Int64 headroom: daily
    * counts below ~10⁹ keep n·7·1e6 in range (documented dial).
    */
  def qRateAnomaly(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val days = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val wb = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    days.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("base_sum", coalesce(sum(col("n_events")).over(wb), lit(0L)))
      .withColumn("base_n", count(lit(1)).over(wb))
      .withColumn("ratio_ppm",
        expr("n_events * base_n * 1000000 div greatest(base_sum, 1L)"))
      .withColumn("anomaly", col("base_n") >= RateMinBaseDays &&
        (col("ratio_ppm") > RateSpikePpm || col("ratio_ppm") < RateCollapsePpm))
      .select(col("event_type"), col("day"), col("n_events"), col("base_sum"),
        col("base_n"), col("ratio_ppm"), col("anomaly"))
  }

  /** Set operations: INTERSECT ALL-distinct semantics + EXCEPT, both
    * compiled to hash joins by Catalyst (left-semi / left-anti over
    * distinct inputs) — no sort, partial-agg dedup first.
    */
  def qSetops(s: SparkSession, dir: String): DataFrame = {
    val byStatus = (st: String) => Tables.orders(s, dir)
      .filter(col("o_orderstatus") === st).select(col("o_custkey"))
    byStatus("F").intersect(byStatus("O")).except(byStatus("P"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> qRangeJoin _,
    "q_gapfill" -> qGapfill _,
    "q_rate_anomaly" -> qRateAnomaly _,
    "q_setops" -> qSetops _,
    "q_props_extract" -> qJsonExtract _,
    "q_outer_join" -> qOuterJoin _,
    "q_cube" -> qCube _,
    "q_argmin" -> qArgmin _,
    "q_histogram" -> qHistogram _,
    "q_pivot" -> qPivot _,
    "q_grouping_sets" -> qGroupingSets _,
    "q_attribution" -> qAttribution _,
    "q_asof_join" -> qAsofJoin _,
    "q1_agg" -> q1Agg _,
    "q_filter_pushdown" -> qFilterPushdown _,
    "q3_join_topk" -> q3JoinTopk _,
    "q5_multijoin" -> q5Multijoin _,
    "q_broadcast_join" -> qBroadcastJoin _,
    "q_semi_anti" -> qSemiAnti _,
    "q_window" -> qWindow _,
    "q_percentile" -> qPercentile _,
    "q_ntile" -> qNtile _,
    "q_collect" -> qCollect _,
    "q_salted" -> qSalted _,
    "q_skew_diag" -> qSkewDiag _,
    "q_join_estimate" -> qJoinEstimate _,
    "q_rollup" -> qRollup _,
    "q_distinct" -> qDistinct _,
    "q_union_sort" -> qUnionSort _,
    "q_exists" -> qExists _,
    "q_events_window" -> qEventsWindow _,
    "q_sessionize" -> qSessionize _,
    "q_cohort" -> qCohort _,
    "q_funnel" -> qFunnel _)

  /** Cohort retention: users grouped by first-active day (index from
    * the fixture epoch), activity counted per (cohort, day offset) —
    * the product-analytics retention matrix. Two partial-agg
    * shuffles on user_id + one distinct-count shuffle; day indices
    * are integers, so the output is cross-engine exact.
    */
  def qCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohorts, Seq("user_id"))
      .withColumn("day_offset", col("day") - col("cohort_day"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered funnel (signup → view-after → purchase-after): each
    * step's entry time is the MIN event time strictly after the
    * previous step's — the standard stepwise-min funnel, not a mere
    * type-count. Per-step user counts + ppm conversion vs step 1.
    * Each step is one filter + user-keyed join + partial-agg min;
    * the event stream is never self-joined row-to-row.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view").join(s1, Seq("user_id"))
      .where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, Seq("user_id"))
      .where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val steps = s1.select(lit(1).as("step"), col("user_id"))
      .unionAll(s2.select(lit(2).as("step"), col("user_id")))
      .unionAll(s3.select(lit(3).as("step"), col("user_id")))
    steps.groupBy(col("step")).agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(s1.agg(count(lit(1)).as("n_base"))))
      .select(col("step"), col("n_users"),
        expr("n_users * 1000000 div n_base").as("conv_ppm"))
  }

  val oracles: Map[String, String] = Map(
    "q_cohort" ->
      """WITH ev AS (SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', ts::DATE) AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT c.cohort_day, ev.day - c.cohort_day AS day_offset,
        |  count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN c ON ev.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |steps AS (
        |  SELECT 1 AS step, user_id FROM s1
        |  UNION ALL SELECT 2, user_id FROM s2
        |  UNION ALL SELECT 3, user_id FROM s3),
        |base AS (SELECT count(*)::BIGINT AS n_base FROM s1)
        |SELECT step, count(*)::BIGINT AS n_users,
        |  (count(*) * 1000000) // max(base.n_base) AS conv_ppm
        |FROM steps CROSS JOIN base GROUP BY step""".stripMargin,
    "q_range_join" ->
      s"""SELECT e.event_id, count(n.event_id)::BIGINT AS n_nbrs,
        |  coalesce(sum(n.value::DECIMAL(18,6)), 0)::DOUBLE AS sum_nbr_value
        |FROM events e LEFT JOIN events n
        |  ON n.event_type = e.event_type AND n.event_id <> e.event_id
        |  AND abs(epoch_us(n.ts) - epoch_us(e.ts)) <= ${RangeJoinWindowUs}
        |GROUP BY e.event_id""".stripMargin,
    "q_gapfill" ->
      """WITH daily AS (
        |  SELECT event_type, ts::DATE AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
        |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |grid AS (SELECT t.event_type, days.day
        |  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN days)
        |SELECT g.event_type, g.day, coalesce(d.n, 0)::BIGINT AS n_events,
        |  (sum(coalesce(d.n, 0))
        |     OVER (PARTITION BY g.event_type ORDER BY g.day))::BIGINT AS cum_events
        |FROM grid g LEFT JOIN daily d
        |  ON d.event_type = g.event_type AND d.day = g.day""".stripMargin,
    "q_setops" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin,
    "q_rate_anomaly" ->
      s"""WITH daily AS (
        |  SELECT event_type, ts::DATE AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1 FROM events),
        |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |grid AS (SELECT t.event_type, days.day
        |  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN days),
        |g AS (SELECT grid.event_type, grid.day, coalesce(d.n, 0)::BIGINT AS n_events
        |  FROM grid LEFT JOIN daily d
        |    ON d.event_type = grid.event_type AND d.day = grid.day),
        |w AS (SELECT *,
        |  coalesce(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS base_sum,
        |  (count(*) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))::BIGINT AS base_n
        |  FROM g)
        |SELECT event_type, day, n_events, base_sum, base_n,
        |  (n_events * base_n * 1000000 // greatest(base_sum, 1))::BIGINT AS ratio_ppm,
        |  (base_n >= $RateMinBaseDays AND
        |    ((n_events * base_n * 1000000 // greatest(base_sum, 1)) > $RateSpikePpm
        |     OR (n_events * base_n * 1000000 // greatest(base_sum, 1)) < $RateCollapsePpm))
        |    AS anomaly
        |FROM w""".stripMargin,
    "q_props_extract" ->
      """SELECT event_type,
        |  count(k) AS n_with_k, sum(k)::BIGINT AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        json_extract_string(props, '$.k')::BIGINT AS k
        |      FROM events)
        |GROUP BY event_type""".stripMargin,
    "q_outer_join" ->
      """SELECT o_orderstatus, count(*) AS joined_rows,
        |  count(l_orderkey) AS matched_rows,
        |  sum(coalesce(l_quantity, 0.0)::DECIMAL(18,6))::DOUBLE AS sum_big_qty
        |FROM orders LEFT OUTER JOIN
        |  (SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity >= 45) li
        |  ON o_orderkey = li.l_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  sum(o_totalprice::DECIMAL(18,6))::DOUBLE AS sum_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |  sum(o_totalprice::DECIMAL(18,6))::DOUBLE AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_attribution" ->
      s"""WITH p AS (SELECT user_id AS p_user, event_id AS purchase_id,
        |    epoch_us(ts) AS p_ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id AS c_user, event_id AS click_id,
        |    epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'),
        |pr AS (SELECT * FROM p JOIN c ON p_user = c_user
        |  AND c_ts >= p_ts - $AttributionWindowUs AND c_ts <= p_ts),
        |wn AS (SELECT *, count(*) OVER (PARTITION BY purchase_id)
        |    AS n_touches FROM pr)
        |SELECT click_id, c_user AS user_id,
        |  count(DISTINCT purchase_id)::BIGINT AS n_purchases,
        |  sum(1000000 // n_touches)::BIGINT AS share_ppm_total
        |FROM wn GROUP BY 1, 2""".stripMargin,
    "q_argmin" ->
      """SELECT o_custkey, o_orderkey AS cheapest_order,
        |  o_totalprice AS min_price
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey) = 1""".stripMargin,
    "q_histogram" ->
      """SELECT floor(o_totalprice / 1000.0)::BIGINT AS bin, count(*) AS cnt,
        |  sum(o_totalprice::DECIMAL(18,6))::DOUBLE AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS F,
        |  count(*) FILTER (o_orderstatus = 'O') AS O,
        |  count(*) FILTER (o_orderstatus = 'P') AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts AS __ts, 1 AS __m, event_id AS __tb,
        |    event_id, NULL::TIMESTAMP AS c_ts, NULL::BIGINT AS c_id
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, 0, event_id, NULL, ts, event_id
        |  FROM events WHERE event_type = 'click'),
        |c AS (
        |  SELECT user_id, __ts, __m, event_id,
        |    last_value(c_ts IGNORE NULLS) OVER w AS asof_click_ts,
        |    last_value(c_id IGNORE NULLS) OVER w AS asof_click_id,
        |    sum(CASE WHEN __m = 0 THEN 1 ELSE 0 END) OVER w AS n_clicks_before
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY __ts, __m, __tb
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id AS purchase_id, __ts AS purchase_ts,
        |  asof_click_ts, asof_click_id, n_clicks_before::BIGINT AS n_clicks_before
        |FROM c WHERE __m = 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(18,6))::DOUBLE AS sum_qty,
        |  sum(l_extendedprice::DECIMAL(18,6))::DOUBLE AS sum_base_price,
        |  sum((l_extendedprice*(1.0-l_discount))::DECIMAL(18,6))::DOUBLE AS sum_disc_price,
        |  sum((l_extendedprice*(1.0-l_discount)*(1.0+l_tax))::DECIMAL(18,6))::DOUBLE AS sum_charge,
        |  sum(l_quantity::DECIMAL(18,6))::DOUBLE / count(*) AS avg_qty,
        |  sum(l_extendedprice::DECIMAL(18,6))::DOUBLE / count(*) AS avg_price,
        |  sum(l_discount::DECIMAL(18,6))::DOUBLE / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_pushdown" ->
      """SELECT sum((l_extendedprice*l_discount)::DECIMAL(18,6))::DOUBLE AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05::DOUBLE AND l_discount <= 0.07::DOUBLE
        |  AND l_quantity < 24.0::DOUBLE""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey,
        |  sum((l_extendedprice*(1.0-l_discount))::DECIMAL(18,6))::DOUBLE AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  sum((l_extendedprice*(1.0-l_discount))::DECIMAL(18,6))::DOUBLE AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_broadcast_join" ->
      """SELECT p_brand, count(*) AS cnt,
        |  sum(l_quantity::DECIMAL(18,6))::DOUBLE AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 20 GROUP BY p_brand""".stripMargin,
    "q_semi_anti" ->
      """SELECT 'with_orders' AS kind, count(*) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS kind, count(*) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_window" ->
      """WITH monthly AS (
        |  SELECT l_suppkey, date_trunc('month', l_shipdate)::TIMESTAMP AS month,
        |    sum((l_extendedprice*(1.0-l_discount))::DECIMAL(18,6)) AS rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, month, rev::DOUBLE AS rev, rnk, running_rev FROM (
        |  SELECT l_suppkey, month, rev,
        |    row_number() OVER (PARTITION BY l_suppkey ORDER BY rev DESC, month) AS rnk,
        |    (sum(rev) OVER (PARTITION BY l_suppkey ORDER BY month
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE AS running_rev
        |  FROM monthly) WHERE rnk <= 3""".stripMargin,
    "q_collect" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q_salted" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  sum(l_quantity::DECIMAL(18,6))::DOUBLE AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "q_skew_diag" ->
      """WITH counts AS (
        |  SELECT l_suppkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
        |stats AS (SELECT count(*) AS n_keys, sum(cnt)::BIGINT AS total FROM counts)
        |SELECT key, cnt,
        |  cnt * 1000000 // total AS share_ppm,
        |  (cnt * n_keys + total - 1) // total AS salt_factor
        |FROM counts, stats
        |ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    "q_join_estimate" ->
      """WITH counts AS (
        |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT sum(cnt)::BIGINT AS n_rows, count(*) AS n_keys,
        |  max(cnt) AS max_cnt,
        |  sum(cnt * cnt)::BIGINT AS est_pairs,
        |  (sum(cnt * cnt)::BIGINT * 1000000) // sum(cnt)::BIGINT AS blowup_ppm
        |FROM counts""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_ntile" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  first_value(c_custkey) OVER w AS richest_cust
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |             ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::DECIMAL(18,6))::DOUBLE AS sum_qty, count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS d_part,
        |  count(DISTINCT l_suppkey) AS d_supp, count(*) AS total
        |FROM lineitem""".stripMargin,
    "q_union_sort" ->
      """SELECT 'customer' AS kind, c_name AS name, c_acctbal AS bal FROM customer
        |QUALIFY row_number() OVER (ORDER BY c_acctbal DESC, c_name) <= 5
        |UNION ALL
        |SELECT 'supplier' AS kind, s_name AS name, s_acctbal AS bal FROM supplier
        |QUALIFY row_number() OVER (ORDER BY s_acctbal DESC, s_name) <= 5""".stripMargin,
    "q_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  sum(value::DECIMAL(18,6))::DOUBLE AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id""".stripMargin)
}
