package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Relational operator pack over the driver's TPC-H-ish tables
  * (SURVEY.md §2.9: the reference has no relational layer; the driver's
  * north star asks for general query capability designed for 100 TB).
  *
  * Float determinism policy (applies to every oracle-compared query here):
  * sums of doubles are order-dependent in the last ulps, and the driver
  * hash-compares values, so every aggregate over a double column must sum
  * an exact, associative, order-independent representation. Two spellings:
  *   - SCALED LONG (round 11, preferred on the hot scan-aggs): the money
  *     columns (l_extendedprice/discount/tax, o_totalprice, events.value)
  *     all carry fixed two-decimal values (verified < 1e-9 drift at every
  *     SF), so `floor(x*100 + 0.5)` recovers the exact cent integer in
  *     pure codegen'd double→long arithmetic; sums run over the long (or
  *     DECIMAL(38,0) of it where group sizes are unbounded — exact and
  *     overflow-proof, and Spark's compact-Decimal path keeps it a long
  *     add), with ONE int→double cast + ONE exact-power-of-ten divide at
  *     output. This replaced the double→DECIMAL(28,6) cast, whose
  *     BigDecimal.valueOf path stringifies every row (r_q1 at 100×:
  *     10.3 → 3.5 s together with the plain-scan load).
  * Window frames sum the cent LONG directly (a per-user frame/partition
  * sum is orders of magnitude inside the int64 envelope even for a
  * hot-user partition at 100 TB); unbounded group aggregates go through
  * DECIMAL(38,0). Per-row double arithmetic is IEEE-deterministic and
  * needs no such treatment.
  *
  * Timestamp policy: `events.ts` is ns-precision parquet; DuckDB truncates
  * it to µs at read, exactly like `ts_ns div 1000` (verified). Every
  * oracle-compared expression over event time therefore uses the derived
  * µs epoch (`ts_us`) — ordering included — never raw ns or TIMESTAMP.
  */
object Relational {

  /** Exact cent integer of a two-decimal money column (policy note above). */
  private def cents(c: Column) = floor(c * 100 + lit(0.5)).cast("long")

  /** Events with the µs epoch all oracle-compared queries key on. */
  private def eventsUs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))

  /** Scan-shaped twin ([[Tables.eventsScan]]): for queries whose
    * per-row work above the scan is TRIVIAL and whose keys are not
    * user_id (value bands, the fixed-universe pivot) — there the spread
    * is a wasted full-table exchange. Queries with expensive per-row
    * compute (JSON parsing, countDistinct expansion) KEEP the spread:
    * measured at 100×, events_value_corr and r_hourly_event_stats run
    * ~20-30% slower on the raw 8-file scan because the hot per-row
    * stage loses the 32-way fan-out (the documented parallelized rule,
    * confirmed per consumer). */
  private def eventsUsScan(s: SparkSession, d: String): DataFrame =
    Tables.eventsScan(s, d).withColumn("ts_us", expr("ts_ns div 1000"))

  // -----------------------------------------------------------------------
  // Joins
  // -----------------------------------------------------------------------

  /** Revenue per nation: orders ⨝ customer (shuffle/SMJ on the big keys)
    * ⨝ nation (explicit broadcast — a dim table is broadcast at any scale).
    * The canonical star-schema plan: one wide shuffle on o_custkey, the
    * nation lookup never shuffles. */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        (sum(cents(col("o_totalprice")).cast(DecimalType(38, 0)))
          .cast("double") / 100).as("total_revenue"))

  /** P4-style left-semi: customers holding at least one open ('P') order.
    * Semi joins ship only the key column of the build side — at 100 TB the
    * orders side is pre-aggregated to distinct keys by Spark's plan. */
  def customersWithOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
        orders.filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Left-anti twin: customers with NO open order (56 rows at sf0.01 —
    * chosen over plain "no orders", which is vacuously empty here). */
  def customersWithoutOpenOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(
        orders.filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")

  // -----------------------------------------------------------------------
  // Window functions over events
  // -----------------------------------------------------------------------

  /** Latest 3 events per user: rank in a per-user window. One shuffle on
    * user_id; per-partition sort only (no global sort). */
  def latestEventsPerUser(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("user_id"), col("rn"), col("event_id"), col("event_type"), col("ts_us"))
  }

  /** Sliding-frame aggregate: per-user running sum of `value` over the
    * current + 3 preceding events (exact cent-LONG sums, so frame order
    * can't perturb the float hash). */
  def rollingValuePerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    events.select(
      col("user_id"), col("event_id"), col("ts_us"),
      (sum(cents(col("value"))).over(w).cast("double") / 100).as("rolling_value"))
  }

  /** Trailing-hour rolling sum via a RANGE frame (vs
    * [[rollingValuePerUser]]'s ROWS frame): the frame is defined by the
    * µs-epoch VALUE, so sparse users aggregate exactly the events inside
    * the physical hour, and equal-timestamp rows all join the frame —
    * which also makes the result independent of tie order, no
    * tiebreak column needed. One exchange on user_id (pre-spread). */
  def trailingHourValue(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    events.select(
      col("user_id"), col("event_id"), col("ts_us"),
      (sum(cents(col("value"))).over(w).cast("double") / 100).as("trailing_value"))
  }

  /** Inter-event gap histogram: LAG over each user's timeline, bucketed
    * to minutes — the arrival-process view sessionization thresholds are
    * tuned against. First events (no predecessor) are excluded. */
  def intereventGapHistogram(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"),
        (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy(expr("gap_us div 60000000").as("gap_minutes"))
      .agg(count(lit(1)).as("n_gaps"))
  }

  /** Tumbling 1-hour windows: classic streaming-shaped aggregation done in
    * batch — group on the derived hour bucket (µs epoch div 3.6e9). */
  def hourlyEventStats(events: DataFrame): DataFrame =
    events.groupBy(
        expr("ts_us div 3600000000").as("hour_bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents(col("value")).cast(DecimalType(38, 0)))
          .cast("double") / 100).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  /** Cohort retention matrix: users grouped by their first-activity day
    * (the cohort), counted on each later active day as an offset — the
    * standard product-analytics retention triangle. Shape: one groupBy
    * on user_id for the cohort day, one (user, day) distinct, then a
    * user-keyed join (co-partitioned with the first shuffle — at scale
    * both sides hash on user_id, no re-exchange) and a tiny
    * (cohort, offset)-keyed rollup. Day buckets are µs-epoch div
    * 86400e6, the table's timestamp policy. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_us"))
      .select(col("user_id"), expr(s"first_us div ${dayUs}L").as("cohort_day"))
    val activeDays = events
      .select(col("user_id"), expr(s"ts_us div ${dayUs}L").as("active_day"))
      .distinct()
    activeDays.join(firstDay, "user_id")
      .groupBy(col("cohort_day"),
        (col("active_day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  // -----------------------------------------------------------------------
  // Top-k per group, set ops, sketches
  // -----------------------------------------------------------------------

  /** Top-3 parts per brand by retail price (deterministic p_partkey
    * tiebreak). Window top-k: shuffle on the group key only, never a
    * global sort — the plan that survives any scale. */
  def topPartsPerBrand(part: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_name"), col("p_retailprice"))
  }

  /** UNION / INTERSECT / EXCEPT in one result, tagged. Set A = BUILDING-
    * segment customers, set B = acctbal > 5000 customers. Spark's
    * `intersect`/`except` are set-distinct; the union branch adds an
    * explicit distinct to match SQL UNION. */
  def customerSetOps(customer: DataFrame): DataFrame = {
    val a = customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = customer.filter(col("c_acctbal") > 5000).select("c_custkey")
    a.union(b).distinct().withColumn("op", lit("union"))
      .union(a.intersect(b).withColumn("op", lit("intersect")))
      .union(a.except(b).withColumn("op", lit("except")))
      .select("op", "c_custkey")
  }

  /** A4-at-scale: HyperLogLog++ cardinality next to the exact count. No
    * DuckDB oracle for the sketch column (different sketch algorithm) —
    * registered for the rows-only check; the exact column lets a reader
    * judge the sketch error. The oracle-able columns are hash-checked
    * separately by [[distinctUsersExact]] / `r_distinct_users_exact`. */
  def approxDistinctUsers(events: DataFrame): DataFrame =
    events.agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"),
      count(lit(1)).as("n_events"))

  /** The exact-aggregate companion of [[approxDistinctUsers]], split out
    * so the driver's DuckDB oracle hash-checks what IS oracle-able. */
  def distinctUsersExact(events: DataFrame): DataFrame =
    events.agg(
      countDistinct(col("user_id")).as("exact_users"),
      count(lit(1)).as("n_events"))

  /** As-of join, composed from existing ops (the brief's example of an
    * operator Spark lacks): for every purchase event, the most recent
    * prior click by the same user. Instead of a per-key sort-probe, one
    * window pass per user carries the last-seen click forward
    * (`last(when(...), ignoreNulls)`) — a single shuffle on user_id,
    * no self-join, no range explosion; the formulation that scales. */
  def asofPurchaseAfterClick(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id"), col("ts_us"),
        col("last_click_ts"),
        (col("ts_us") - col("last_click_ts")).as("us_since_click"))
  }

  /** The same as-of join as a KEYED MERGE via
    * `KeyValueGroupedDataset.cogroup` — the general-purpose distributed
    * as-of engine: one shuffle per side on the join key, then a
    * per-key sorted two-pointer merge (O(n_clicks + n_purchases) per
    * user, vs the window form's carry-forward over the UNION of both
    * event types). Same semantics and the same DuckDB oracle as
    * `r_asof_purchase_click` — two independently-derived plans, one
    * hash. The window form wins when both sides share one table (one
    * shuffle total); cogroup wins when left and right are DIFFERENT
    * relations (trades × quotes), where the window trick would first
    * union them. Per-key buffers hold one user's events — bounded by
    * per-key cardinality, not corpus size. */
  def asofCogroup(events: DataFrame): DataFrame = {
    val ss = events.sparkSession
    import ss.implicits._
    val ev = events.select(
        col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .as[(Long, Long, Long, String)]
    val purchases = ev.filter(_._4 == "purchase").groupByKey(_._1)
    val clicks = ev.filter(_._4 == "click").groupByKey(_._1)
    purchases.cogroup(clicks) { (_, ps, cs) =>
      val cArr = cs.toArray.sortBy(e => (e._3, e._2))
      val pArr = ps.toArray.sortBy(e => (e._3, e._2))
      var j = 0
      var lastClick: Option[Long] = None
      pArr.iterator.map { p =>
        while (j < cArr.length &&
            (cArr(j)._3 < p._3 || (cArr(j)._3 == p._3 && cArr(j)._2 < p._2))) {
          lastClick = Some(cArr(j)._3); j += 1
        }
        AsofRow(p._1, p._2, p._3, lastClick, lastClick.map(p._3 - _))
      }
    }.toDF()
  }

  /** Gap-based sessionization: a new session starts after 30 min of user
    * inactivity. Two stacked windows on the same (user_id, time) ordering
    * — Catalyst reuses one sort/exchange for both — then a per-session
    * aggregation. Pure integer µs arithmetic, fully oracle-able. */
  def sessionizeEvents(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("new_session",
        when(lag(col("ts_us"), 1).over(w).isNull ||
          col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
  }

  /** Non-equi range join: events banded by value against an inline band
    * dim. The dim is broadcast, so the plan is a BroadcastNestedLoopJoin
    * — the correct shape for tiny-dim range predicates at any scale. */
  def valueBandJoin(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    val bands = spark.createDataFrame(Seq(
        ("low", 0.0, 5.0), ("mid", 5.0, 10.0), ("high", 10.0, 15.0),
        ("extreme", 15.0, 1e9)))
      .toDF("band", "lo", "hi")
    events.join(broadcast(bands),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(cents(col("value")).cast(DecimalType(38, 0)))
          .cast("double") / 100).as("total_value"))
  }

  /** ROLLUP aggregation: order counts/revenue at (status, priority),
    * (status), and grand-total levels in one pass. */
  /** The event-type universe, fixed so `pivot` needs no values-discovery
    * pass (an extra corpus scan at any scale). */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per user-bucket event-type counts as columns — the
    * wide-report shape. Explicit pivot values keep it one aggregation;
    * missing cells fill 0 so the output is dense. */
  def eventTypePivot(events: DataFrame): DataFrame =
    events.withColumn("user_bucket", col("user_id") % 10)
      .groupBy(col("user_bucket"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L)

  /** Ordered 3-stage conversion funnel (view → click → purchase, each
    * stage strictly at-or-after the previous one's FIRST occurrence):
    * the sequence-sensitive analytics query a plain per-type count
    * cannot answer. Three window passes share ONE user_id exchange —
    * and the events loader already spreads by user_id, so the plan is
    * exchange-free on top of the scan; the final 1-row aggregate ships
    * only per-user booleans. */
  def funnelQuery(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .withColumn("v",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts_us") >= col("v"),
          col("ts_us"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts_us") >= col("c"),
          col("ts_us"))).over(w))
      .agg(
        countDistinct(when(col("v").isNotNull, col("user_id"))).as("users_viewed"),
        countDistinct(when(col("c").isNotNull, col("user_id"))).as("users_clicked_after_view"),
        countDistinct(when(col("p").isNotNull, col("user_id"))).as("users_purchased_after_click"))
  }

  def orderRollup(orders: DataFrame): DataFrame =
    orders.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice")).cast(DecimalType(38, 0)))
          .cast("double") / 100).as("revenue"))

  /** TPC-H Q1-style pricing summary. Map-side partial aggregation into a
    * 6-group shuffle — the canonical "scales to any size" aggregate.
    *
    * Scaled-LONG measure arithmetic (round 11; verdict r10 #3): lineitem's
    * price/discount/tax columns carry fixed two-decimal values (verified:
    * max |x*100 - round(x*100)| < 1e-9 across all SFs), so
    * `floor(x*100 + 0.5)` recovers the exact cent/percent integer and the
    * per-row measure products are exact LONG arithmetic — no per-row
    * double→DECIMAL cast (which stringifies through BigDecimal.valueOf and
    * made this plain scan-agg the #2 non-memo query at 100×, 10.3 s). The
    * per-row long products are bounded (~5.5e10 for the triple product),
    * and the SUM still runs over DECIMAL(38,0) — exact, associative, and
    * overflow-proof at any corpus size (a LONG sum would wrap near 1.7e8
    * rows/group at full price magnitude, i.e. below 100 TB scale); Spark's
    * compact-Decimal fast path makes it a long-add until the running sum
    * crosses 1e18. One double rounding at output (int→double cast, then
    * one exact-power-of-ten divide), mirrored verbatim in the oracle:
    * DuckDB sums BIGINT into exact HUGEINT, casts once, divides once. */
  def q1(lineitem: DataFrame): DataFrame = {
    val price = cents(col("l_extendedprice"))
    val disc = cents(col("l_discount"))
    val tax = cents(col("l_tax"))
    val big = DecimalType(38, 0)
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(price.cast(big)).cast("double") / 100).as("sum_base_price"),
        (sum((price * (lit(100L) - disc)).cast(big)).cast("double") / 10000)
          .as("sum_disc_price"),
        (sum((price * (lit(100L) - disc) * (lit(100L) + tax)).cast(big))
          .cast("double") / 1000000).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r_q1_pricing_summary" -> ((s, d) => q1(Tables.lineitem(s, d))),
    "r_revenue_by_nation" -> ((s, d) =>
      revenueByNation(Tables.orders(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    "r_semi_open_orders" -> ((s, d) =>
      customersWithOpenOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "r_anti_open_orders" -> ((s, d) =>
      customersWithoutOpenOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "r_latest_events_per_user" -> ((s, d) => latestEventsPerUser(eventsUs(s, d))),
    "r_rolling_value_per_user" -> ((s, d) => rollingValuePerUser(eventsUs(s, d))),
    "r_hourly_event_stats" -> ((s, d) => hourlyEventStats(eventsUs(s, d))),
    "r_cohort_retention" -> ((s, d) => cohortRetention(eventsUs(s, d))),
    "r_top_parts_per_brand" -> ((s, d) => topPartsPerBrand(Tables.part(s, d))),
    "r_set_ops_customers" -> ((s, d) => customerSetOps(Tables.customer(s, d))),
    "r_approx_distinct_users" -> ((s, d) => approxDistinctUsers(eventsUs(s, d))),
    "r_distinct_users_exact" -> ((s, d) => distinctUsersExact(eventsUs(s, d))),
    "r_asof_purchase_click" -> ((s, d) => asofPurchaseAfterClick(eventsUs(s, d))),
    "r_asof_cogroup" -> ((s, d) => asofCogroup(eventsUs(s, d))),
    "r_sessionize_events" -> ((s, d) => sessionizeEvents(eventsUs(s, d))),
    "r_value_band_join" -> ((s, d) => valueBandJoin(eventsUsScan(s, d))),
    "r_order_rollup" -> ((s, d) => orderRollup(Tables.orders(s, d))),
    "r_event_type_pivot" -> ((s, d) => eventTypePivot(eventsUsScan(s, d))),
    "r_funnel_conversion" -> ((s, d) => funnelQuery(eventsUs(s, d))),
    "r_trailing_hour_value" -> ((s, d) => trailingHourValue(eventsUs(s, d))),
    "r_interevent_gap_histogram" -> ((s, d) => intereventGapHistogram(eventsUs(s, d))))

  /** One oracle, two independently-derived Spark plans (window
    * carry-forward and cogroup merge) — both must hash to it. */
  private val AsofOracleSql =
    """SELECT user_id, event_id, ts_us, last_click_ts,
      |       ts_us - last_click_ts AS us_since_click
      |FROM (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
      |         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
      |  FROM events)
      |WHERE event_type = 'purchase'""".stripMargin

  def oracles: Map[String, String] = Map(
    "r_trailing_hour_value" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS trailing_value
        |FROM events""".stripMargin,
    "r_interevent_gap_histogram" ->
      """WITH g AS (
        |  SELECT epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events)
        |SELECT gap_us // 60000000 AS gap_minutes, count(*) AS n_gaps
        |FROM g WHERE gap_us IS NOT NULL GROUP BY 1""".stripMargin,
    "r_event_type_pivot" -> {
      val cells = EventTypes.map(t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t")
        .mkString(",\n|  ")
      s"""SELECT user_id % 10 AS user_bucket,
         |  $cells
         |FROM events GROUP BY 1""".stripMargin
    },
    "r_funnel_conversion" ->
      """WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |u AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS v
        |      FROM t GROUP BY user_id),
        |c AS (SELECT t.user_id, min(t.ts_us) AS c
        |      FROM t JOIN u ON t.user_id = u.user_id
        |      WHERE t.event_type = 'click' AND t.ts_us >= u.v GROUP BY t.user_id),
        |p AS (SELECT t.user_id, min(t.ts_us) AS p
        |      FROM t JOIN c ON t.user_id = c.user_id
        |      WHERE t.event_type = 'purchase' AND t.ts_us >= c.c GROUP BY t.user_id)
        |SELECT (SELECT count(*) FROM u WHERE v IS NOT NULL) AS users_viewed,
        |       (SELECT count(*) FROM c) AS users_clicked_after_view,
        |       (SELECT count(*) FROM p) AS users_purchased_after_click""".stripMargin,
    "r_distinct_users_exact" ->
      """SELECT count(DISTINCT user_id) AS exact_users, count(*) AS n_events
        |FROM events""".stripMargin,
    // Scaled-LONG spelling mirroring q1: exact cent/percent integers per
    // row, exact integer sums (DuckDB BIGINT sum → HUGEINT), ONE
    // int→double cast then one exact-power-of-ten divide per measure.
    "r_q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000 AS sum_disc_price,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |           * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000 AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "r_revenue_by_nation" ->
      """SELECT n_name,
        |  count(*) AS n_orders,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "r_semi_open_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "r_anti_open_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "r_latest_events_per_user" ->
      """SELECT user_id, rn, event_id, event_type, ts_us FROM (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 3""".stripMargin,
    "r_rolling_value_per_user" ->
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS rolling_value
        |FROM events""".stripMargin,
    "r_hourly_event_stats" ->
      """SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "r_cohort_retention" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS active_day FROM events),
        |f AS (SELECT user_id, min(active_day) AS cohort_day FROM t GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, active_day FROM t)
        |SELECT f.cohort_day, a.active_day - f.cohort_day AS day_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "r_top_parts_per_brand" ->
      """SELECT p_brand, rn, p_partkey, p_name, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_name, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part)
        |WHERE rn <= 3""".stripMargin,
    "r_asof_purchase_click" -> AsofOracleSql,
    "r_asof_cogroup" -> AsofOracleSql,
    "r_sessionize_events" ->
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (
        |  SELECT user_id, ts_us,
        |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM t)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |       min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |       max(ts_us) - min(ts_us) AS duration_us
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "r_value_band_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('low', 0.0, 5.0), ('mid', 5.0, 10.0), ('high', 10.0, 15.0),
        |  ('extreme', 15.0, 1000000000.0))
        |SELECT band, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS total_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band""".stripMargin,
    "r_order_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS revenue
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "r_set_ops_customers" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)""".stripMargin)
}

/** Output row of [[Relational.asofCogroup]] — field order is the output
  * column order the oracle expects. */
final case class AsofRow(user_id: Long, event_id: Long, ts_us: Long,
    last_click_ts: Option[Long], us_since_click: Option[Long])
