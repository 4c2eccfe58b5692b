package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer analytical pipelines.
  *
  * Re-expresses the reference's five gold aggregate builds
  * (reference: notebooks/03_gold_aggregation.py:52-350) over the testdata
  * star schema. All pipelines are pure `DataFrame => DataFrame` so they run
  * on any input partitioning; aggregates shuffle once on their group keys
  * and Catalyst plans partial (map-side) aggregation automatically.
  *
  * Numeric discipline (for oracle parity and determinism at any partition
  * count): money sums are computed in DECIMAL (exact, order-insensitive)
  * and only converted to double at the very end; ratios are derived from
  * exact longs/decimals.
  */
object Gold {

  /** Exact decimal sum of a double column, emitted as double. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Ratio of two exact counts as double, rounded. */
  private def ratio(num: Column, den: Column, scale: Int = 4): Column =
    round(num.cast("double") / den.cast("double"), scale)

  /** daily_user_activity — reference notebooks/03_gold_aggregation.py:52-91.
    * filter→groupBy(date,user)→9 aggs→derived duration + power-user flag.
    */
  def dailyUserActivity(events: DataFrame): DataFrame = {
    events
      .withColumn("event_date", to_date(col("ts")))
      .groupBy(col("event_date"), col("user_id"))
      .agg(
        count(lit(1)).as("total_events"),
        countDistinct(col("event_type")).as("distinct_event_types"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("click_events"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("view_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("error_events"),
        dsum(col("value")).as("total_value"),
        unix_timestamp(min(col("ts"))).as("first_event_sec"),
        unix_timestamp(max(col("ts"))).as("last_event_sec"))
      .withColumn("session_duration_minutes",
        round((col("last_event_sec") - col("first_event_sec")) / lit(60.0), 4))
      .withColumn("is_power_user", col("total_events") >= 5)
  }

  /** daily_transaction_analytics — reference 03_gold_aggregation.py:100-149.
    * Orders stand in for transactions; customer for the user dimension.
    * Left join keeps orders with no matching customer; the dim side is
    * broadcast-able (Catalyst decides under the threshold; at 100TB the
    * customer dim is still << fact side).
    */
  def dailyTransactionAnalytics(orders: DataFrame, customer: DataFrame): DataFrame = {
    val dim = customer.select(col("c_custkey"), col("c_mktsegment"))
    orders
      .join(dim, orders("o_custkey") === dim("c_custkey"), "left")
      .withColumn("order_date", to_date(col("o_orderdate")))
      .groupBy(col("order_date"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("total_orders"),
        countDistinct(col("o_custkey")).as("distinct_customers"),
        dsum(col("o_totalprice")).as("total_amount"),
        round(avg(col("o_totalprice").cast(DecimalType(18, 2))), 4).cast("double").as("avg_amount"),
        min(col("o_totalprice")).as("min_amount"),
        max(col("o_totalprice")).as("max_amount"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fulfilled_orders"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("open_orders"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("urgent_orders"),
        countDistinct(col("o_orderpriority")).as("distinct_priorities"))
      .withColumn("success_rate", ratio(col("fulfilled_orders"), col("total_orders")))
      .withColumn("customer_segment",
        when(col("total_amount") >= 500000, "ENTERPRISE")
          .when(col("total_amount") >= 100000, "LARGE")
          .when(col("total_amount") >= 10000, "MEDIUM")
          .otherwise("SMALL"))
  }

  /** user_ltv — reference 03_gold_aggregation.py:158-228.
    * Two independent aggregates (txn metrics from orders, engagement from
    * events) left-joined onto the customer dim; coalesce defaults; score
    * formulas; segment bucketing. Aggregates shuffle on user key; the final
    * join is dim-sized (one row per customer) so AQE can pick broadcast.
    */
  def userLtv(orders: DataFrame, events: DataFrame, customer: DataFrame): DataFrame = {
    val txn = orders.groupBy(col("o_custkey").as("user_id")).agg(
      count(lit(1)).as("order_count"),
      dsum(col("o_totalprice")).as("total_spent"),
      round(avg(col("o_totalprice").cast(DecimalType(18, 2))), 4).cast("double").as("avg_order_value"),
      unix_timestamp(min(col("o_orderdate"))).as("first_order_sec"),
      unix_timestamp(max(col("o_orderdate"))).as("last_order_sec"),
      countDistinct(to_date(col("o_orderdate"))).as("active_order_days"))
    val eng = events.groupBy(col("user_id")).agg(
      count(lit(1)).as("event_count"),
      countDistinct(col("event_type")).as("event_type_count"),
      countDistinct(to_date(col("ts"))).as("active_event_days"),
      dsum(col("value")).as("total_event_value"))
    customer.select(col("c_custkey").as("user_id"), col("c_mktsegment"), col("c_acctbal"))
      .join(txn, Seq("user_id"), "left")
      .join(eng, Seq("user_id"), "left")
      .select(
        col("user_id"), col("c_mktsegment"),
        coalesce(col("order_count"), lit(0L)).as("order_count"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"),
        coalesce(col("avg_order_value"), lit(0.0)).as("avg_order_value"),
        coalesce(col("active_order_days"), lit(0L)).as("active_order_days"),
        coalesce(col("event_count"), lit(0L)).as("event_count"),
        coalesce(col("event_type_count"), lit(0L)).as("event_type_count"),
        coalesce(col("active_event_days"), lit(0L)).as("active_event_days"),
        coalesce(col("total_event_value"), lit(0.0)).as("total_event_value"))
      .withColumn("ltv_score",
        // Exact decimal arithmetic end-to-end: total_spent is an exact 2-dp
        // value (decimal sum emitted as double), so the cast back recovers it
        // exactly; every term and the sum stay decimal, and only the final
        // result is converted to double. Rounding an exact decimal is engine-
        // independent, unlike rounding a binary double sitting on a .5 ulp.
        round(col("total_spent").cast(DecimalType(20, 2)) * lit(BigDecimal("0.5")) +
          col("order_count") * 100 + col("event_count") * 10 +
          col("active_event_days") * 50, 4).cast("double"))
      .withColumn("ltv_segment",
        when(col("ltv_score") >= 200000, "PLATINUM")
          .when(col("ltv_score") >= 100000, "GOLD")
          .when(col("ltv_score") >= 50000, "SILVER")
          .otherwise("BRONZE"))
  }

  /** cohort_retention — reference 03_gold_aggregation.py:237-289.
    * Cohort month = first order month per customer; retention = distinct
    * active customers per (cohort, month offset) / cohort size.
    */
  def cohortRetention(orders: DataFrame): DataFrame = {
    val firstOrder = orders.groupBy(col("o_custkey"))
      .agg(min(date_trunc("month", col("o_orderdate"))).as("cohort_ts"))
    val activity = orders
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("activity_ts"))
      .distinct()
    val joined = activity.join(firstOrder, "o_custkey")
      .withColumn("months_since_cohort",
        months_between(col("activity_ts"), col("cohort_ts")).cast("int"))
    val cohortSizes = firstOrder
      .groupBy(col("cohort_ts")).agg(countDistinct(col("o_custkey")).as("cohort_size"))
    joined
      .groupBy(col("cohort_ts"), col("months_since_cohort"))
      .agg(countDistinct(col("o_custkey")).as("active_users"))
      .join(cohortSizes, "cohort_ts")
      .select(
        to_date(col("cohort_ts")).as("cohort_month"),
        col("months_since_cohort"),
        col("active_users"),
        col("cohort_size"),
        ratio(col("active_users"), col("cohort_size")).as("retention_rate"))
  }

  /** daily_kpis — reference 03_gold_aggregation.py:298-350.
    * Three global single-row aggregates crossJoined (each side is exactly
    * one row, so the cross join is trivially broadcast) + derived rates.
    */
  def dailyKpis(orders: DataFrame, events: DataFrame, customer: DataFrame): DataFrame = {
    val revenue = orders.agg(
      dsum(col("o_totalprice")).as("total_revenue"),
      count(lit(1)).as("total_orders"),
      countDistinct(col("o_custkey")).as("ordering_customers"))
    val engagement = events.agg(
      count(lit(1)).as("total_events"),
      countDistinct(col("user_id")).as("active_users"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchase_events"))
    val users = customer.agg(
      count(lit(1)).as("total_customers"),
      dsum(col("c_acctbal")).as("total_acctbal"))
    revenue.crossJoin(engagement).crossJoin(users)
      .withColumn("conversion_rate", ratio(col("purchase_events"), col("total_events")))
      .withColumn("revenue_per_customer",
        round(col("total_revenue") / col("total_customers").cast("double"), 4))
      .withColumn("orders_per_customer", ratio(col("total_orders"), col("total_customers")))
  }

  /** Pricing summary (TPC-H Q1 shape) over lineitem — the canonical
    * wide-aggregate benchmark query; whole-stage-codegen'd hash aggregate
    * with map-side partials, shuffling only the tiny group-key space.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val dec = DecimalType(18, 2)
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DecimalType(28, 4))).cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity").cast(dec)), 4).cast("double").as("avg_qty"),
        round(avg(col("l_extendedprice").cast(dec)), 4).cast("double").as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  /** Top customers by revenue — agg + top-k + broadcast join-back.
    *
    * The top-k runs BEFORE the dim join as `orderBy().limit(n)`, which
    * Catalyst plans as `TakeOrderedAndProject`: each partition keeps a
    * local n-row heap and the driver merges heaps — no global sort, no
    * full-aggregate shuffle to one partition. The n surviving rows are
    * broadcast to the dim join, and the rank window runs over exactly n
    * rows (deterministic: exact decimal revenue with key tiebreak).
    */
  def topCustomers(orders: DataFrame, customer: DataFrame, n: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = orders.groupBy(col("o_custkey")).agg(
      sum(col("o_totalprice").cast(DecimalType(18, 2))).as("revenue_dec"),
      count(lit(1)).as("order_count"))
    val top = rev.orderBy(col("revenue_dec").desc, col("o_custkey").asc).limit(n)
    val dim = customer.select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val w = Window.orderBy(col("revenue_dec").desc, col("o_custkey").asc)
    broadcast(top).join(dim, top("o_custkey") === dim("c_custkey"), "inner")
      .withColumn("rank", row_number().over(w))
      .select(
        col("rank"), col("o_custkey").as("custkey"), col("c_name"),
        col("c_mktsegment"), col("revenue_dec").cast("double").as("revenue"),
        col("order_count"))
  }

  /** Revenue by region — multi-hop dim join chain (lineitem⋈supplier⋈nation
    * ⋈region); dims are broadcast. */
  def regionRevenue(lineitem: DataFrame, supplier: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame = {
    val dec = DecimalType(18, 2)
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).cast(DecimalType(28, 4))).cast("double").as("revenue"),
        count(lit(1)).as("lineitem_count"),
        countDistinct(col("l_suppkey")).as("supplier_count"))
  }
}
