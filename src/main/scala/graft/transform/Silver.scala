package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silver-layer cleansing/derivation pipelines re-expressed over the
  * testdata tables (SURVEY §2.14; reference
  * notebooks/02_silver_transformation.py:144-329 — null filtering, dedup,
  * string normalization, categorical derivation, bucketing).
  *
  * All scalar work is built-in `functions` (codegen'd, no UDFs) so every
  * expression stays inside WholeStageCodegen at any scale.
  */
object Silver {

  /** transform_events analogue (reference :144-203): filter invalid rows,
    * dedup by event id, normalize, derive time/category/value columns. */
  def cleanEvents(events: DataFrame): DataFrame =
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("event_type").isNotNull)
      .dropDuplicates("event_id")
      .withColumn("event_type", lower(trim(col("event_type"))))
      .withColumn("event_date", to_date(col("ts")))
      .withColumn("event_hour", hour(col("ts")))
      .withColumn("event_category",
        when(col("event_type").isin("purchase", "cart", "checkout"), "commerce")
          .when(col("event_type").isin("click", "view", "scroll"), "engagement")
          .when(col("event_type") === "error", "system")
          .otherwise("other"))
      .withColumn("is_high_value", coalesce(col("value") >= 100.0, lit(false)))

  /** transform_transactions analogue (reference :212-280): status
    * normalization, amount bucketing (same thresholds), urgency flag. */
  def cleanOrders(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull)
      .withColumn("o_orderstatus", upper(trim(col("o_orderstatus"))))
      .withColumn("amount_bucket",
        when(col("o_totalprice") >= 500000, "ENTERPRISE")
          .when(col("o_totalprice") >= 100000, "LARGE")
          .when(col("o_totalprice") >= 10000, "MEDIUM")
          .otherwise("SMALL"))
      .withColumn("is_urgent", col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .withColumn("order_year", year(col("o_orderdate")))

  /** Currency conversion to a reporting currency (reference
    * notebooks/02_silver_transformation.py:231-237, which multiplies by a
    * broadcast-mapped rate). Exact decimal arithmetic; unknown currencies
    * keep a null converted amount so they are auditable rather than
    * silently passed through. The testdata has no currency column, so this
    * is exercised by unit test rather than a driver query. */
  def convertCurrency(
      df: DataFrame,
      amountCol: String,
      currencyCol: String,
      rates: Map[String, BigDecimal],
      target: String = "USD"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val rate = rates.foldLeft(
      when(col(currencyCol) === target, lit(BigDecimal(1))): org.apache.spark.sql.Column) {
      case (c, (cur, r)) => c.when(col(currencyCol) === cur, lit(r))
    }
    df.withColumn(s"${amountCol}_$target",
      (col(amountCol).cast(DecimalType(18, 2)) * rate).cast(DecimalType(18, 2)))
      .withColumn("conversion_rate", rate.cast("double"))
  }

  /** transform_users analogue (reference :289-329): trim/case
    * normalization, balance bucketing, premium flag. */
  def cleanCustomers(customers: DataFrame): DataFrame =
    customers
      .filter(col("c_custkey").isNotNull)
      .withColumn("c_name", trim(col("c_name")))
      .withColumn("c_mktsegment", upper(trim(col("c_mktsegment"))))
      .withColumn("balance_bucket",
        when(col("c_acctbal") < 0, "NEGATIVE")
          .when(col("c_acctbal") < 1000, "LOW")
          .when(col("c_acctbal") < 5000, "MEDIUM")
          .otherwise("HIGH"))
      .withColumn("is_premium", col("c_acctbal") >= 5000)
}
