package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a session is a maximal run
  * of one user's events where consecutive gaps stay under `gapMinutes`
  * (the classic web-analytics 30-minute rule).
  *
  * Scale shape: ONE shuffle on the user key; both windows (the lag and the
  * running session counter) share the same (user, ts) ordering, so Catalyst
  * plans a single sort per partition and the whole assignment is narrow
  * after that shuffle. Session ids are (user_id, session_idx) pairs — never
  * a global sequence, which would serialize at scale.
  *
  * The batch counterpart of Structured Streaming session windows
  * (`session_window(ts, gap)`); batch pipelines prefer this shape because
  * it composes with plain windows and needs no watermark.
  */
object Sessionize {

  /** Per-event session assignment: adds `session_idx` (0-based per user)
    * and `is_session_start`. Ordering ties on `ts` break by `idCol` so the
    * assignment is total and deterministic. */
  def assign(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val isStart = prevTs.isNull ||
      (unix_timestamp(col(tsCol)) - unix_timestamp(prevTs)) > gapMinutes * 60L
    events
      .withColumn("is_session_start", isStart)
      .withColumn("session_idx",
        (sum(when(col("is_session_start"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L))
  }

  /** One row per session: bounds, event count, distinct event types, and
    * the decimal-exact value total (double sums are order-dependent and
    * would not reproduce across engines or partitionings). */
  def summarize(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      idCol: String = "event_id",
      valueCol: String = "value",
      gapMinutes: Int = 30): DataFrame =
    assign(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(unix_timestamp(col(tsCol))).as("session_start_sec"),
        max(unix_timestamp(col(tsCol))).as("session_end_sec"),
        count(lit(1)).as("session_events"),
        countDistinct(col("event_type")).as("distinct_event_types"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("session_value"))
}
