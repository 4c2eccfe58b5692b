package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Event-time streaming aggregations — the Spark-first streaming surface
  * beyond the reference's stateless ingestion (SURVEY §2.11 notes the
  * reference never uses watermarks/windows; a training-data pipeline at
  * scale needs them, so they are first-class here).
  *
  * Everything is expressed with built-in event-time machinery: `window()`
  * tumbling/sliding aggregates bounded by `withWatermark` (state is evicted
  * once the watermark passes, so long-running streams hold bounded state),
  * and custom session state via `flatMapGroupsWithState` with event-time
  * timeouts.
  */
object WindowedAggs {

  /** Tumbling event-time counts per key: one row per (window, key) emitted
    * once the watermark closes the window (append mode compatible). */
  def tumblingCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowLength: String = "10 minutes",
      watermarkDelay: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("events"), approx_count_distinct(keyCol).as("approx_keys"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("events"))

  /** Sliding-window rates (e.g. 10-minute windows every 5 minutes). */
  def slidingCounts(
      events: DataFrame,
      tsCol: String,
      windowLength: String,
      slide: String,
      watermarkDelay: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength, slide))
      .agg(count(lit(1)).as("events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("events"))

  /** Streaming exact dedup with BOUNDED state: duplicates arriving within
    * the watermark delay of each other collapse to one row, and the dedup
    * state for a key is evicted once the watermark passes it — unlike plain
    * `dropDuplicates`, which keys state forever and OOMs an unbounded
    * stream. The streaming leg of the dedup suite (batch:
    * [[graft.dedup.Dedup.exact]]). */
  def streamingDedup(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Watermarked stream-stream inner join with a time-range condition —
    * e.g. clicks attributed to the impression they followed within
    * `within`. Both sides carry watermarks and the range bound is part of
    * the join condition, which is exactly what lets Spark EVICT buffered
    * state: without the bound each side would buffer forever. Column
    * names must be disjoint apart from nothing — the key columns are
    * passed per side. */
  def streamStreamJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      within: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(leftTs) >= col(rightTs) &&
        col(leftTs) <= col(rightTs) + expr(s"INTERVAL $within"))
  }

  /** Built-in session windows: `session_window(ts, gap)` merges events
    * within `gap` of each other into one variable-length window per key —
    * the declarative counterpart of [[sessionize]] (which shows the
    * custom-state path). State is merged and evicted by the watermark;
    * one summary row per closed session in append mode. */
  def sessionWindowCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("events"))

  case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(firstTs: Long, lastTs: Long, events: Int)
  case class SessionSummary(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      events: Int,
      duration_sec: Long)

  /** Custom sessionization via flatMapGroupsWithState: a session closes when
    * `gapSeconds` pass without activity for the key (event-time timeout
    * driven by the stream's watermark). Emits one summary row per closed
    * session — the KeyValueGroupedDataset stateful path the brief calls out. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapSeconds: Long = 1800,
      watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, new Timestamp(s.firstTs),
              new Timestamp(s.lastTs), s.events, (s.lastTs - s.firstTs) / 1000))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
                  cur = Some(s.copy(lastTs = math.max(s.lastTs, t), events = s.events + 1))
                case Some(s) => // gap exceeded inside the batch: close + restart
                  closed ::= SessionSummary(userId, new Timestamp(s.firstTs),
                    new Timestamp(s.lastTs), s.events, (s.lastTs - s.firstTs) / 1000)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
