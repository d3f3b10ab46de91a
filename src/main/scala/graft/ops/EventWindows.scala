package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Time-window aggregation over the `events` table — the batch twins of
  * the Structured Streaming pipelines in `graft.streaming` (same
  * operators, same semantics; the streaming variants add watermarks).
  *
  * Tumbling windows shuffle once on (window, key); session windows use
  * Spark's native `session_window`, which sorts within the user partition
  * and merges gap-adjacent rows — the oracle cross-checks it against the
  * classic gaps-and-islands SQL formulation.
  */
object EventWindows {

  /** Tumbling 1-hour windows per event_type: `window()` aligns to the
    * epoch exactly like `date_trunc('hour', …)`. `value` is 2-decimal
    * money-shaped, so the decimal accumulator is exact.
    */
  val w1Tumbling: Q = Q.sql(
    "w1_window_tumbling",
    "Tumbling 1h window × event_type: count + exact sum.",
    """SELECT date_trunc('hour', ts) AS window_start,
      |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
      |       event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value,
      |       CAST(MIN(value) AS DOUBLE) AS min_value,
      |       CAST(MAX(value) AS DOUBLE) AS max_value
      |FROM events
      |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"),
        min(col("value")).cast("double").as("min_value"),
        max(col("value")).cast("double").as("max_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"), col("min_value"), col("max_value"))
      .orderBy("window_start", "event_type")
  }

  /** Sessionization with a 30-minute gap via native `session_window`.
    * Oracle is the lag/cumsum gaps-and-islands equivalent: a new session
    * starts when the gap is ≥ 30 min; session end = last event + gap
    * (both formulations share the boundary convention).
    */
  val w2Session: Q = Q.sql(
    "w2_window_session",
    "session_window(ts, 30 min) per user vs gaps-and-islands oracle.",
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |numbered AS (
      |  SELECT user_id, ts,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |       COUNT(*) AS n_events
      |FROM numbered GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val all: Seq[Q] = Seq(w1Tumbling, w2Session)
}
