package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Event-stream analytics in batch form (SURVEY §2.10's batch twins).
  * The same transformations run under Structured Streaming in
  * [[graft.streaming.EventsStream]]; batch keeps them oracle-checkable.
  */
object EventQueries {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  /** Epoch micros of the naive event timestamp (UTC session). */
  private def tsMicros = expr("unix_micros(cast(ts as timestamp))")

  // ---------------------------------------------------------------- q14
  /** JSON property extraction + per-type rollup (SURVEY F-ext: the
    * `events.props` JSON column). get_json_object is a single-pass
    * path evaluation — no UDF, pushed alongside the scan. */
  def q14EventsJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .withColumn("k_val", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(avg($"value"), 4).as("avg_value"),
        round(sum($"value"), 4).as("sum_value"),
        max($"k_val").as("max_k"),
        sum($"k_val").cast("long").as("sum_k"))
  }

  // ---------------------------------------------------------------- q15
  /** Sessionization: 30-minute inactivity gap → session ids via
    * lag + running sum of boundaries (SURVEY §2.7/§2.10). One shuffle on
    * user_id; both window passes share that partitioning. Gap test is
    * `>=` to agree exactly with `session_window` semantics (an event at
    * exactly start+gap opens a new session) — see EventsStream. */
  def q15Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000 * 1000
    ev(spark, dir)
      .withColumn("prev_us", lag(tsMicros, 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull || (tsMicros - $"prev_us") >= gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_id")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"))
  }

  // ---------------------------------------------------------------- q16
  /** Tumbling-window aggregation (batch twin of the streaming
    * `window($"ts","1 hour")` plan): date_trunc keeps the key scalar and
    * oracle-comparable. */
  def q16TumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .groupBy(
        date_trunc("hour", $"ts").as("window_start"),
        $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"))
  }

  // ---------------------------------------------------------------- q43
  /** Sliding-window aggregation (batch twin of the streaming
    * `slidingCounts` plan, SURVEY §2.10): 1-hour windows sliding every
    * 30 minutes, so every event lands in exactly length/slide = 2
    * windows. Spark's `window()` IS the explode over covering window
    * starts — the plan is one generator + the same single aggregation
    * shuffle as q16, input amplified by the overlap factor (at 100 TB
    * the factor is the knob: length/slide bounds both the explode and a
    * stream's state). StreamingSpec pins `slidingCounts` equal to this
    * frame; the DuckDB oracle rebuilds the covering starts by epoch
    * arithmetic. */
  def q43SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("window_start"), $"event_type",
        $"n_events", $"sum_value")
  }

  // ---------------------------------------------------------------- q40
  /** As-of join: each click attributed to the user's latest purchase at
    * or before it ([[graft.operators.Joins.asofJoin]] — union + ordered
    * window, one shuffle on user_id, no non-equi fan-out). The right
    * side pre-aggregates to unique (user_id, ts) so as-of resolution is
    * deterministic; the oracle is DuckDB's native ASOF LEFT JOIN. */
  def q40AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = e.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts")
      .agg(round(max($"value"), 4).as("purchase_value"))
    graft.operators.Joins
      .asofJoin(clicks, purchases, "user_id", "ts", Seq("purchase_value"))
  }

  // ---------------------------------------------------------------- q41
  /** Range join: every event assigned to the purchase-session interval
    * it falls inside, rolled up per session
    * ([[graft.operators.Joins.rangeJoin]] — intervals explode into
    * 1-hour bins, the join runs on (user, bin) with the exact range as
    * a residual; no per-key all-pairs fan). */
  def q41RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000 * 1000
    val sess = e.filter($"event_type" === "purchase")
      .withColumn("prev_us", lag(tsMicros, 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull || (tsMicros - $"prev_us") >= gapUs, 1).otherwise(0))
      .withColumn("sess_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"))
      .drop("sess_id")
    graft.operators.Joins
      .rangeJoin(e.select($"event_id", $"user_id", $"ts", $"event_type"),
        sess, "user_id", "ts", "session_start", "session_end",
        binSeconds = 3600L)
      .groupBy($"user_id", $"session_start", $"session_end")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"))
  }

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_events_json" -> (q14EventsJson _),
    "q15_sessionize" -> (q15Sessionize _),
    "q16_tumbling_window" -> (q16TumblingWindow _),
    "q43_sliding_window" -> (q43SlidingWindow _),
    "q40_asof_join" -> (q40AsofJoin _),
    "q41_range_join" -> (q41RangeJoin _))

  val oracle: Map[String, String] = Map(
    "q14_events_json" ->
      """SELECT event_type,
         count(*) AS n_events,
         round(avg(value),4) AS avg_value,
         round(sum(value),4) AS sum_value,
         max(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS max_k,
         CAST(sum(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type""",
    "q15_sessionize" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
           FROM marked)
         SELECT user_id, sess_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value),4) AS sum_value
         FROM numbered GROUP BY user_id, sess_id""",
    "q16_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n_events, round(sum(value),4) AS sum_value
         FROM events GROUP BY date_trunc('hour', ts), event_type""",
    "q43_sliding_window" ->
      // covering window starts by epoch arithmetic: an event at t is in
      // the windows starting at floor(t/slide)*slide - i*slide for
      // i in 0..(length/slide - 1); length divides into exactly 2 slides
      """WITH ex AS (
           SELECT event_type, value,
             make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                            - g.i * 1800000000) AS window_start
           FROM events, (SELECT unnest(generate_series(0, 1)) AS i) g)
         SELECT window_start, event_type,
           count(*) AS n_events, round(sum(value),4) AS sum_value
         FROM ex GROUP BY window_start, event_type""",
    "q40_asof_join" ->
      """WITH c AS (
           SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'click'),
         p AS (
           SELECT user_id, ts, round(max(value),4) AS purchase_value
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id, ts)
         SELECT c.event_id, c.user_id, c.ts,
           p.purchase_value AS asof_purchase_value
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts >= p.ts""",
    "q41_range_join" ->
      """WITH p AS (
           SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
         marked AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_sess
           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         numbered AS (
           SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM marked),
         sess AS (
           SELECT user_id, sess_id,
             min(ts) AS session_start, max(ts) AS session_end
           FROM numbered GROUP BY user_id, sess_id)
         SELECT s.user_id, s.session_start, s.session_end,
           count(*) AS n_events,
           CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types
         FROM sess s JOIN events e
           ON e.user_id = s.user_id
          AND e.ts >= s.session_start AND e.ts <= s.session_end
         GROUP BY s.user_id, s.session_start, s.session_end""")
}
