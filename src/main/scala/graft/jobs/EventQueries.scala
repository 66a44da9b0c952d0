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

  /** Epoch micros of the naive event timestamp — NTZ-native arithmetic,
    * so gap/window math is identical in any session time zone (an ltz
    * cast would shift by the session offset and stretch gaps across DST
    * transitions). */
  private def tsMicros =
    expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")

  // ---------------------------------------------------------------- q14
  /** JSON property extraction + per-type rollup (SURVEY F-ext: the
    * `events.props` JSON column). get_json_object is a single-pass
    * path evaluation — no UDF, pushed alongside the scan.
    *
    * `value` sums in exact integer CENTS (the column is 2-decimal
    * fixed-point), not `round(sum(double), 4)`: this rollup's groups
    * span the WHOLE table (n/5 rows each), so at scale a double sum's
    * accumulated order-dependent error crosses the 4th decimal — the
    * q01 sf3 failure mode. q15/q16/q43 keep the float form safely:
    * their groups (sessions, hourly windows) stay bounded as the table
    * grows, so the sum magnitude never outruns double precision.
    * avg_value uses the q58 integer round-half-up identity. */
  def q14EventsJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread (guide §2.5): per-row JSON parsing serialized on the
    // single-split events scan; identity at scale
    graft.operators.Spread.cpuBound(ev(spark, dir))
      .withColumn("k_val", get_json_object($"props", "$.k").cast("int"))
      .withColumn("value_c", round($"value" * 100).cast("long"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"value_c").as("svc"),
        max($"k_val").as("max_k"),
        sum($"k_val").cast("long").as("sum_k"))
      .select(
        $"event_type",
        $"n".as("n_events"),
        (expr("(200*svc + n) div (2*n)").cast("double") / 10000.0).as("avg_value"),
        ($"svc".cast("double") / 100.0).as("sum_value"),
        $"max_k", $"sum_k")
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

  // ---------------------------------------------------------------- q50
  /** Ordered conversion funnel with a 24-hour attribution window:
    * view → click (within 24 h after the first view) → purchase
    * (within 24 h after that click), per user — the stage-depth query
    * behind every product funnel dashboard. Strictly-ordered, windowed
    * semantics: a click before the first view, or one outside the
    * window, does not count. Three stage-aggregations, each a filtered
    * min over the (small) per-user key space, composed by
    * broadcast-or-shuffle joins on user_id; output is one row per
    * funnel depth. */
  val funnelWindowUs: Long = 24L * 3600 * 1000000
  def q50Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).withColumn("us", tsMicros)
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("tv"))
    val c = e.filter($"event_type" === "click")
      .join(v, "user_id")
      .filter($"us" > $"tv" && $"us" <= $"tv" + funnelWindowUs)
      .groupBy($"user_id").agg(min($"us").as("tc"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, "user_id")
      .filter($"us" > $"tc" && $"us" <= $"tc" + funnelWindowUs)
      .groupBy($"user_id").agg(min($"us").as("tp"))
    e.select($"user_id").distinct()
      .join(v.select($"user_id", lit(1).as("s1")), Seq("user_id"), "left")
      .join(c.select($"user_id", lit(1).as("s2")), Seq("user_id"), "left")
      .join(p.select($"user_id", lit(1).as("s3")), Seq("user_id"), "left")
      .select(
        (coalesce($"s1", lit(0)) + coalesce($"s2", lit(0)) +
          coalesce($"s3", lit(0))).as("funnel_stage"))
      .groupBy($"funnel_stage")
      .agg(count(lit(1)).as("n_users"))
  }

  // ---------------------------------------------------------------- q51
  /** Cohort retention: users grouped by the ISO week of their first
    * event; for each later week, how many of the cohort were active.
    * Week offsets by exact epoch arithmetic (cross-engine safe, no
    * datediff dialect). Two aggregations + one join on user_id —
    * the activity relation is pre-deduped to (user, week) so the join
    * fan is bounded by weeks-per-user, not events. */
  /** Shared cohort scaffold for q51 and its HLL variant: one row per
    * (user, cohort week, week offset) — both aggregates sit on top, so
    * the cohort arithmetic cannot silently diverge between them. */
  private def retentionOffsets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val weekUs = 7L * 86400 * 1000000
    // Epoch arithmetic stays on the NTZ value end to end (timestampdiff/
    // timestampadd against an NTZ epoch): an ltz round-trip would make
    // truncated weeks non-multiples of weekUs in a DST session TZ and
    // drift week_offset off the naive-timestamp oracle. EventQueriesSpec
    // pins q51 equal across UTC and America/New_York sessions.
    val activity = ev(spark, dir)
      .select($"user_id",
        expr("""timestampdiff(MICROSECOND,
                TIMESTAMP_NTZ '1970-01-01 00:00:00',
                date_trunc('week', ts))""").as("wk"))
      .distinct()
    val cohorts = activity.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    activity.join(cohorts, "user_id")
      .select($"user_id",
        expr("""timestampadd(MICROSECOND, cohort_wk,
                TIMESTAMP_NTZ '1970-01-01 00:00:00')""").as("cohort_week"),
        (($"wk" - $"cohort_wk") / weekUs).cast("int").as("week_offset"))
  }

  def q51Retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    retentionOffsets(spark, dir)
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_active"))
  }

  /** A2 scale variant of q51 — HLL++ sketch in place of the exact
    * distinct count: cohort × offset cells at 100 TB hold millions of
    * users each, and the sketch turns the distinct shuffle into
    * mergeable fixed-size partials (ScaleOpsSpec bounds the error). */
  def q51RetentionApprox(spark: SparkSession, dir: String,
      rsd: Double = 0.05): DataFrame = {
    import spark.implicits._
    retentionOffsets(spark, dir)
      .groupBy($"cohort_week", $"week_offset")
      .agg(approx_count_distinct($"user_id", rsd).as("n_active"))
  }

  // ---------------------------------------------------------------- q58
  /** Click attribution pairs, per user — the batch twin of the
    * stream-stream interval join
    * ([[graft.streaming.EventsStream.attributedClicks]]): every
    * (view, click) pair of one user with the click inside the 24 h
    * window after the view (same strict `>` / inclusive `<=` edges as
    * q50's stage 2), rolled up per user with exact-integer latency
    * stats. The 4-dp average is computed ENTIRELY in integer
    * arithmetic — round-half-up(sum/(100·n)) via `(2s+100n) div (200n)`
    * in units of 100 µs, divided by 10⁴ only for display — because the
    * r9 sf1 sweep caught the float formulation on exact decimal-half
    * ties (sum ≡ 50 mod 100 µs): `round(double, 4)` resolves ties via
    * BigDecimal's shortest-representation HALF_UP in Spark but via a
    * ×10⁴ double multiply in DuckDB, and 3 of 14 947 sf1 users landed
    * on a tie and flipped the last digit. Same lesson as q56's
    * round-before-rank: never let a float carry a value you intend to
    * tie-break.
    *
    * Scale shape: both sides shuffle once on user_id — the same
    * partitioning the funnel/retention family uses; pair fan per user
    * is views × clicks *within a 24 h window*, and the rollup
    * collapses on the join's own partitioning, no second exchange. */
  def q58AttributedClicks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).withColumn("us", tsMicros)
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"us".as("view_us"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"),
        $"us".as("click_us"))
    v.join(c, $"user_id" === $"cu" &&
        $"click_us" > $"view_us" &&
        $"click_us" <= $"view_us" + funnelWindowUs)
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct($"click_id").as("n_clicks"),
        countDistinct($"view_id").as("n_views"),
        min($"click_us" - $"view_us").as("min_latency_us"),
        sum($"click_us" - $"view_us").as("sum_lat_us"))
      .withColumn("avg_latency_s", expr(
        // 1e4 (not 10000.0): a decimal literal would make the division
        // DECIMAL-typed in Spark; 1e4 is DOUBLE in both dialects
        "((2 * sum_lat_us + 100 * n_pairs) div (200 * n_pairs)) / 1e4"))
      .drop("sum_lat_us")
  }

  // ---------------------------------------------------------------- q59
  /** Left-outer click attribution, per view — the batch twin of the
    * LEFT-OUTER stream-stream interval join
    * ([[graft.streaming.EventsStream.attributedClicksOuter]]): one row
    * per (view, attributable click) pair PLUS one null-click row per
    * view that never converted inside its 24 h window — the
    * "abandonment" relation a conversion dashboard actually serves.
    * Same strict `>` / inclusive `<=` edges as q58; identical column
    * set to the streaming operator, so StreamingSpec pins the streamed
    * outer join multiset-equal to this declared (oracle-green) frame.
    *
    * Scale shape: q58's — one user_id shuffle per side, pair fan
    * bounded by the 24 h window; the unmatched views ride the same
    * join (outer rows materialize where the match probe misses), no
    * extra pass or anti-join over the corpus. */
  def q59AttributedClicksOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val v = e.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"event_id".as("click_id"),
        $"ts".as("click_ts"))
    v.join(c, $"user_id" === $"cu" &&
        $"click_ts" > $"view_ts" &&
        $"click_ts" <= $"view_ts" + expr("INTERVAL 24 HOURS"),
      "left_outer")
      .select($"user_id", $"view_id", $"click_id", $"view_ts", $"click_ts")
  }

  // ---------------------------------------------------------------- q68
  /** Ingest-rate anomaly screen — the pipeline-monitoring station: an
    * hour whose event count sits more than `zThreshold` sample standard
    * deviations from its own trailing-`horizonHours` baseline is
    * flagged (a stalled upstream scraper reads as a drop, a replayed
    * dump or runaway client as a spike). The baseline EXCLUDES the
    * scored hour (an anomaly must not dampen its own z-score) and is a
    * RANGE frame over the hour index, so gap hours genuinely age out
    * of the window instead of stretching it.
    *
    * Determinism across engines/partitionings: the windowed sums are
    * exact integers (count, Σx, Σx² in BIGINT); the z-score is then
    * ONE fixed shape of correctly-rounded double ops from those exact
    * integers — no scan-order float accumulation anywhere (`stddev`
    * over a window would accumulate in frame order).
    *
    * Scale shape: the hourly rollup is a map-side-partial aggregate
    * whose shuffle carries one row per (partition, hour); the window
    * then runs over ≤ hours-per-decade rows (~10⁵ at a century of
    * data) — a deliberate single-partition sort over a frame that is
    * tiny BY CONSTRUCTION, not by luck. Partition by calendar year
    * before the window if the hour index ever stops fitting one task. */
  def hourlyAnomaly(events: DataFrame, horizonHours: Int = 24,
      minBaseline: Int = 12, zThreshold: Double = 3.0): DataFrame = {
    val hours = events
      .select(expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 3600000000").as("hour_idx"))
      .groupBy("hour_idx")
      .agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy(col("hour_idx")).rangeBetween(-horizonHours, -1)
    val n = col("base_n").cast("double")
    val s = col("base_s").cast("double")
    val q = col("base_q").cast("double")
    val x = col("n_events").cast("double")
    val varNum = n * q - s * s // n·Σx² − (Σx)²; > 0 ⟺ baseline non-constant
    hours
      .withColumn("base_n", count(col("n_events")).over(w))
      .withColumn("base_s", sum(col("n_events")).over(w).cast("long"))
      .withColumn("base_q",
        sum(col("n_events") * col("n_events")).over(w).cast("long"))
      .withColumn("z",
        when(col("base_n") >= minBaseline && varNum > 0.0,
          (x - s / n) / sqrt(varNum / (n * (n - lit(1.0))))))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > zThreshold, lit(false)))
      .select("hour_idx", "n_events", "base_n", "z", "is_anomaly")
  }

  def q68IngestAnomaly(spark: SparkSession, dir: String): DataFrame =
    hourlyAnomaly(ev(spark, dir))

  // ================================================================ maps
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_events_json" -> (q14EventsJson _),
    "q15_sessionize" -> (q15Sessionize _),
    "q16_tumbling_window" -> (q16TumblingWindow _),
    "q43_sliding_window" -> (q43SlidingWindow _),
    "q40_asof_join" -> (q40AsofJoin _),
    "q41_range_join" -> (q41RangeJoin _),
    "q50_funnel" -> (q50Funnel _),
    "q51_retention" -> (q51Retention _),
    "q58_attributed_clicks" -> (q58AttributedClicks _),
    "q59_attributed_outer" -> (q59AttributedClicksOuter _),
    "q68_ingest_anomaly" -> (q68IngestAnomaly _))

  val oracle: Map[String, String] = Map(
    "q14_events_json" ->
      """SELECT event_type,
         count(*) AS n_events,
         CAST((200*sum(value_c) + count(*)) // (2*count(*)) AS DOUBLE)/10000.0 AS avg_value,
         CAST(sum(value_c) AS DOUBLE)/100.0 AS sum_value,
         max(k_val) AS max_k,
         CAST(sum(k_val) AS BIGINT) AS sum_k
         FROM (
           SELECT event_type,
             CAST(round(value*100) AS BIGINT) AS value_c,
             CAST(json_extract_string(props,'$.k') AS INTEGER) AS k_val
           FROM events)
         GROUP BY event_type""",
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
    "q50_funnel" ->
      """WITH v AS (
           SELECT user_id, min(epoch_us(ts)) AS tv FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS tc
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.tv
             AND epoch_us(e.ts) <= v.tv + 86400000000
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(epoch_us(e.ts)) AS tp
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.tc
             AND epoch_us(e.ts) <= c.tc + 86400000000
           GROUP BY e.user_id),
         u AS (SELECT DISTINCT user_id FROM events)
         SELECT (CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END +
                 CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END +
                 CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)
                  AS funnel_stage,
           count(*) AS n_users
         FROM u
         LEFT JOIN v ON u.user_id = v.user_id
         LEFT JOIN c ON u.user_id = c.user_id
         LEFT JOIN p ON u.user_id = p.user_id
         GROUP BY 1""",
    "q51_retention" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
             epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wk
           FROM events),
         coh AS (
           SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY user_id)
         SELECT make_timestamp(coh.cohort_wk) AS cohort_week,
           CAST((act.wk - coh.cohort_wk) // 604800000000 AS INT) AS week_offset,
           CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_active
         FROM act JOIN coh ON act.user_id = coh.user_id
         GROUP BY 1, 2""",
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
         GROUP BY s.user_id, s.session_start, s.session_end""",
    "q58_attributed_clicks" ->
      """WITH v AS (
           SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_us
           FROM events WHERE event_type = 'view'),
         c AS (
           SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
           FROM events WHERE event_type = 'click'),
         j AS (
           SELECT v.user_id, v.view_id, c.click_id,
             c.click_us - v.view_us AS lat
           FROM v JOIN c ON v.user_id = c.user_id
            AND c.click_us > v.view_us
            AND c.click_us <= v.view_us + 86400000000)
         SELECT user_id, count(*) AS n_pairs,
           CAST(count(DISTINCT click_id) AS BIGINT) AS n_clicks,
           CAST(count(DISTINCT view_id) AS BIGINT) AS n_views,
           CAST(min(lat) AS BIGINT) AS min_latency_us,
           ((2 * CAST(sum(lat) AS BIGINT) + 100 * count(*))
             // (200 * count(*))) / 1e4 AS avg_latency_s
         FROM j GROUP BY user_id""",
    "q59_attributed_outer" ->
      """WITH v AS (
           SELECT user_id, event_id AS view_id, ts AS view_ts
           FROM events WHERE event_type = 'view'),
         c AS (
           SELECT user_id AS cu, event_id AS click_id, ts AS click_ts
           FROM events WHERE event_type = 'click')
         SELECT v.user_id, v.view_id, c.click_id, v.view_ts, c.click_ts
         FROM v LEFT JOIN c ON v.user_id = c.cu
          AND epoch_us(c.click_ts) > epoch_us(v.view_ts)
          AND epoch_us(c.click_ts) <= epoch_us(v.view_ts) + 86400000000""",
    // identical arithmetic to hourlyAnomaly: exact BIGINT window sums,
    // then one fixed shape of double ops (casts → products → division →
    // sqrt), so z is bit-identical across engines
    "q68_ingest_anomaly" ->
      """WITH h AS (
           SELECT epoch_us(ts) // 3600000000 AS hour_idx,
             count(*) AS n_events
           FROM events GROUP BY 1),
         b AS (
           SELECT hour_idx, n_events,
             count(n_events) OVER w AS base_n,
             CAST(sum(n_events) OVER w AS BIGINT) AS base_s,
             CAST(sum(n_events * n_events) OVER w AS BIGINT) AS base_q
           FROM h
           WINDOW w AS (ORDER BY hour_idx
             RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         z AS (
           SELECT hour_idx, n_events, base_n,
             CASE WHEN base_n >= 12
                   AND CAST(base_n AS DOUBLE) * CAST(base_q AS DOUBLE)
                     - CAST(base_s AS DOUBLE) * CAST(base_s AS DOUBLE) > 0e0
               THEN (CAST(n_events AS DOUBLE)
                      - CAST(base_s AS DOUBLE) / CAST(base_n AS DOUBLE))
                 / sqrt((CAST(base_n AS DOUBLE) * CAST(base_q AS DOUBLE)
                          - CAST(base_s AS DOUBLE) * CAST(base_s AS DOUBLE))
                   / (CAST(base_n AS DOUBLE) * (CAST(base_n AS DOUBLE) - 1e0)))
             END AS z
           FROM b)
         SELECT hour_idx, n_events, base_n, z,
           coalesce(abs(z) > 3e0, false) AS is_anomaly
         FROM z""")
}
