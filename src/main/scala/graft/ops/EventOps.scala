package graft.ops

import graft.{QueryDef, Registry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time operators over the `events` stream table — the windowed/
  * stateful family the reference's batch-watermark design hints at but never
  * implements (SURVEY.md §2.8 "Streaming"). Batch forms here; the Structured
  * Streaming variants live in `graft.streaming`.
  *
  * All outputs avoid raw TimestampType columns (parquet TIMESTAMP(UTC) vs
  * DuckDB naive-timestamp round-trips disagree); window starts surface as
  * epoch-second longs or DATE.
  */
object EventOps {

  /** Tumbling 1-day event-time windows per event type: Spark's `window()`
    * producing one row per (day, type). Epoch-aligned, so identical to
    * date_trunc in any engine.
    */
  def tumblingDaily(s: SparkSession, dir: String): DataFrame =
    Registry.events(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"))
      .select(
        to_date(col("w.start")).as("day"),
        col("event_type"), col("n_events"), col("sum_value"),
        col("min_value"), col("max_value"))
      .orderBy("day", "event_type")

  private val tumblingDailyOracle = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
  min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""

  /** Sliding windows (6h length, 3h slide): every event lands in exactly two
    * epoch-aligned windows. Spark's `window(ts, "6 hours", "3 hours")`; the
    * oracle reproduces the two 3h-grid assignments with UNION ALL.
    */
  def slidingActivity(s: SparkSession, dir: String): DataFrame =
    Registry.events(s, dir)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start_epoch", "event_type")

  private val slidingActivityOracle = """
WITH assigned AS (
  SELECT CAST(floor(epoch(ts) / 10800) AS BIGINT) * 10800 AS window_start_epoch,
         event_type, value
  FROM events
  UNION ALL
  SELECT CAST(floor(epoch(ts) / 10800) AS BIGINT) * 10800 - 10800,
         event_type, value
  FROM events)
SELECT window_start_epoch, event_type, count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
FROM assigned GROUP BY 1, 2 ORDER BY window_start_epoch, event_type
"""

  /** Session windows: Spark's native `session_window` (30-minute inactivity
    * gap) per user. The oracle rebuilds sessions relationally: a lag-gap
    * indicator cumulated into session ids — same semantics, pure SQL. The
    * gap test is strict `>`: session_window merges when the next event's
    * window start equals the previous window's end (inclusive merge,
    * verified empirically), so an exact 30:00 gap stays ONE session.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    Registry.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("w.start")).as("session_start_epoch"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_epoch")

  private val sessionizeOracle = """
WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events),
sessions AS (
  SELECT user_id, ts, value,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT user_id,
  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_epoch,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, session_start_epoch
"""

  /** JSON extraction (events.props is a JSON string): typed `from_json`
    * projection — schema declared, no inference scan — aggregated per type.
    */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    // string-extract then cast, NOT from_json with a typed schema: the
    // oracle's json_extract_string + CAST coerces a quoted number
    // ({"k": "7"}) that from_json(k BIGINT) nulls out — extraction
    // semantics must match the oracle's lenient path or n_with_k/sum_k
    // silently diverge the day the generator emits a string-typed k.
    // get_json_object returns the unquoted scalar text exactly like
    // json_extract_string; both engines' casts then agree (and both
    // fail loudly on non-numeric text — ANSI cast ↔ DuckDB CAST).
    Registry.events(s, dir)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").as("ks"))
      .groupBy("event_type")
      .agg(
        sum(col("ks").cast("long")).as("sum_k"),
        count(col("ks")).as("n_with_k"),
        countDistinct("user_id").as("n_users"))
      .orderBy("event_type")

  private val jsonPropsOracle = """
SELECT event_type,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  count(json_extract_string(props, '$.k')) AS n_with_k,
  count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""

  /** As-of join: enrich each event with the latest *prior calendar day's*
    * closing value for its user (reference analog: event → last daily OHLCV
    * bar, SURVEY.md §2.8 "Joins").
    *
    * Spark has no asof-join operator; rather than a driver-side loop, this
    * uses the scalable union+window encoding: daily closes become "state"
    * rows, events become "probe" rows, one sort per user orders state before
    * the probes of later days, and `last_value(ignoreNulls)` propagates the
    * most recent close forward. One shuffle on user_id, no skew-prone
    * range-join explosion — survives arbitrarily many days per user.
    */
  def asofPrevClose(s: SparkSession, dir: String): DataFrame = {
    val ev = Registry.events(s, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("value"))

    // Daily close = value of the last event of the day (max_by over ts;
    // deterministic — no (user_id, ts) ties in the data).
    val daily = ev.groupBy("user_id", "day")
      .agg(max_by(col("value"), col("ts")).as("close_value"))

    // kind 1 = state (daily close), kind 0 = probe (event). Within a day the
    // probes sort before the state row, so an event only sees closes of
    // strictly earlier days — the as-of "strictly before" semantics.
    val state = daily.select(col("user_id"), col("day"), lit(1).as("kind"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
      col("close_value"))
    val probe = ev.select(col("user_id"), col("day"), lit(0).as("kind"),
      col("event_id"), col("value"), lit(null).cast("double").as("close_value"))

    val w = Window.partitionBy("user_id")
      .orderBy(col("day"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)

    state.unionByName(probe)
      .withColumn("prev_close", last(col("close_value"), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col("event_id"), col("user_id"), col("day"), col("value"),
        col("prev_close"))
      .orderBy("event_id")
  }

  private val asofPrevCloseOracle = """
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day, ts, value FROM events),
daily AS (
  SELECT user_id, day, max_by(value, ts) AS close_value
  FROM ev GROUP BY user_id, day)
SELECT e.event_id, e.user_id, e.day, e.value, d.close_value AS prev_close
FROM ev e
ASOF LEFT JOIN daily d
  ON e.user_id = d.user_id AND d.day < e.day
ORDER BY e.event_id
"""

  /** The same as-of semantics through the custom Catalyst operator
    * ([[graft.plans.AsOfJoin]]: LogicalPlan + Strategy + streaming-merge
    * SparkPlan) — checked against the identical DuckDB ASOF JOIN oracle as
    * the built-in-composed variant above, so the custom physical operator
    * is value-verified end to end.
    */
  def asofCustom(s: SparkSession, dir: String): DataFrame = {
    // ONE user_id shuffle feeds everything (r14 optimization; was four
    // exchanges / two events scans: probe shuffled by user_id, daily
    // shuffled by (user_id, day) for its aggregate and then AGAIN by
    // user_id for the as-of's ClusteredDistribution). Repartitioning the
    // event projection by user_id makes every downstream requirement
    // already satisfied: HashPartitioning(user_id) is coarser than
    // ClusteredDistribution(user_id, day), so the daily-close aggregate
    // plans with NO exchange, and both as-of children are user_id-
    // clustered with the same partition count. The repartition subtree
    // appears under both children statically, but it is scan-rooted, so
    // AQE query-stage reuse folds the two shuffle map stages into one
    // executed stage (ReusedQueryStage in the final plan) — unlike the
    // ExistingRDD-rooted diamonds this round's batch-1 note documents, a
    // localCheckpoint here would DEFEAT the sharing (LogicalRDD comes
    // back with UnknownPartitioning, re-inserting both exchanges;
    // measured on the static plan). Values are untouched (the DuckDB
    // ASOF JOIN oracle hash-gates this query).
    val ev = Registry.events(s, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("value"))
      .repartition(col("user_id"))
    val probe = ev.select("event_id", "user_id", "day", "value")
    val daily = ev.groupBy("user_id", "day")
      .agg(max_by(col("value"), col("ts")).as("close_value"))
      .select(col("user_id").as("r_user_id"), col("day").as("r_day"),
        col("close_value"))
    graft.plans.AsOfJoin.dataframe(probe, daily,
        probe("user_id"), daily("r_user_id"), probe("day"), daily("r_day"))
      .select(col("event_id"), col("user_id"), col("day"), col("value"),
        col("close_value").as("prev_close"))
      .orderBy("event_id")
  }

  // ------------------------------------------------ as-of with tolerance
  /** [[asofPrevClose]] under the `merge_asof(tolerance=)` semantic every
    * trading asof API carries: a prior close older than
    * [[AsofToleranceDays]] days is too stale to use (2 days: the driver
    * corpus is near-daily per user, so lags 3+ exist and the cutoff is
    * exercised — a 7-day tolerance would be vacuously true on this data) and the match is
    * NULLed (the raw staleness ships as `lag_days` so the cutoff is
    * auditable). Same scalable union+window encoding — the window now
    * propagates the matched close's DAY alongside its value (two
    * `last(ignoreNulls)` over ONE window spec: both columns are set on
    * exactly the same state rows, so the pair can never mix two different
    * closes), and the tolerance is a post-filter on their distance. One
    * shuffle on user_id, unchanged. Oracle: DuckDB ASOF LEFT JOIN with
    * the same CASE cutoff — the engine-native asof operator, a different
    * evaluation strategy than the union+window encoding.
    */
  private val AsofToleranceDays = 2

  def asofToleranceClose(s: SparkSession, dir: String): DataFrame = {
    val ev = Registry.events(s, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"),
        col("ts"), col("value"))
    val daily = ev.groupBy("user_id", "day")
      .agg(max_by(col("value"), col("ts")).as("close_value"))
    val state = daily.select(col("user_id"), col("day"), lit(1).as("kind"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("double").as("value"),
      col("close_value"), col("day").as("close_day"))
    val probe = ev.select(col("user_id"), col("day"), lit(0).as("kind"),
      col("event_id"), col("value"),
      lit(null).cast("double").as("close_value"),
      lit(null).cast("date").as("close_day"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("day"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    state.unionByName(probe)
      .withColumn("prev_close_raw",
        last(col("close_value"), ignoreNulls = true).over(w))
      .withColumn("prev_day", last(col("close_day"), ignoreNulls = true).over(w))
      .filter(col("kind") === 0)
      .select(col("event_id"), col("user_id"), col("day"), col("value"),
        datediff(col("day"), col("prev_day")).cast("long").as("lag_days"),
        when(datediff(col("day"), col("prev_day")) <= AsofToleranceDays,
          col("prev_close_raw")).as("prev_close"))
      .orderBy("event_id")
  }

  private val asofToleranceOracle = s"""
WITH ev AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day, ts, value FROM events),
daily AS (
  SELECT user_id, day, max_by(value, ts) AS close_value
  FROM ev GROUP BY user_id, day)
SELECT e.event_id, e.user_id, e.day, e.value,
  CAST(e.day - d.day AS BIGINT) AS lag_days,
  CASE WHEN e.day - d.day <= $AsofToleranceDays THEN d.close_value END
    AS prev_close
FROM ev e
ASOF LEFT JOIN daily d
  ON e.user_id = d.user_id AND d.day < e.day
ORDER BY e.event_id
"""

  // ------------------------------------------- keyless interval join (bins)
  /** Point-in-interval join WITHOUT an equi key, by time-bucket expansion —
    * the range-join bin technique: intervals explode to every 6h bucket
    * they overlap, points carry their own bucket, and the join becomes a
    * plain EQUI-join on the bucket plus the precise band filter. Where a
    * naive `ts BETWEEN s AND e` join over two large sides is a
    * broadcast-nested-loop (O(N·M) compares at 100 TB), this shuffles both
    * sides once on the bin key; cost grows with overlap density only. The
    * intervals here are the 20 busiest 6h windows padded ±30min (so they
    * genuinely span bucket boundaries and the result differs from the
    * window counts themselves).
    */
  def intervalBucketJoin(s: SparkSession, dir: String): DataFrame = {
    val BucketSec = 21600L // 6h
    val evs = Registry.events(s, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("sec"))
    val busiest = evs
      .groupBy(expr(s"sec div $BucketSec").as("w"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("w").asc)))
      .filter(col("rk") <= 20)
      .select((col("w") * BucketSec - 1800).as("s"),
        (col("w") * BucketSec + BucketSec + 1800).as("e"))
    val winB = busiest.withColumn("bucket",
      explode(sequence(expr(s"s div $BucketSec"),
        expr(s"(e - 1) div $BucketSec"))))
    val evB = evs.withColumn("bucket", expr(s"sec div $BucketSec"))
    evB.join(winB, Seq("bucket"))
      .filter(col("sec") >= col("s") && col("sec") < col("e"))
      .groupBy(col("s").as("w_start"), col("e").as("w_end"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"))
      .orderBy("w_start")
  }

  private val intervalBucketJoinOracle = """
WITH evs AS (
  SELECT event_id, user_id,
    CAST(floor(CAST(epoch(ts) AS DOUBLE)) AS BIGINT) AS sec
  FROM events),
busiest AS (
  SELECT w * 21600 - 1800 AS s, w * 21600 + 21600 + 1800 AS e FROM (
    SELECT w, row_number() OVER (ORDER BY n DESC, w ASC) AS rk FROM (
      SELECT sec // 21600 AS w, count(*) AS n FROM evs GROUP BY 1))
  WHERE rk <= 20)
SELECT s AS w_start, e AS w_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM evs JOIN busiest ON sec >= s AND sec < e
GROUP BY s, e ORDER BY w_start
"""

  // ---------------------------------------------------- retention cohorts
  /** Classic cohort retention: users grouped by first-activity day, then
    * per (cohort, day-offset ≤ 7) distinct-active counts. Two aggregates
    * and one co-partitioned join on user_id — the first-activity table and
    * the distinct (user, day) activity table shuffle on the same key, so
    * no extra exchange family; nothing resembling a per-user window over
    * raw events is needed.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val activity = Registry.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohorts = activity.groupBy("user_id").agg(min("day").as("cohort"))
    activity.join(cohorts, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort")))
      .filter(col("offset") <= 7)
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort", "offset")
  }

  private val retentionCohortsOracle = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events),
cohorts AS (
  SELECT user_id, min(day) AS cohort FROM activity GROUP BY user_id)
SELECT c.cohort, date_diff('day', c.cohort, a.day) AS "offset",
  CAST(count(*) AS BIGINT) AS n_active
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
WHERE date_diff('day', c.cohort, a.day) <= 7
GROUP BY 1, 2 ORDER BY 1, 2
"""

  // -------------------------------------------------- Markov transitions
  /** First-order Markov transition statistics over each user's time-ordered
    * event sequence: count (current → next) event-type bigrams via one lag
    * window per user, then the row-conditional transition probability
    * P(next | current). The window partitions by user (parallel at any
    * scale); the transition matrix is |types|² — tiny — and the
    * probability is ONE division of exact counts, so the matrix is
    * hash-exact cross-engine. The sequence-model cousin of
    * `text_bigram_quality`, on behavioral rather than textual tokens.
    */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val bi = Registry.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"))
      .withColumn("nxt", lead("cur", 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
      // |types|²-row matrix: checkpoint so the row-totals derivation and
      // the probability join don't replay the corpus window+aggregation
      .localCheckpoint()
    val totals = bi.groupBy("cur").agg(sum("n").as("n_cur"))
    bi.join(broadcast(totals), "cur")
      .select(col("cur"), col("nxt"), col("n"),
        (col("n").cast("double") / col("n_cur")).as("p"))
      .orderBy("cur", "nxt")
  }

  private val markovOracle = """
WITH seq AS (
  SELECT event_type AS cur,
    lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
  FROM events),
bi AS (
  SELECT cur, nxt, count(*) AS n FROM seq
  WHERE nxt IS NOT NULL GROUP BY cur, nxt),
t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM bi GROUP BY cur)
SELECT bi.cur, bi.nxt, bi.n,
  CAST(bi.n AS DOUBLE) / t.n_cur AS p
FROM bi JOIN t ON t.cur = bi.cur
ORDER BY bi.cur, nxt
"""

  // ------------------------------------------------------ activity streaks
  /** Gaps-and-islands: each user's LONGEST run of consecutive active days.
    * The classic trick — within a user, `day − row_number()` is constant
    * exactly along a consecutive run — turns streak detection into a
    * groupBy on the island key: two stacked windows/aggregations over the
    * same user partitioning (one exchange), no self-join, no iteration.
    * Dates are day-ordinals (integer) end-to-end.
    */
  def activityStreaks(s: SparkSession, dir: String): DataFrame = {
    val byDay = Window.partitionBy("user_id").orderBy("d")
    val days = Registry.events(s, dir)
      .select(col("user_id"), datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).cast("long").as("d"))
      .distinct()
    days
      .withColumn("island", col("d") - row_number().over(byDay))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"), count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  private val activityStreaksOracle = """
WITH days AS (
  SELECT DISTINCT user_id,
    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      AS d
  FROM events),
isl AS (
  SELECT user_id, d,
    d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM days),
runs AS (
  SELECT user_id, island, count(*) AS len
  FROM isl GROUP BY user_id, island)
SELECT user_id, max(len) AS longest_streak,
  count(*) AS n_streaks
FROM runs GROUP BY user_id ORDER BY user_id
"""

  // ------------------------------------------------ rolling active users
  /** Exact 7-day rolling active users (the WAU curve): each (user, day)
    * activity fact is expanded to the ≤7 window-ends it participates in,
    * then distinct users count per window end. The expansion is the
    * standard exact-sliding-distinct trick — bounded 7× blowup of the
    * DEDUPLICATED (user, day) grid (tiny vs the raw event stream), versus
    * an unbounded per-window re-scan; distinct-count state is per window
    * end. Trailing partial windows past the last active day are cut by
    * the broadcast max-day scalar.
    */
  def rollingActiveUsers(s: SparkSession, dir: String): DataFrame = {
    val ud = Registry.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val maxDay = ud.agg(max("day").as("max_day"))
    ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wend"))
      .crossJoin(broadcast(maxDay))
      .filter(col("wend") <= col("max_day"))
      .groupBy("wend")
      .agg(countDistinct("user_id").as("wau"))
      .orderBy("wend")
  }

  private val rollingActiveUsersOracle = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
ex AS (
  SELECT user_id, day + CAST(i AS INTEGER) AS wend
  FROM ud, (SELECT unnest(range(7)) AS i))
SELECT wend, count(DISTINCT user_id) AS wau
FROM ex
WHERE wend <= (SELECT max(day) FROM ud)
GROUP BY wend ORDER BY wend
"""

  // ------------------------------------------------ last-touch attribution
  /** Last-touch attribution: each `purchase` is credited to the user's most
    * recent PRECEDING touch event (`click` or `view`) within 7 days, else
    * to `direct` — the standard marketing/conversion attribution join,
    * expressed as one per-user ordered window instead of a self-join: the
    * carried "last touch" is `last(touch, ignoreNulls) OVER (user ORDER BY
    * ts, event_id ROWS UNBOUNDED PRECEDING → 1 PRECEDING)` (event_id
    * tiebreak makes the order total, so the credit cannot flap between
    * engines). One hash exchange on user_id, per-user sorted scan —
    * the sessionize shape; per-user history length bounds the window
    * state, never corpus size.
    *
    * Revenue stays on the exact 1e-6 integer grid ([[dsum]] discipline);
    * the output is the per-channel credit table a spend report consumes.
    */
  def lastTouchAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Registry.events(s, dir)
    val vmic = (col("value").cast(DecimalType(18, 6)) * 1000000).cast("long")
    val touch = when(col("event_type").isin("click", "view"),
      struct(col("ts").as("tts"), col("event_type").as("ch")))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), vmic.as("v"), touch.as("touch"))
      .withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("v"),
        when(col("lt").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("lt.tts"))
            <= 7L * 86400L * 1000000L,
          col("lt.ch")).otherwise(lit("direct")).as("channel"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"), sum("v").as("rev_micros"))
      .orderBy("channel")
  }

  private val lastTouchOracle = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
    CASE WHEN event_type IN ('click', 'view') THEN ts END AS touch_ts,
    CASE WHEN event_type IN ('click', 'view') THEN event_type END
      AS touch_ch
  FROM events),
carried AS (
  SELECT user_id, ts, event_type, v,
    last_value(touch_ts IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ts,
    last_value(touch_ch IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_ch
  FROM ev)
SELECT
  CASE WHEN lt_ts IS NOT NULL
        AND epoch_us(ts) - epoch_us(lt_ts) <= CAST(604800000000 AS BIGINT)
    THEN lt_ch ELSE 'direct' END AS channel,
  CAST(count(*) AS BIGINT) AS n_purchases,
  CAST(sum(v) AS BIGINT) AS rev_micros
FROM carried
WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY channel
"""

  // ---------------------------------------------------------- top paths
  /** Most frequent session-opening event paths — the product-analytics
    * "how do users start their day" query: per (user, day), the first 4
    * events in (ts, event_id) total order joined into a `a>b>c>d` path
    * string, then the top 20 paths by frequency. The per-user-day window
    * is partitioned (never global); the path histogram is heavy-hitter
    * shaped (shuffle O(distinct paths), bounded by |event_types|⁴); the
    * final top-k is TakeOrdered with (n, path) total order. Path assembly
    * is `sort_array(struct(rn, type))` — rn is unique within the group,
    * so the array order (and the concatenated string) is deterministic,
    * matching the oracle's `string_agg(... ORDER BY rn)`.
    */
  def topPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "day")
      .orderBy(col("ts"), col("event_id"))
    val steps = Registry.events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .select(col("user_id"), col("day"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
    steps.groupBy("user_id", "day")
      .agg(concat_ws(">",
        transform(
          sort_array(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(20)
  }

  private val topPathsOracle = """
WITH steps AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts, event_id) AS rn
  FROM events),
paths AS (
  SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM steps WHERE rn <= 4 GROUP BY user_id, day)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path ASC LIMIT 20
"""

  val queries: Map[String, QueryDef] = Map(
    "events_top_paths" -> QueryDef(topPaths, Some(topPathsOracle)),
    "events_last_touch_attribution" ->
      QueryDef(lastTouchAttribution, Some(lastTouchOracle)),
    "window_rolling_active_users" ->
      QueryDef(rollingActiveUsers, Some(rollingActiveUsersOracle)),
    "events_activity_streaks" ->
      QueryDef(activityStreaks, Some(activityStreaksOracle)),
    "events_markov_transitions" ->
      QueryDef(markovTransitions, Some(markovOracle)),
    "interval_bucket_join" ->
      QueryDef(intervalBucketJoin, Some(intervalBucketJoinOracle)),
    "retention_cohorts" ->
      QueryDef(retentionCohorts, Some(retentionCohortsOracle)),
    "window_tumbling_daily" -> QueryDef(tumblingDaily, Some(tumblingDailyOracle)),
    "window_sliding_6h3h" -> QueryDef(slidingActivity, Some(slidingActivityOracle)),
    "sessionize_30m" -> QueryDef(sessionize, Some(sessionizeOracle)),
    "json_props_agg" -> QueryDef(jsonProps, Some(jsonPropsOracle)),
    "asof_prev_close" -> QueryDef(asofPrevClose, Some(asofPrevCloseOracle)),
    "asof_custom_strategy" -> QueryDef(asofCustom, Some(asofPrevCloseOracle)),
    "asof_tolerance_close" ->
      QueryDef(asofToleranceClose, Some(asofToleranceOracle))
  )
}
