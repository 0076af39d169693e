package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the stream table: ordered funnels,
  * retention cohorts, and gap-filled resampling — the product-analytics
  * views a training-data platform runs over its own telemetry.
  *
  * Scale notes (100 TB stance):
  *  - Every operator's only corpus-scale exchange is ONE hash shuffle on
  *    user_id (funnel stage joins are per-user aggregates joined on the
  *    already-shuffled key; cohorts and resampling window per user).
  *  - Week/day indexes are INTEGER day-diffs (`DIV`), never calendar
  *    week-of-year — engine-portable, timezone-free, hash-exact.
  *  - The resample grid explodes per user with a bounded span; filled
  *    values are pass-through doubles (no arithmetic), so hashing is
  *    safe.
  */
object EventAnalytics {

  private val Epoch = "2024-01-01"

  /** Ordered funnel: users whose first 'view' precedes a later 'click'
    * that precedes a later 'purchase'. Strictly ordered timestamps —
    * a click before the first view does not count. Emits per-stage
    * reached-user counts. */
  def funnelCounts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    def stage(t: String) = ev.filter(col("event_type") === t)
    val v = stage("view").groupBy("user_id").agg(min("ts").as("t1"))
    val c = stage("click").join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val p = stage("purchase").join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def cnt(df: DataFrame, n: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("stage"), lit(name).as("stage_name"),
          col("n_users"))
    cnt(v, 1, "view").unionAll(cnt(c, 2, "view>click"))
      .unionAll(cnt(p, 3, "view>click>purchase"))
      .orderBy("stage")
  }

  /** Retention cohorts: users grouped by first-seen week (integer weeks
    * since the epoch), counted per week offset they remain active. */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"),
      expr(s"datediff(ts, DATE '$Epoch') DIV 7").as("week"))
    val first = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(first, "user_id")
      .select(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Daily resample with forward fill: each user's value series sampled
    * onto a continuous day grid (global span), carrying the last
    * observed per-day closing value forward across gap days. The classic
    * time-series regularization before any windowed feature extraction. */
  def resampleForwardFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      expr(s"datediff(ts, DATE '$Epoch')").as("day"),
      col("ts"), col("value"))
    // per (user, day) closing value: last event of the day wins,
    // event_id breaking exact-timestamp ties
    val byDay = ev.withColumn("rn",
        row_number().over(Window.partitionBy("user_id", "day")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value").as("obs"))
    val span = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val grid = byDay.select("user_id").distinct()
      .crossJoin(broadcast(span))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val filled = grid.join(byDay, Seq("user_id", "day"), "left")
      .withColumn("filled",
        last("obs", ignoreNulls = true).over(
          Window.partitionBy("user_id").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    filled.select(col("user_id"), col("day"),
        round(col("filled"), 6).as("value"),
        col("obs").isNotNull.cast("int").as("observed"))
      .filter(col("value").isNotNull) // days before a user's first event
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for every (src → dst) consecutive pair, its count and transition
    * probability in integer millionths (`cnt·1e6 DIV src_total` — exact
    * on every engine; a float ratio could differ in the last ulp).
    *
    * The per-user sequencing (lead over `ts, event_id` — the id makes
    * equal-timestamp ordering total and deterministic) is the one
    * corpus-scale exchange, on user_id. The pair table is
    * |event_type|²-bounded, so its aggregate and the per-src totals
    * re-aggregate are vocabulary-sized, and the totals join is a
    * broadcast. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
    val cnt = pairs.groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy("src").agg(sum("cnt").as("src_total"))
    cnt.join(broadcast(tot), "src")
      .select(col("src"), col("dst"), col("cnt"),
        expr("cnt * 1000000 DIV src_total").as("p_millionths"))
      .orderBy("src", "dst")
  }

  /** The gap a session closes after — shared by the batch and streaming
    * sessionizers so their outputs are definitionally comparable. */
  val SessionGap = "2 hours"

  /** Session aggregation body over any (user_id, ts, value) frame — ONE
    * definition, two execution modes (batch here, append-mode streaming
    * in Streaming.streamedSessions). `session_window` merges an event
    * into the current session while ts < last_ts + gap, i.e. a new
    * session starts exactly when the inter-event gap reaches
    * [[SessionGap]] — the gaps-and-islands semantics the ANSI oracle
    * recomputes with lag + a running break sum. Duration is exact
    * integer microseconds (unix_micros both engines); the session key
    * shuffles on user_id like any aggregation — no global window. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), SessionGap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        max(col("ts")).as("last_ts"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("sum_value"),
        (expr("unix_micros(last_ts)") - expr("unix_micros(sw.start)"))
          .as("dur_us"))

}
