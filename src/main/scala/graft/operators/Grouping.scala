package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic grouping/ranking operators + the remaining multi-grouping and
  * statistical aggregate coverage. */
object Grouping {

  /** Top-k rows per group, deterministic (orderCols then tieBreak). The
    * standard window-rank formulation: one shuffle on the group key, no
    * global sort, k rows retained per group. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], k: Int,
                   order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Top event per user by value (tie → earlier event id). */
  def topEventPerUser(s: SparkSession, dir: String): DataFrame =
    topKPerGroup(
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
                col("value")),
      Seq("user_id"), 1, Seq(desc("value"), asc("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"),
              round(col("value"), 6).as("value"), col("rn"))

  /** CUBE over (o_orderstatus, o_orderpriority) as hierarchical
    * re-aggregation (same rationale as Relational.rollupRevenue: no
    * Expand row replication, and no Spark 4.1 ambiguity false-positive).
    * The four grouping sets re-aggregate the finest-grain result. */
  def cubeOrderStats(s: SparkSession, dir: String): DataFrame = {
    val all = lit("ALL")
    val detail = Tables.orders(s, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n0"), sum("o_totalprice").as("t0"))
    val byStatus = detail.groupBy("o_orderstatus")
      .agg(sum("n0").as("n0"), sum("t0").as("t0"))
      .select(col("o_orderstatus"), all.as("o_orderpriority"),
              col("n0"), col("t0"))
    val byPriority = detail.groupBy("o_orderpriority")
      .agg(sum("n0").as("n0"), sum("t0").as("t0"))
      .select(all.as("o_orderstatus"), col("o_orderpriority"),
              col("n0"), col("t0"))
    val grand = detail.agg(sum("n0").as("n0"), sum("t0").as("t0"))
      .select(all.as("o_orderstatus"), all.as("o_orderpriority"),
              col("n0"), col("t0"))
    detail.select(col("o_orderstatus"), col("o_orderpriority"),
        col("n0"), col("t0"))
      .union(byStatus).union(byPriority).union(grand)
      .select(col("o_orderstatus").as("status"),
              col("o_orderpriority").as("priority"),
              col("n0").as("n_orders"), round(col("t0"), 2).as("total"))
      .orderBy("status", "priority")
  }

  /** Exact interpolated percentiles + second-moment stats per flag.
    * Both percentiles come from ONE array-argument aggregate — a single
    * per-group value buffer and one sort, instead of two independent
    * percentile buffers each holding every group value (measured ~2× on
    * this query; exact percentiles are buffer-bound, so halving buffers
    * is the whole game — the approximate tier is approxLineitemStats). */
  def lineitemStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("pcts"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("corr_qty_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1), 4).as("median_price"),
        round(element_at(col("pcts"), 2), 4).as("p90_price"),
        col("sd_qty"), col("corr_qty_price"), col("avg_disc"))
      .orderBy("l_returnflag")

  /** Pivot: event types to columns, hour-of-day to rows. The value list
    * is explicit — an open-ended `pivot(col)` first collects the distinct
    * values to the driver, a hidden job that surprises at scale. */
  def eventsTypePivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(hour(col("ts")).as("hod"), col("event_type"), col("value"))
      .groupBy("hod")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum("value"), 2))
      .na.fill(0.0)
      .orderBy("hod")

  /** Unpivot (melt): the wide per-hour event-type matrix back to long
    * (hod, event_type, sum_value) rows. Unpivot is pure per-row
    * restructuring — value-list×1 row expansion, no shuffle beyond the
    * upstream pivot's own aggregation. */
  def eventsTypeUnpivot(s: SparkSession, dir: String): DataFrame =
    eventsTypePivot(s, dir)
      .unpivot(
        Array(col("hod")),
        Array("click", "error", "purchase", "signup", "view").map(col),
        "event_type", "sum_value")
      .orderBy("hod", "event_type")

  /** GROUPING SETS with non-hierarchical, mixed-granularity sets:
    * ((status, year), (priority), ()) — the general form that ROLLUP and
    * CUBE are special cases of. Same execution stance as
    * rollupRevenue/cubeOrderStats: aggregate the finest grain once, then
    * re-aggregate its (tiny) output per set — no Expand replication of
    * input rows, one corpus-scale shuffle total. */
  def orderGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val all = lit("ALL")
    val detail = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"),
        year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n0"), sum("o_totalprice").as("t0"))
    val statusYear = detail.groupBy("o_orderstatus", "o_year")
      .agg(sum("n0").as("n0"), sum("t0").as("t0"))
      .select(col("o_orderstatus").as("status"), all.as("priority"),
        col("o_year").cast("string").as("o_year"), col("n0"), col("t0"))
    val byPriority = detail.groupBy("o_orderpriority")
      .agg(sum("n0").as("n0"), sum("t0").as("t0"))
      .select(all.as("status"), col("o_orderpriority").as("priority"),
        all.as("o_year"), col("n0"), col("t0"))
    // coalesce the grand count: agg over zero detail rows yields NULL,
    // but native GROUPING SETS (and the oracle) emit count(*)=0 for the
    // () set on an empty input (sum stays NULL in both)
    val grand = detail.agg(coalesce(sum("n0"), lit(0L)).as("n0"),
        sum("t0").as("t0"))
      .select(all.as("status"), all.as("priority"), all.as("o_year"),
        col("n0"), col("t0"))
    statusYear.union(byPriority).union(grand)
      .select(col("status"), col("priority"), col("o_year"),
        col("n0").as("n_orders"), round(col("t0"), 2).as("total"))
      .orderBy("status", "priority", "o_year")
  }

  /** Trailing 7-day revenue per ship date: a RANGE-frame window (frame
    * membership by value distance, not row count) over per-day partials.
    * Aggregating to days first keeps the window state tiny; the window
    * itself is a single pass over ~date-count rows. */
  def rolling7dRevenue(s: SparkSession, dir: String): DataFrame = {
    // day_rev sums in DECIMAL and is rounded BEFORE the window sum.
    // Revenue terms have exactly 4 decimals (2-decimal price × 2-decimal
    // discount factor), so small per-day double sums land exactly on
    // half-cent rounding TIES — which FP summation order then breaks
    // differently per engine. Decimal aggregation is order-independent
    // and exact; and a moving sum of exact 2-decimal partials can't sit
    // near a rounding boundary either.
    val daily = Tables.lineitem(s, dir)
      .groupBy(col("l_shipdate").as("ship_date"))
      .agg(round(sum(expr(
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")), 2)
        .cast("double").as("day_rev"))
    val w = Window.orderBy(col("d"))
      .rangeBetween(-6L * 86400L, Window.currentRow)
    daily
      .withColumn("d", unix_timestamp(col("ship_date")))
      .withColumn("rev_7d", round(sum("day_rev").over(w), 2))
      .select(date_format(col("ship_date"), "yyyy-MM-dd").as("ship_day"),
        col("day_rev"), col("rev_7d"))
      .orderBy("ship_day")
  }

  /** Sketch tier: approximate distinct counts (HyperLogLog++) and
    * approximate percentiles (Greenwald-Khanna) — the O(1)-memory
    * versions of order_status_stats / lineitem_stats for when exact
    * distinct/percentile shuffles are too expensive at 100 TB. Algorithm-
    * specific results can't hash-match another engine → rows-only check,
    * with error-bound assertions in GroupingSpec. */
  def approxLineitemStats(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        round(element_at(expr(
          "approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)"), 1), 4)
          .as("approx_median"),
        round(element_at(expr(
          "approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)"), 2), 4)
          .as("approx_p90"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Driver-checkable sketch invariants for [[approxLineitemStats]]: the
    * exact side of each statistic (SQL-recomputable) plus an int flag
    * asserting the sketch landed within its error budget — HLL++ default
    * rsd is 5%, so 10% is a 2-sigma budget; approx_percentile at
    * accuracy=1000 has rank error ≤ n/1000, far inside 2% of value on
    * this price distribution. The oracle emits the exact values and
    * literal 1s: a sketch drifting out of budget flips the hash red while
    * the algorithm-specific estimates themselves stay out of the hash. */
  def approxStatsBounds(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // The single countDistinct forces the whole aggregate through a
    // two-phase (flag, partkey) pre-aggregation — which would build and
    // merge the sort-buffering exact-percentile (and HLL) buffers per
    // FINE-GRAINED group, ~200k buffers instead of 3. Two lean
    // aggregates joined on the 3-row key are ~2× cheaper and keep each
    // plan's partial aggregation shape right.
    val distinctSide = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val rest = li.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_partkey")).as("ap"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)")
          .as("apct"),
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("epct"))
    rest.join(distinctSide, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("exact_parts"),
        (abs(col("ap") - col("exact_parts")) <=
          lit(0.10) * col("exact_parts")).cast("int").as("parts_ok"),
        (abs(element_at(col("apct"), 1) - element_at(col("epct"), 1)) <=
          lit(0.02) * element_at(col("epct"), 1)).cast("int").as("median_ok"),
        (abs(element_at(col("apct"), 2) - element_at(col("epct"), 2)) <=
          lit(0.02) * element_at(col("epct"), 2)).cast("int").as("p90_ok"))
      .orderBy("l_returnflag")
  }

  /** Misra-Gries heavy hitters over a string column — the bounded-memory
    * frequent-items sketch for columns whose EXACT count-by-key would
    * need vocabulary-scale aggregation state (domains, n-grams, user ids
    * at 100 TB). Per-partition streaming MG summaries of k counters each
    * (mapPartitions is the right rung here: the sketch is imperative
    * per-partition state, same justification as the multimodal batch
    * decode), then ONE tiny shuffle of ≤ partitions×k summary rows merged
    * by pointwise sum — never a corpus-scale shuffle. Mergeability is the
    * Agarwal et al. (PODS 2012) result: summed MG summaries keep the
    * deterministic guarantee, so the output (a) contains EVERY item with
    * true count > n/(k+1), and (b) estimates undercount by at most
    * n/(k+1). Both invariants are driver-hash-checked by
    * [[heavyHitterGate]]. */
  def heavyHitters(words: DataFrame, c: String, k: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    val partials = words.select(col(c)).as[String](Encoders.STRING)
      .mapPartitions({ it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { x =>
          if (m.contains(x)) m(x) += 1L
          else if (m.size < k) m(x) = 1L
          else m.keysIterator.toArray.foreach { key =>
            val v = m(key) - 1L
            if (v == 0L) m.remove(key) else m(key) = v
          }
        }
        m.iterator
      })(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    partials.toDF(c, "est").groupBy(c).agg(sum("est").as("est"))
  }

  /** Driver-checkable invariants for the MG sketch, same shape as the
    * dedup agreement gates: containment (every exactly-heavy word is a
    * sketch candidate) and the deterministic error bound (no candidate
    * overcounts, undercounts bounded by n/(k+1)). n_tokens/n_heavy are
    * exact and SQL-recomputable; the flags are literal 1s in the oracle,
    * so a broken decrement loop or merge flips the driver's hash red even
    * though the sketch itself is not ANSI-expressible. */
  def heavyHitterGate(s: SparkSession, dir: String, k: Int = 64)
      : DataFrame = {
    val words = WordCount.tokens(Tables.documents(s, dir), "text")
      .select(lower(col("word")).as("word"))
    val cand = heavyHitters(words, "word", k)
    val counts = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    // outer coalesces keep the gate well-formed on an empty corpus
    // (sum/max over zero rows are NULL) — same convention as
    // Similarity.knnRecallGates after the round-5 advisory
    val tot = counts
      .agg(coalesce(sum(col("cnt")), lit(0L)).cast("long").as("n_tokens"))
    counts.join(cand, Seq("word"), "left")
      .crossJoin(broadcast(tot))
      .agg(
        coalesce(max(col("n_tokens")), lit(0L)).as("n_tokens"),
        count(when(col("cnt") * (k + 1) > col("n_tokens"), lit(1)))
          .as("n_heavy"),
        coalesce(min(when(col("cnt") * (k + 1) > col("n_tokens"),
          col("est").isNotNull.cast("int"))), lit(1))
          .as("containment_ok"),
        coalesce(min(when(col("est").isNotNull,
          (col("est") <= col("cnt") &&
            (col("cnt") - col("est")) * (k + 1) <= col("n_tokens"))
            .cast("int"))), lit(1)).as("bound_ok"))
  }

  /** Collection aggregates: the distinct event types each user produced,
    * as a deterministic sorted CSV (collect_set is unordered by contract;
    * sort_array + concat_ws makes the result layout-independent AND
    * hash-safe for the driver's scalar compare — never emit raw arrays). */
  def userEventTypeSets(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        concat_ws(",", sort_array(collect_set(col("event_type"))))
          .as("event_types"),
        countDistinct(col("event_type")).as("n_types"))

  /** Sequential-window breadth (lag + ntile): per-customer order recency
    * gap and in-customer spend quartile. Both windows share the customer
    * partition key, so the plan is ONE hash exchange + two in-partition
    * sorts; lag/ntile are O(1)-state single passes. First order's gap is
    * -1 (null-free output keeps the cross-engine hash compare simple). */
  def orderGapsQuartiles(s: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val bySpend = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("gap_days",
        coalesce(datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(byDate)), lit(-1)))
      .withColumn("spend_quartile", ntile(4).over(bySpend))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("gap_days"), col("spend_quartile"))
  }

  /** Session windows over the event stream: events of a user belong to
    * one session while gaps stay under `gap`. Uses Spark's native
    * session_window aggregation (merging windows under the hood — the
    * same state-merge a custom flatMapGroupsWithState would do, but
    * codegen'd and AQE-planned). */
  def userSessions(s: SparkSession, dir: String, gap: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           round(sum("value"), 2).as("session_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("session_value"))

  /** Distribution-rank window breadth: percent_rank / cume_dist /
    * running first over one per-customer partitioning (one shuffle, two
    * sort passes within it). The rank values are exact small-integer
    * ratios, so the doubles are bit-identical across engines. */
  def orderRankStats(s: SparkSession, dir: String): DataFrame = {
    val asc_ = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val desc_ = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"),
      col("o_orderkey").as("orderkey"),
      round(col("o_totalprice"), 2).as("price"),
      round(percent_rank().over(asc_), 6).as("price_pct_rank"),
      round(cume_dist().over(asc_), 6).as("price_cume_dist"),
      first("o_orderkey").over(desc_).as("top_order"))
  }

  /** Robust (median/MAD) outlier statistics — **entirely in integers**.
    * Prices quantize to cents; medians are doubled before casting so the
    * midpoint interpolation (always .0 or .5 over integers) stays exact;
    * deviations and the 3×MAD outlier test then compare BIGINTs — no
    * float ever reaches the hashed output, so the result is bit-exact
    * under any summation order and any engine.
    *
    * Shape: three aggregation passes (median → MAD → outlier count) with
    * the tiny per-group medians broadcast back between passes — the
    * honest dataflow for exact two-level order statistics; at 100 TB
    * each pass is one scan + one bounded-key aggregate. */
  def robustPriceStats(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.lineitem(s, dir).select(
      col("l_returnflag"),
      round(col("l_extendedprice") * 100d, 0).cast("long").as("cents"))
    val med = cents.groupBy("l_returnflag")
      .agg(expr("CAST(2 * percentile(cents, 0.5D) AS BIGINT)").as("med2"))
    val dev = cents.join(broadcast(med), "l_returnflag")
      .withColumn("dev2", abs(lit(2L) * col("cents") - col("med2")))
    val mad = dev.groupBy("l_returnflag")
      .agg(expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").as("mad4"))
    dev.join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        min("med2").as("med2"),
        min("mad4").as("mad4"),
        sum(when(lit(2L) * col("dev2") > lit(3L) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("l_returnflag")
  }
}
