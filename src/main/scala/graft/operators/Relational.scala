package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational breadth over the TPC-H-ish testdata: every operator category
  * the reference lacks (SURVEY.md §2.3 — joins, multi-agg, windows, sorts,
  * set-ops, semi/anti, rollup, JSON, time bucketing), built Spark-first.
  *
  * Scale notes (100 TB stance):
  *  - region/nation are bounded tiny dimensions → explicit `broadcast()`;
  *    customer/orders/lineitem join on their keys via shuffle hash/SMJ and
  *    AQE handles skew + post-shuffle coalescing.
  *  - Filters sit directly on the scans so Catalyst pushes them into
  *    parquet (`PushedFilters`), and column pruning trims `ReadSchema`.
  *  - Aggregates are declarative (partial+final hash agg, spillable).
  *  - Top-k uses orderBy+limit → TakeOrderedAndProject (no global sort).
  *  - Double-typed aggregates are rounded on BOTH engine and oracle side,
  *    so bit-level summation-order differences can't flip the compare.
  *  - Timestamps are emitted as formatted strings (oracle-safe: parquet
  *    UTC-instant vs DuckDB naive-timestamp pandas mismatch).
  */
object Relational {

  /** Right-to-be-forgotten cascade: purge a deleted-user set and audit
    * the blast radius across every table that references it — directly
    * (customer, events, orders) or transitively (lineitem through its
    * order's customer). At training-corpus scale this is THE compliance
    * primitive: deletes arrive as a small key set, so every purge is an
    * anti-join with the key side broadcast; lineitem's transitive purge
    * anti-joins against the (still small) doomed-order key set rather
    * than re-joining the full orders table. Counts and surviving-key
    * checksums are integers — exactly hash-checkable.
    */
  def cascadeDeleteAudit(s: SparkSession, dir: String): DataFrame = {
    val doomedUsers = Tables.customer(s, dir)
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey").as("k"))
    val doomedOrders = Tables.orders(s, dir)
      .join(broadcast(doomedUsers), col("o_custkey") === col("k"))
      .select(col("o_orderkey").as("k"))

    // purgeKey drives the anti-join; sumKey is the surviving-row
    // checksum (the table's own id, not the foreign key)
    def audit(name: String, df: DataFrame, purgeKey: String,
              sumKey: String, doomed: DataFrame): DataFrame = {
      val survivors = df.join(broadcast(doomed),
        col(purgeKey) === col("k"), "left_anti")
      val before = df.agg(count(lit(1)).as("n_before"))
      val after = survivors.agg(count(lit(1)).as("n_after"),
        sum(col(sumKey)).as("key_sum_after"))
      before.crossJoin(after).select(
        lit(name).as("tbl"), col("n_before"), col("n_after"),
        (col("n_before") - col("n_after")).as("n_purged"),
        coalesce(col("key_sum_after"), lit(0L)).as("key_sum_after"))
    }

    audit("customer", Tables.customer(s, dir),
        "c_custkey", "c_custkey", doomedUsers)
      .unionAll(audit("events", Tables.events(s, dir),
        "user_id", "event_id", doomedUsers))
      .unionAll(audit("orders", Tables.orders(s, dir),
        "o_custkey", "o_orderkey", doomedUsers))
      .unionAll(audit("lineitem", Tables.lineitem(s, dir),
        "l_orderkey", "l_orderkey", doomedOrders))
      .orderBy("tbl")
  }

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Revenue expression used by several queries (TPC-H style). */
  private val revenue: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q1-style pricing summary: scan-heavy multi-aggregate. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(revenue), 2).as("sum_disc_price"),
        round(sum(revenue * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join, agg, deterministic top-10. */
  def topRevenueOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < ts("1998-01-01"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > ts("1997-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(revenue), 2).as("rev"))
      // format after the agg: per group, not per joined lineitem row
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("rev"))
      .orderBy(desc("rev"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: 6-way join through broadcast dims, revenue/nation. */
  def regionRevenue(s: SparkSession, dir: String): DataFrame = {
    val r = broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA"))
    val n = broadcast(Tables.nation(s, dir))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1998-01-01"))
    Tables.lineitem(s, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(revenue), 2).as("rev"))
      .orderBy(desc("rev"), asc("n_name"))
  }

  /** TPC-H Q4-style: EXISTS as a left-semi join, priority histogram. */
  def orderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
              col("o_orderdate") < ts("1997-01-01"))
    val l = Tables.lineitem(s, dir).filter(col("l_discount") > 0.05)
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Window: top-3 orders per customer by value (row_number). */
  def topOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  /** Window: running per-customer spend (cumulative sum). */
  def runningCustomerSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
      round(sum("o_totalprice").over(w), 2).as("running_spend"))
  }

  /** Distinct aggregation + plain aggs per order status. */
  def orderStatusStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct("o_custkey").as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"),
        round(avg("o_totalprice"), 4).as("avg_price"))
      .orderBy("o_orderstatus")

  /** ROLLUP revenue by region/nation (supplier side), as a hierarchical
    * re-aggregation: one pass over the fact table at the finest grain,
    * then the subtotal levels re-aggregate the tiny grouped result and
    * union in. Semantically GROUP BY ROLLUP(r_name, n_name); at scale
    * this beats the Expand-based rollup (which replicates every fact row
    * once per grouping set), and Spark's ReuseExchange dedupes the shared
    * detail subplan across the union branches. Rollup nulls are folded to
    * 'ALL' so the oracle compare never sees engine-specific null ordering.
    * (Dataset.rollup also trips a false-positive DetectAmbiguousSelfJoin
    * on post-join grouping columns in Spark 4.1.) */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    val detail = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(revenue).as("rev0"))
    val all = lit("ALL")
    detail.select(col("r_name"), col("n_name"), col("rev0"))
      .union(detail.groupBy("r_name")
        .agg(sum("rev0").as("rev0"))
        .select(col("r_name"), all.as("n_name"), col("rev0")))
      .union(detail.agg(sum("rev0").as("rev0"))
        .select(all.as("r_name"), all.as("n_name"), col("rev0")))
      .select(col("r_name").as("region_name"),
              col("n_name").as("nation_name"),
              round(col("rev0"), 2).as("rev"))
      .orderBy("region_name", "nation_name")
  }

  /** Set op EXCEPT: customers with orders but none above the threshold. */
  def modestCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.select(col("o_custkey").as("custkey")).distinct()
      .except(o.filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("custkey")).distinct())
  }

  /** Set op INTERSECT: customers active in both years. */
  def repeatCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("custkey"))
      .intersect(
        o.filter(year(col("o_orderdate")) === 2000)
          .select(col("o_custkey").as("custkey")))
  }

  /** Anti join: customers with no 1995 orders, counted per nation. */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") < ts("1996-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")

  /** GROUP BY + HAVING + join back to the dimension for names. */
  def bigSpenders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("total_spend"),
           count(lit(1)).as("n_orders"))
      .filter(col("total_spend") > 1000000.0)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("total_spend"),
              col("n_orders"))

  /** JSON extraction from the events.props payload column.
    *
    * avg_k is deliberately derived from the integer sum and count
    * (`sum_k / n`) rather than `avg(k)`, and is NOT rounded: Spark's
    * round() (BigDecimal of the shortest-decimal repr, HALF_UP) and
    * DuckDB's round() on DOUBLE (scale-multiply) disagree at 6-dp
    * boundaries, so any post-division rounding is engine-sensitive.
    * Dividing the same two exact integers is a single correctly-rounded
    * IEEE-754 operation — bit-identical on every engine. */
  def eventsJsonStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n"))
      .orderBy("event_type")

  /** Same aggregation through Spark 4's VARIANT type: parse_json builds
    * the binary variant encoding once, variant_get does a TYPED path
    * extraction — for repeated multi-path access this beats re-parsing
    * the JSON text per path (get_json_object parses per call). The
    * engine-facing point is coverage of the modern semi-structured
    * column path; values must equal the string-extraction query's. */
  def eventsVariantStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Full-outer join: per-nation customer AND supplier counts, keeping
    * nations that have only one side. Same shuffle contract as an inner
    * hash join (both pre-aggregated sides are nation-sized — tiny). */
  def nationCoverage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
    val p = Tables.supplier(s, dir).groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(p, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }

  /** Scalar subquery: orders above the global average price. The inner
    * aggregate is one scalar, broadcast into the filter — the plan shape
    * to watch is ONE extra scan + tiny exchange, never a per-row
    * subquery re-execution. */
  def aboveAverageOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val avgPrice = o.agg(avg("o_totalprice").as("ap"))
    o.crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("ap"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_above"),
        round(min("o_totalprice"), 2).as("min_above"))
      .orderBy("o_orderstatus")
  }

  /** Revenue by part brand: fact-to-dim equi-join with the dim
    * explicitly broadcast (part is keys+brand after pruning — megabytes
    * even at 100 TB fact scale), so the fact side never shuffles; the
    * brand aggregate is a 25-key partial+final hash agg and top-10 is
    * TakeOrderedAndProject. */
  def partBrandRevenue(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).select("p_partkey", "p_brand")
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(round(sum(revenue), 2).as("rev"), count(lit(1)).as("n_items"))
      .orderBy(desc("rev"), asc("p_brand"))
      .limit(10)
  }

  /** Hourly time-bucketed aggregation over the event stream table.
    * Groups on the native truncated timestamp (8-byte key, cheap hash)
    * and string-formats AFTER aggregation — the formatter then runs once
    * per (hour, type) group, not once per input event (measured 2.7×
    * on this query at sf0.1). */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** ANSI set operations (INTERSECT / EXCEPT / UNION) on the part sets
    * two supplier nations ship — "assortment overlap" between two
    * sub-corpora. Spark plans `intersect` as distinct + LEFT SEMI and
    * `except` as distinct + LEFT ANTI — keyed shuffle joins that scale
    * like any aggregate, never row-by-row comparison. The nation filter
    * reaches each scan through the broadcast dim join; both part sets
    * are distinct'd BEFORE the set ops so the semi/anti probes run on
    * |parts|, not |lineitem|. */
  def nationPartOverlap(s: SparkSession, dir: String,
                        na: String = "NATION_1",
                        nb: String = "NATION_2"): DataFrame = {
    def partsOf(nm: String) = Tables.lineitem(s, dir)
      .select("l_partkey", "l_suppkey")
      .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === nm).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select("l_partkey").distinct()
    val a = partsOf(na)
    val b = partsOf(nb)
    def n(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
    n(a, "n_a")
      .crossJoin(n(b, "n_b"))
      .crossJoin(n(a.intersect(b), "n_both"))
      .crossJoin(n(a.except(b), "n_only_a"))
      .crossJoin(n(a.union(b).distinct(), "n_union"))
  }
}
