package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus refresh — the MERGE/upsert primitive a continuously
  * re-crawled training corpus needs: fold a change set (upserts + deletes)
  * into the base snapshot keyed by document id.
  *
  * Scale shape: ONE co-partitioned shuffle join on the key — the canonical
  * MERGE plan. Both sides hash-shuffle on doc_id (a full-outer join cannot
  * broadcast), AQE handles skew; at 100 TB the base side is typically
  * bucketed on the key so only the (much smaller) delta shuffles. The
  * output is a full new snapshot — the lambda-architecture batch leg;
  * the streaming leg of the same semantics is Streaming's watermarked
  * dedup-at-ingest.
  */
object Incremental {

  /** Deterministic synthetic change set over the documents table (the
    * corpus ships no delta, so fabricate one the oracle can recompute —
    * same fixture-by-construction pattern as TextAnalysis.withSyntheticPii):
    * every 7th doc is revised, the first 25 docs re-arrive as new ids
    * (+30000), every 13th doc is deleted. A doc divisible by both 7 and 13
    * is a delete only, so each key appears at most once in the delta. */
  def syntheticDelta(docs: DataFrame): DataFrame = {
    val cols = Seq(col("doc_id"), col("text"), col("lang"), col("op"))
    val revised = docs
      .filter(pmod(col("doc_id"), lit(7L)) === 0 &&
        pmod(col("doc_id"), lit(13L)) =!= 0)
      .withColumn("text", concat(col("text"), lit(" [revised]")))
      .withColumn("op", lit("upsert")).select(cols: _*)
    val inserted = docs.filter(col("doc_id") < 25)
      .withColumn("doc_id", col("doc_id") + 30000L)
      .withColumn("op", lit("upsert")).select(cols: _*)
    val deleted = docs.filter(pmod(col("doc_id"), lit(13L)) === 0)
      .withColumn("text", lit(null).cast("string"))
      .withColumn("op", lit("delete")).select(cols: _*)
    revised.union(inserted).union(deleted)
  }

  /** MERGE: base FULL OUTER delta on `key`; delta rows win, deletes drop,
    * unmatched base rows survive. `row_status` records what happened to
    * each surviving row (kept / updated / inserted). Assumes each key
    * appears at most once per side (snapshot + compacted delta — the
    * MERGE precondition; ANSI MERGE raises on duplicate matches too). */
  def mergeUpsert(base: DataFrame, delta: DataFrame, key: String)
      : DataFrame = {
    val b = base.select(col(key).as("b_key"),
      col("text").as("b_text"), col("lang").as("b_lang"))
    val d = delta.select(col(key).as("d_key"),
      col("text").as("d_text"), col("lang").as("d_lang"), col("op"))
    b.join(d, col("b_key") === col("d_key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(
        coalesce(col("b_key"), col("d_key")).as(key),
        when(col("d_key").isNull, "kept")
          .when(col("b_key").isNull, "inserted")
          .otherwise("updated").as("row_status"),
        coalesce(col("d_lang"), col("b_lang")).as("lang"),
        coalesce(col("d_text"), col("b_text")).as("text"))
  }

  /** Slowly-changing-dimension Type 2 build: compress each customer's
    * order-priority history into effective-dated version rows
    * (valid_from inclusive, valid_to exclusive, open versions closed
    * with the 9999-12-31 sentinel). Classic gaps-and-islands:
    * change-flag via lag → running sum numbers the islands → one
    * aggregate per island → lead closes each interval.
    *
    * Scale shape: every window is partitioned by the dimension key —
    * ONE hash shuffle on o_custkey, then all three window passes and
    * the island aggregate run within the same partitioning (no second
    * exchange; pinned in IncrementalSpec). No global window, no
    * driver-side state; skewed keys are bounded by a customer's own
    * order count. */
  def scd2History(orders: DataFrame): DataFrame =
    scd2Intervals(orders)
      .select(col("custkey"), col("version"), col("priority"),
        date_format(col("vf_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        coalesce(date_format(col("vt_ts"), "yyyy-MM-dd HH:mm:ss"),
          lit("9999-12-31 00:00:00")).as("valid_to"),
        col("n_orders"))

  /** Timestamp-typed form of the SCD2 dimension (open versions keep a
    * NULL valid_to) — the join-side face; scd2History is the formatted
    * report face. */
  def scd2Intervals(orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byOrder = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val islands = orders
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .withColumn("prev", lag("o_orderpriority", 1).over(byOrder))
      .withColumn("chg",
        when(col("prev").isNull ||
          col("prev") =!= col("o_orderpriority"), 1L).otherwise(0L))
      .withColumn("version", sum("chg").over(byOrder))
      .groupBy(col("o_custkey").as("custkey"), col("version"))
      .agg(min("o_orderpriority").as("priority"),
        min("o_orderdate").as("vf_ts"),
        count(lit(1)).as("n_orders"))
    val byVersion = Window.partitionBy("custkey").orderBy("version")
    islands.withColumn("vt_ts", lead("vf_ts", 1).over(byVersion))
  }

  /** Point-in-time dimension join: enrich each event with the
    * customer's order-priority AS OF the event timestamp — the
    * dimensional-correctness pattern every feature-extraction job needs
    * (joining today's attributes onto yesterday's facts is label
    * leakage). Equi-join on the customer key carries the work; the
    * validity-interval predicate is a per-key filter over that
    * customer's handful of versions, so no range-join machinery is
    * needed. Events before a customer's first version drop (inner).
    * All-integer output (per-row-rounded value cents). */
  def eventPriorityStats(s: SparkSession, dir: String): DataFrame = {
    val dim = scd2Intervals(Tables.orders(s, dir))
    Tables.events(s, dir)
      .join(dim, col("user_id") === col("custkey") &&
        col("ts") >= col("vf_ts") &&
        (col("vt_ts").isNull || col("ts") < col("vt_ts")))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(expr("CAST(round(value * 100, 0) AS BIGINT)"))
          .as("value_cents"))
      .orderBy("priority")
  }

  /** Driver-gated query over the orders table. */
  def scd2CustomerPriority(s: SparkSession, dir: String): DataFrame =
    scd2History(Tables.orders(s, dir))

  /** The driver-gated query: merge the synthetic delta into the documents
    * snapshot; md5 + length stand in for the text so every surviving
    * row's exact content is hash-checked. */
  def corpusRefresh(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
    mergeUpsert(base, syntheticDelta(base), "doc_id")
      .select(col("doc_id"), col("row_status"), col("lang"),
        md5(col("text")).as("fp"), length(col("text")).as("n_chars"))
  }
}
