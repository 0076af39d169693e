package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ordinary least squares via exact integer sufficient
  * statistics — the canonical "learn on the cluster, solve on the
  * driver-sized output" pattern: one linear pass computes
  * (n, Σx, Σy, Σxx, Σxy) with map-side partial aggregation, and the
  * closed-form slope/intercept fall out as ratios of those sums. The
  * model fit itself costs exactly one aggregate shuffle of
  * O(#groups × 5) longs, independent of corpus size — this is the
  * 100 TB regression story (contrast with iterative SGD, which would
  * pay a pass per epoch).
  *
  * All sufficient statistics are BIGINT over integer features, so they
  * are associative and reduction-order-independent — bit-identical
  * across partition layouts and engines. The slope is emitted as an
  * exact integer fraction
  *   slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)  =  num / den
  * rather than a float division whose last ulp could differ; a
  * degenerate group (x constant) shows itself as `slope_den = 0`
  * instead of a hidden divide-by-zero. Magnitude check: num ≤ n·Σxy, so
  * ~1e13 at sf0.1 — far inside BIGINT; at true 100 TB scale the same
  * pass would carry DECIMAL(38,0) sums, identical plan shape.
  */
object Regression {

  /** Per-group simple OLS of `y` on `x` (integer columns). Output: one
    * row per group with n and the slope as an exact integer fraction —
    * the same closed-form polynomial of the sums on every engine, so no
    * canonicalization is needed for the pair to hash-compare. */
  def olsByGroup(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("grp"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))

  /** Gated query: per-language regression of character count on token
    * count over the documents corpus — "how many chars does a token
    * cost in each language", the calibration constant a token-budget
    * planner needs. */
  def olsCharsPerToken(s: SparkSession, dir: String): DataFrame =
    olsByGroup(
      Tables.documents(s, dir)
        .select(col("lang"), size(tokenize(col("text"))).as("n_toks"),
          length(col("text")).as("n_chars")),
      "lang", "n_toks", "n_chars")
      .withColumnRenamed("grp", "lang")
      .orderBy("lang")
}
