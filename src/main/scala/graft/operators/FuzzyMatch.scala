package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the entity-resolution
  * primitive: find string pairs within Levenshtein distance k without a
  * cartesian product.
  *
  * A naive `join(levenshtein(a,b) <= k)` has no equi-key, so Catalyst
  * can only plan a BroadcastNestedLoopJoin — O(n²) comparisons and
  * effectively one stream at scale. This operator makes it a shuffled
  * equi join using a COMPLETE length filter: strings within edit
  * distance k differ in length by at most k (each edit changes length
  * by at most 1). With bin width k, the left side maps to its one
  * length bin and the right side explodes into the 3 bins that can
  * hold a partner (`len/k - 1 .. len/k + 1`), so candidate generation
  * is a hash join on the bin key — parallel across a cluster — and the
  * exact `levenshtein <= k` check runs inside the join condition on
  * the ~3× inflated candidate stream, never materializing rejected
  * pairs. `a < b` keeps each unordered pair once, and since the left
  * side owns exactly one bin per string no post-join dedup is needed.
  *
  * Recall is exact (the length band is a necessary condition), unlike
  * first-letter/soundex blocking which silently drops pairs whose edit
  * touches the blocking key. Work is Σ_bins |L_bin|·|R_bin±1| — for
  * name-like data the length histogram is narrow, so pre-group to
  * DISTINCT values first (the caller below does) and re-join matches
  * back to rows by equality when row-level pairs are needed.
  */
object FuzzyMatch {

  /** Pairs of distinct values of `col` in `df` with
    * `levenshtein(a, b) <= maxDist`, `a < b`. */
  def similarPairs(df: DataFrame, c: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val names = df.select(col(c).as("v")).na.drop().distinct()
    val bin = expr(s"length(v) div $maxDist")
    val left = names.select(col("v").as("a"), bin.as("__bin"))
    val right = names
      .select(col("v").as("b"),
        explode(sequence(bin - 1, bin + 1)).as("__bin"))
    // Catalyst pushes the dist filter back INTO the join condition
    // (verified via explain: `Join condition: levenshtein(a,b) <= k AND
    // a < b`), which is the shape we want — rejected candidates die
    // inside the join and are never materialized. levenshtein runs once
    // per candidate in the condition plus once per SURVIVOR in the
    // output projection; survivors are a tiny fraction of candidates,
    // so the re-evaluation is noise, not a 2x.
    left.join(right,
        left("__bin") === right("__bin") && col("a") < col("b"))
      .select(col("a"), col("b"),
        levenshtein(col("a"), col("b")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** Gated query: near-identical part names (edit distance <= 2) — the
    * catalog-cleaning pass that finds typo'd duplicate product entries. */
  def fuzzyPartMatch(s: SparkSession, dir: String): DataFrame =
    similarPairs(Tables.part(s, dir), "p_name", maxDist = 2)
}
