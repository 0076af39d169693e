package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join split handles most skew automatically; salting is the
  * explicit fallback when a handful of keys dominate so heavily that even
  * split shuffle partitions hotspot (or when AQE is off, e.g. inside some
  * streaming sinks). Mechanics:
  *
  *  - big side: add salt = pmod(hash(entire row), n) — deterministic,
  *    uniform, no RNG to ship — so one hot key fans out over n shuffle
  *    partitions;
  *  - small side: explode each row n times, one per salt value;
  *  - join on (key, salt). Same rows out as the unsalted join (asserted
  *    in tests); shuffle cost trades n× replication of the small side
  *    for even distribution of the big side.
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(saltBuckets)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }
}
