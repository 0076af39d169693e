package graft

import org.apache.spark.sql.SparkSession

/** Runtime configuration surface — the Spark-idiomatic equivalent of the
  * reference's CLI flags (/root/reference/server.py:203-214): plain
  * `spark.conf` keys, flippable per session without code changes
  * (`spark.conf.set(...)` at runtime, `--conf` at submit).
  *
  * The reference's other knobs map onto Spark's own configuration rather
  * than new keys: its mapper/reducer counts (-N/-M) are degree-of-
  * parallelism, i.e. `spark.sql.shuffle.partitions` plus input-split
  * packing, both already first-class (GraftSession sets the local
  * defaults).
  */
object GraftConf {

  /** Word-count case sensitivity — mirrors the reference's
    * `--case-sensitive` flag (server.py:203-214). Default false, same as
    * the reference. */
  val CaseSensitiveKey = "spark.graft.caseSensitive"

  def caseSensitive(spark: SparkSession): Boolean =
    spark.conf.get(CaseSensitiveKey, "false").toBoolean
}
