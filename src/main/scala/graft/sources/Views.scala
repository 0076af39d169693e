package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog face of the library: register every testdata table as a temp
  * view so the full SQL frontend (`spark.sql`) works against the same
  * data the DataFrame operators use — including the GraftExtensions
  * function tier. Views are lazy: registration reads only parquet
  * footers, plans still prune and push down identically. */
object Views {
  private val names = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(s: SparkSession, dir: String): Unit = names.foreach {
    // the events loader normalizes TIMESTAMP(NANOS); use it, not a raw scan
    case "events" => Tables.events(s, dir).createOrReplaceTempView("events")
    case n => Tables.table(s, dir, n).createOrReplaceTempView(n)
  }
}
