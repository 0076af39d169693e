package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a same-named entry in `oracleSql` (ANSI SQL
  * run by DuckDB over the same parquet tables) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the reference's word-count job (SURVEY.md §2.1) as top-k
    * word frequencies over the sf0.001 documents corpus. */
  def entry(spark: SparkSession): DataFrame =
    WordCount.topK(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text", 20)

  /** Shared DuckDB SQL fragment: reference-exact tokenization of
    * documents.text (newline→space, strip Python string.punctuation,
    * split on runs of spaces, drop whitespace-only tokens). */
  private val DuckTokens: String =
    """SELECT unnest(string_split_regex(
      |         regexp_replace(regexp_replace(text, chr(10), ' ', 'g'),
      |                        '[!-/:-@\[-`{-~]', '', 'g'),
      |         ' +')) AS word
      |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: word count (SURVEY.md §2.1 O1-O7) ---
    "wordcount_ci" -> ((s, dir) =>
      WordCount.wordCount(Tables.documents(s, dir), "text", caseSensitive = false)
        .orderBy("word")),
    "wordcount_cs" -> ((s, dir) =>
      WordCount.wordCount(Tables.documents(s, dir), "text", caseSensitive = true)
        .orderBy("word")),
    "wordcount_topk" -> ((s, dir) =>
      WordCount.topK(Tables.documents(s, dir), "text", 50)),
  )

  def oracleSql: Map[String, String] = Map(
    "wordcount_ci" ->
      s"""SELECT lower(word) AS word, count(*) AS cnt
         |FROM ($DuckTokens) t
         |WHERE regexp_matches(word, '\\S')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "wordcount_cs" ->
      s"""SELECT word, count(*) AS cnt
         |FROM ($DuckTokens) t
         |WHERE regexp_matches(word, '\\S')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "wordcount_topk" ->
      s"""SELECT lower(word) AS word, count(*) AS cnt
         |FROM ($DuckTokens) t
         |WHERE regexp_matches(word, '\\S')
         |GROUP BY 1 ORDER BY cnt DESC, word LIMIT 50""".stripMargin,
  )
}
