package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Dtype-drift canary: the driver regenerates /root/testdata between
  * rounds and has silently changed physical parquet types twice already
  * (r1: events.ts as INT64 TIMESTAMP(NANOS); r8: TIMESTAMP_MICROS with
  * isAdjustedToUTC=0 → TIMESTAMP_NTZ). Downstream breakage then surfaces
  * as five far-away query failures. This spec pins the NORMALIZED
  * (post-loader) schema of every table so the next drift fails ONE named
  * test that points straight at the loader to fix.
  *
  * Pins are (column → Spark typeName) after Tables.* loading, i.e. what
  * every operator in this library actually sees.
  */
class SchemaCanarySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def pin(df: DataFrame, expected: Seq[(String, String)]): Unit = {
    val got = df.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq
    assert(got === expected,
      s"\nnormalized schema drifted — update the loader (sources/Tables) " +
        s"or this pin;\n  got:      $got\n  expected: $expected")
  }

  test("region schema") {
    pin(Tables.region(spark, dir),
      Seq("r_regionkey" -> "integer", "r_name" -> "string"))
  }

  test("nation schema") {
    pin(Tables.nation(spark, dir),
      Seq("n_nationkey" -> "integer", "n_name" -> "string",
        "n_regionkey" -> "integer"))
  }

  test("customer schema") {
    pin(Tables.customer(spark, dir),
      Seq("c_custkey" -> "long", "c_name" -> "string",
        "c_nationkey" -> "integer", "c_acctbal" -> "double",
        "c_mktsegment" -> "string"))
  }

  test("supplier schema") {
    pin(Tables.supplier(spark, dir),
      Seq("s_suppkey" -> "long", "s_name" -> "string",
        "s_nationkey" -> "integer", "s_acctbal" -> "double"))
  }

  test("part schema") {
    pin(Tables.part(spark, dir),
      Seq("p_partkey" -> "long", "p_name" -> "string",
        "p_brand" -> "string", "p_type" -> "string",
        "p_size" -> "integer", "p_retailprice" -> "double"))
  }

  test("orders schema") {
    // o_orderdate arrives NTZ today; operators cast where an instant is
    // required, and DuckDB reads the same naive value — pinned as-is so a
    // flip back to UTC-adjusted (or to DATE) is caught here first.
    pin(Tables.orders(spark, dir),
      Seq("o_orderkey" -> "long", "o_custkey" -> "long",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"))
  }

  test("lineitem schema") {
    pin(Tables.lineitem(spark, dir),
      Seq("l_orderkey" -> "long", "l_partkey" -> "long",
        "l_suppkey" -> "long", "l_linenumber" -> "integer",
        "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string",
        "l_shipdate" -> "timestamp_ntz"))
  }

  test("events schema (ts NORMALIZED to plain timestamp)") {
    // the one loader with active normalization: withWatermark and
    // unix_micros downstream require TIMESTAMP, never NTZ or raw nanos
    pin(Tables.events(spark, dir),
      Seq("event_id" -> "long", "ts" -> "timestamp", "user_id" -> "long",
        "event_type" -> "string", "value" -> "double",
        "props" -> "string"))
  }

  test("documents schema") {
    pin(Tables.documents(spark, dir),
      Seq("doc_id" -> "long", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "long"))
  }

  test("embeddings schema") {
    pin(Tables.embeddings(spark, dir),
      Seq("vec_id" -> "long", "embedding" -> "array", "label" -> "integer"))
    assert(Tables.embeddings(spark, dir).schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.typeName === "float")
  }

  test("streaming events source carries the same normalized ts") {
    val st = graft.streaming.Streaming.eventsStream(spark, dir)
    assert(st.schema("ts").dataType.typeName === "timestamp",
      "eventsStream must normalize ts exactly like Tables.events")
  }
}
