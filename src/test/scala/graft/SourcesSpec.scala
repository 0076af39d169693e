package graft

import graft.operators.WordCount
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink breadth: the reference's text sink format (O7: lines of
  * "{word} {count}", one dir of part files — SURVEY.md §1.4) plus the
  * csv/json/partitioned-parquet surfaces a pipeline user needs. Results
  * compare as multisets, never file order/layout (SURVEY.md §7.4.2). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def tmp() = Files.createTempDirectory("graft-io").toString

  test("reference-format text sink round-trips the word counts") {
    val wc = WordCount.wordCount(Tables.documents(spark, dir), "text", false)
    val out = tmp() + "/out"
    // O7: space-separated "{word} {count}" lines, M part files, unsorted
    wc.select(concat_ws(" ", col("word"), col("cnt")).as("value"))
      .repartition(4) // n_reduce analogue
      .write.mode("overwrite").text(out)
    val back = spark.read.text(out)
      .select(split(col("value"), " ").as("a"))
      .select(col("a")(0).as("word"), col("a")(1).cast("long").as("cnt"))
    assert(back.as[(String, Long)].collect().toMap ===
           wc.as[(String, Long)].collect().toMap)
  }

  test("csv round trip with schema preserves values") {
    val src = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val out = tmp() + "/csv"
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(src.schema).csv(out)
    assert(back.count() === src.count())
    assert(back.agg(round(sum("o_totalprice"), 2)).as[Double].collect()(0) ===
           src.agg(round(sum("o_totalprice"), 2)).as[Double].collect()(0))
  }

  test("orc round trip preserves values") {
    val src = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val out = tmp() + "/orc"
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() === src.count())
    assert(back.agg(round(sum("l_extendedprice"), 2)).as[Double]
             .collect()(0) ===
           src.agg(round(sum("l_extendedprice"), 2)).as[Double].collect()(0))
  }

  test("json round trip preserves nested struct columns") {
    val src = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        struct(col("user_id"), col("value")).as("payload"))
    val out = tmp() + "/json"
    src.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() === src.count())
    assert(back.select(sum("payload.user_id")).as[Long].collect()(0) ===
           src.select(sum("payload.user_id")).as[Long].collect()(0))
  }

  test("bucketed tables co-locate the equi-join: no shuffle exchange") {
    // The 100 TB fact-fact join story: write both sides bucketed (and
    // sorted) on the join key, and the sort-merge join reads buckets
    // pairwise — zero Exchange in the plan, the shuffle was paid once at
    // write time and amortizes over every subsequent join.
    val o = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    o.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_bkt")
    l.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() ===
        o.join(l, col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("json-lines round trip preserves values under an explicit schema") {
    val src = Tables.events(spark, dir)
      .select("event_id", "user_id", "event_type", "value")
    val out = tmp() + "/json"
    src.write.mode("overwrite").json(out)
    // explicit schema: JSON inference would widen/reorder types
    val back = spark.read.schema(src.schema).json(out)
    assert(back.count() === src.count())
    assert(back.agg(sum("event_id")).as[Long].collect().head ===
           src.agg(sum("event_id")).as[Long].collect().head)
  }

  test("small-file compaction: fragmented table → bounded file count, lossless") {
    // the 100 TB operational chore: streaming/incremental sinks leave
    // thousands of small files; compaction is a repartition-rewrite with
    // a per-file row cap, and must preserve the rows exactly
    val docs = Tables.documents(spark, dir)
    val frag = tmp() + "/frag"
    docs.repartition(64).write.parquet(frag)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag) === 64)
    val compact = tmp() + "/compact"
    spark.read.parquet(frag).repartition(4)
      .write.option("maxRecordsPerFile", 100000).parquet(compact)
    assert(parquetFiles(compact) === 4)
    assert(spark.read.parquet(compact).as[(Long, String, String, String, Long)]
      .collect().toSet ===
      docs.as[(Long, String, String, String, Long)].collect().toSet)
  }

  test("ivfpq index: cell-partitioned write reads only the probed cell dirs") {
    // SURVEY §9's storage claim, actually gated: at 100 TB the IVF cell
    // id is a partition column, so a probe's nprobe-cell filter must
    // prune the scan to those directories — anything else re-reads the
    // whole code table and the composition's I/O story collapses
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, dir)
    val (cents, _, index) = Similarity.ivfPqIndex(emb)
    assert(cents.nonEmpty)
    val out = tmp() + "/ivfpq_index"
    index.write.mode("overwrite").partitionBy("cell").parquet(out)
    val back = spark.read.parquet(out)
    val allCells = back.select("cell").distinct()
      .as[Int].collect().sorted
    assert(allCells.length > 8, s"corpus only filled ${allCells.length} cells")
    val probed = allCells.take(8) // an nprobe=8 probe's cell set
    val pruned = back.filter(col("cell").isin(probed.map(Integer.valueOf): _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("cell"),
      s"expected partition pruning on cell in:\n$plan")
    // the scan's OWN file-count metric (inputFiles reports the
    // relation's full listing, pruning happens below that level):
    // after execution it must equal exactly the files on disk under
    // the probed cells' dirs — only nprobe dirs opened
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    val onDisk = probed.map(c =>
      new java.io.File(s"$out/cell=$c")
        .listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(onDisk > 0)
    assert(scan.metrics("numFiles").value === onDisk,
      s"pruned scan opened ${scan.metrics("numFiles").value} files, " +
        s"probed dirs hold $onDisk")
    assert(scan.metrics("numFiles").value < back.inputFiles.length,
      "pruning removed no files — every cell dir still opens")
  }

  test("partitioned parquet write enables partition pruning") {
    val out = tmp() + "/part"
    Tables.orders(spark, dir)
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("status") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"),
      s"expected partition pruning in:\n$plan")
    assert(pruned.count() ===
      Tables.orders(spark, dir).filter(col("o_orderstatus") === "F").count())
  }

  test("partitioned_lang_stats prunes to the two selected lang dirs") {
    val df = SparkEntry.queries("partitioned_lang_stats")(spark, dir)
    // sparkPlan, not executedPlan: under AQE the executed root is an
    // AdaptiveSparkPlanExec whose children collect() doesn't traverse
    val scan = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // static partition pruning: only lang=en / lang=es directories survive
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files.map(_.getPath.toString))
    assert(parts.nonEmpty)
    assert(parts.forall(p => p.contains("lang=en") || p.contains("lang=es")),
      s"unpruned files: ${parts.filterNot(p =>
        p.contains("lang=en") || p.contains("lang=es"))}")
    // and the round trip is lossless vs the source table
    val direct = Tables.documents(spark, dir)
      .filter(col("lang").isin("en", "es"))
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .as[(String, Long)].collect().toMap
    val got = df.select("lang", "n_docs").as[(String, Long)].collect().toMap
    assert(got === direct)
  }

  test("textDirTolerant: missing inputs yield empty output, not errors") {
    // reference semantics (client.py:41-42): nonexistent inputs are
    // skipped; a job over no files produces empty output
    assert(Tables.textDirTolerant(spark, "/nonexistent/nowhere")
      .count() === 0)
    val empty = java.nio.file.Files
      .createTempDirectory("graft-empty").toString
    assert(Tables.textDirTolerant(spark, empty).count() === 0)
    // schema identical to the throwing reader
    assert(Tables.textDirTolerant(spark, empty).schema.fieldNames
      .toSeq === Seq("line"))
    // and with files present it IS the plain reader
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$empty/a.txt"), "one line\ntwo line")
    assert(Tables.textDirTolerant(spark, empty).count() === 2)
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-evolve").toString
    // v1 writer: (doc_id, text); v2 adds a quality column
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/t/batch=1")
    Seq((3L, "c", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$tmp/t/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$tmp/t")
    assert(df.schema.fieldNames.sorted.toSeq ===
      Seq("batch", "doc_id", "quality", "text"))
    val rows = df.select("doc_id", "quality")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows(1L).isEmpty && rows(3L).contains(0.9))
    assert(df.count() === 3)
  }

  test("Views.register exposes every table to the SQL frontend") {
    val dir = "/root/testdata/sf0.001"
    graft.sources.Views.register(spark, dir)
    val n = spark.sql("SELECT count(*) AS n FROM lineitem")
      .as[Long].collect().head
    assert(n === Tables.lineitem(spark, dir).count())
    // the events view carries the normalized timestamp, not raw nanos
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts")
      .dataType.typeName === "timestamp")
    // a join through the catalog plans with the same pushdown as the
    // DataFrame form: filters reach the parquet scan
    val plan = spark.sql(
      """SELECT count(*) FROM orders JOIN customer
        |ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'
        |""".stripMargin).queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"), plan)
  }

  test("packed-shard sink: shard-partitioned write, pruned single-shard read") {
    import graft.operators.TextAnalysis
    // the trainer-facing artifact: packed context windows written
    // partitioned by shard, so a trainer (or a resumed job) reading one
    // shard touches only that shard's directory
    val packed = TextAnalysis.bpePackAssembly(spark, dir)
    val out = tmp() + "/packed"
    packed.write.mode("overwrite").partitionBy("shard").parquet(out)
    val one = spark.read.parquet(out).filter(col("shard") === "0")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"),
      s"expected shard pruning in:\n$plan")
    // round trip is lossless per shard
    assert(one.select("bin_id", "n_docs", "bin_toks")
        .as[(Long, Long, Long)].collect().toSet ===
      packed.filter(col("shard") === "0")
        .select("bin_id", "n_docs", "bin_toks")
        .as[(Long, Long, Long)].collect().toSet)
  }
}
