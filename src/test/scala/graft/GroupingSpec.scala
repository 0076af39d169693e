package graft

import graft.operators.Grouping
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GroupingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx sketch stats land within error bounds of exact values") {
    val approx = Grouping.approxLineitemStats(spark, dir)
      .select("l_returnflag", "approx_parts", "approx_median")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"),
        expr("percentile(l_extendedprice, 0.5)").as("m"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, (d, m)) <- exact) {
      val (ad, am) = approx(flag)
      // HLL++ default rsd is 5%; allow 3 sigma
      assert(math.abs(ad - d).toDouble / d < 0.15, s"$flag distinct: $ad vs $d")
      // GK with accuracy 1000 → rank error ~0.1%; prices are dense so
      // the value error stays small
      assert(math.abs(am - m) / m < 0.05, s"$flag median: $am vs $m")
    }
  }

  test("approx bounds gate reports every sketch inside its error budget") {
    val rows = Grouping.approxStatsBounds(spark, dir)
      .select("l_returnflag", "parts_ok", "median_ok", "p90_ok")
      .as[(String, Int, Int, Int)].collect()
    assert(rows.length === 3)
    rows.foreach { case (f, p, m, q) =>
      assert(p === 1 && m === 1 && q === 1, s"$f sketch out of budget")
    }
  }

  test("pivot emits one column per declared event type, zero-filled") {
    val df = Grouping.eventsTypePivot(spark, dir)
    assert(df.columns.toSeq ===
      Seq("hod", "click", "error", "purchase", "signup", "view"))
    assert(df.count() > 0 && df.count() <= 24)
    // pivoted cells are never null (na.fill)
    val nulls = df.columns.map(c => sum(col(c).isNull.cast("int")))
    assert(df.agg(nulls.head, nulls.tail: _*).collect()(0).toSeq
      .map(_.asInstanceOf[Long]).sum === 0L)
  }

  test("rolling 7d revenue: trailing frame equals a self-join oracle") {
    val got = Grouping.rolling7dRevenue(spark, dir)
    val daily = Tables.lineitem(spark, dir)
      .groupBy(col("l_shipdate").as("d"))
      .agg(round(sum(expr(
        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")), 2)
        .cast("double").as("r"))
    val viaJoin = daily.as("a").join(daily.as("b"),
        col("b.d") <= col("a.d") &&
        col("b.d") >= col("a.d") - expr("INTERVAL 6 DAY"))
      .groupBy(col("a.d").as("d"))
      .agg(round(sum(col("b.r")), 2).as("rev_7d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("ship_day"),
        col("rev_7d"))
    val diff = got.select("ship_day", "rev_7d").as("x")
      .join(viaJoin.as("y"), Seq("ship_day"))
      .filter(col("x.rev_7d") =!= col("y.rev_7d"))
    assert(diff.count() === 0)
    assert(got.count() === daily.count())
  }

  test("unpivot restores the long form of the pivoted matrix") {
    val long = Grouping.eventsTypeUnpivot(spark, dir)
    assert(long.columns.toSeq === Seq("hod", "event_type", "sum_value"))
    val hours = Grouping.eventsTypePivot(spark, dir).count()
    assert(long.count() === hours * 5)
    // every direct (hod, type) aggregate appears identically in the melt
    val direct = Tables.events(spark, dir)
      .select(hour(col("ts")).as("hod"), col("event_type"), col("value"))
      .groupBy("hod", "event_type")
      .agg(round(sum("value"), 2).as("sum_value"))
    assert(direct.join(long, Seq("hod", "event_type", "sum_value"),
      "left_anti").count() === 0)
  }

  test("grouping-sets re-aggregation matches native GROUPING SETS") {
    val mine = Grouping.orderGroupingSets(spark, dir)
      .collect().map(_.toSeq).toSeq
    Tables.orders(spark, dir).createOrReplaceTempView("orders_gs")
    val native = spark.sql(
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        |  coalesce(o_orderpriority,'ALL') AS priority,
        |  coalesce(CAST(year(o_orderdate) AS STRING),'ALL') AS o_year,
        |  count(1) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus, year(o_orderdate)),
        |                        (o_orderpriority), ())
        |ORDER BY 1,2,3""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(mine === native)
  }

  test("Misra-Gries sketch: containment + error bound on a skewed stream") {
    // 1000×"hot" + 200 distinct words ×10 → n = 3000; with k = 10 every
    // word with count > 3000/11 ≈ 272 (only "hot") MUST be a candidate,
    // and every estimate undercounts by at most n/(k+1)
    val k = 10
    val words = ((1 to 1000).map(_ => "hot") ++
      (1 to 200).flatMap(i => Seq.fill(10)(s"w$i")))
    val df = words.toDF("word").repartition(7)
    val cand = Grouping.heavyHitters(df, "word", k)
      .as[(String, Long)].collect().toMap
    assert(cand.contains("hot"), s"heavy item missing from $cand")
    val n = words.length
    cand.foreach { case (w, est) =>
      val truth = words.count(_ == w).toLong
      assert(est <= truth, s"$w overcounted: $est > $truth")
      assert(truth - est <= n / (k + 1), s"$w est $est too far from $truth")
    }
  }

  test("Misra-Gries gate flags hold across partition layouts") {
    // the candidate SET is layout-dependent (decrement order differs);
    // the gate's invariants must not be
    for (p <- Seq(1, 7, 32)) {
      val df = Tables.documents(spark, dir).select(
        explode(graft.functions.TextFunctions.tokenize(
          lower(col("text")))).as("word"))
        .repartition(p)
      val cand = Grouping.heavyHitters(df, "word", 64)
        .as[(String, Long)].collect().toMap
      val exact = df.groupBy("word").count()
        .as[(String, Long)].collect().toMap
      val n = exact.values.sum
      val heavy = exact.filter { case (_, c) => c * 65 > n }.keySet
      assert(heavy.subsetOf(cand.keySet), s"p=$p missing ${heavy -- cand.keySet}")
      cand.foreach { case (w, est) =>
        assert(est <= exact(w) && (exact(w) - est) * 65 <= n, s"p=$p $w")
      }
    }
  }

  test("robustPriceStats: integer medians bound the data; MAD sane") {
    val dir = "/root/testdata/sf0.001"
    val rows = Grouping.robustPriceStats(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    val cents = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("rf"),
        round(col("l_extendedprice") * 100d, 0).cast("long").as("c"))
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (rf, n, med2, mad4, nOut) =>
      val vals = cents(rf).map(_._2).sorted
      assert(n === vals.length.toLong)
      // doubled median sits between doubled min and max, parity exact
      assert(med2 >= 2 * vals.head && med2 <= 2 * vals.last, rf)
      // reference median on the driver: exact same fixed-point rule
      val lo = vals((vals.length - 1) / 2)
      val hi = vals(vals.length / 2)
      assert(med2 === lo + hi, rf)
      assert(mad4 >= 0 && nOut >= 0 && nOut < n, rf)
      // an outlier exists iff some deviation exceeds 1.5x mad4 in
      // quarter-cent units
      val someDev = vals.map(v => math.abs(2 * v - med2))
      assert((nOut > 0) === someDev.exists(d => 2 * d > 3 * mad4), rf)
    }
  }

  test("orderRankStats ranks are consistent per customer") {
    val rows = Grouping.orderRankStats(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double, Double, Long)].collect()
    rows.groupBy(_._1).foreach { case (ck, os) =>
      // top_order is constant per customer and is the priciest order
      assert(os.map(_._6).toSet.size === 1, s"cust $ck")
      val top = os.maxBy(o => (o._3, -o._2))._2
      assert(os.head._6 === top, s"cust $ck")
      // cume_dist ends at 1.0; percent_rank starts at 0.0
      assert(os.map(_._5).max === 1.0, s"cust $ck")
      assert(os.map(_._4).min === 0.0, s"cust $ck")
    }
  }
}
