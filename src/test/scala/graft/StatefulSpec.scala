package graft

import graft.functions.TypedAggregators
import graft.operators.SkewJoin
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatefulSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Event]
    val q = StatefulSessions.sessionize(source.toDS(), gapMs = 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 500ms apart (one session), then a 5s gap
      source.addData(Event(1, 0, 1.0), Event(1, 500, 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // session still open
      source.addData(Event(1, 5500, 7.0)) // gap > 1000 closes the first
      q.processAllAvailable()
      val closed = spark.table("sessions").as[ClosedSession].collect()
      assert(closed.length === 1)
      assert(closed(0) === ClosedSession(1, 0, 1500, 2, 3.0))
    } finally q.stop()
  }

  test("transition state carries across micro-batches and sorts within them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.Streaming
    import graft.streaming.Streaming.{TransEvent, Transition}
    val source = MemoryStream[TransEvent]
    val q = Streaming.transitionPairs(source.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      // batch 1 arrives OUT of time order: view(t=1) then click(t=2)
      // delivered reversed; the in-batch sort must restore view->click
      source.addData(TransEvent(1, 2, 11, "click"), TransEvent(1, 1, 10, "view"))
      q.processAllAvailable()
      val b1 = spark.table("transitions").as[Transition].collect().toSeq
      assert(b1 === Seq(Transition("view", "click")))
      // batch 2: the carried last event (click) must chain to purchase
      source.addData(TransEvent(1, 3, 12, "purchase"))
      q.processAllAvailable()
      val all = spark.table("transitions").as[Transition].collect().toSeq
      assert(all.sortBy(t => (t.src, t.dst)) ===
        Seq(Transition("click", "purchase"), Transition("view", "click")))
    } finally q.stop()
  }

  test("typed aggregators: count and Welford variance match built-ins") {
    import spark.implicits._
    val words = Seq("a", "b", "a", "c", "a").toDS()
    val counts = words.groupByKey(identity)
      .agg(TypedAggregators.CountAgg.toColumn).collect().toMap
    assert(counts === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))

    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val v = xs.toDS().select(TypedAggregators.VarianceAgg.toColumn)
      .collect()(0)
    val builtin = xs.toDS().toDF("x").agg(var_samp(col("x")))
      .collect()(0).getDouble(0)
    assert(math.abs(v - builtin) < 1e-9)
  }

  test("salted join equals plain join row-for-row") {
    import spark.implicits._
    // skewed big side: 90% of rows share one key
    val big = (1 to 1000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)).toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", 8)
    assert(salted.count() === plain.count())
    assert(salted.orderBy("k", "payload").collect().map(_.toSeq).toSeq ===
           plain.orderBy("k", "payload").collect().map(_.toSeq).toSeq)
  }
}
